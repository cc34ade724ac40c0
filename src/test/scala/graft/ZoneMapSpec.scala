package graft

import graft.operators.ZoneMap
import org.scalatest.funsuite.AnyFunSuite

/** Standalone file-level data skipping (the PartitionedSnapshots specs
  * cover the integrated form): stats collect over arbitrary parquet
  * dirs, range pruning keeps only intersecting files, and an all-null
  * file is skipped outright — a range predicate never matches NULL. */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collect/prune/readBetween over arbitrary dirs; all-null files" +
      " are skipped by range predicates; all-pruned reads keep schema") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zm").toString
    Seq((1L, Option(1L)), (2L, Option(2L))).toDF("id", "x")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq((3L, Option(10L)), (4L, Option(11L))).toDF("id", "x")
      .coalesce(1).write.parquet(s"$dir/b")
    Seq((5L, None: Option[Long])).toDF("id", "x")
      .coalesce(1).write.parquet(s"$dir/c")
    val idx = ZoneMap.collect(spark,
      Seq(s"$dir/a", s"$dir/b", s"$dir/c"), Seq("x"))
    assert(idx.count() == 3, "one stat row per file")
    val survivors = ZoneMap.pruneBetween(idx, "x", 10L, 12L)
    assert(survivors.size == 1 && survivors.head.contains("/b/"),
      s"only b intersects [10,12]: $survivors")
    assert(ZoneMap.readBetween(spark, idx, "x", 10L, 12L)
      .select("id").as[Long].collect().toSet == Set(3L, 4L))
    // the all-null file never survives any range
    assert(!ZoneMap.pruneBetween(idx, "x", Long.MinValue, Long.MaxValue)
      .exists(_.contains("/c/")))
    // every file pruned: zero rows, schema intact
    val none = ZoneMap.readBetween(spark, idx, "x", 100L, 200L)
    assert(none.count() == 0 && none.columns.contains("id"))
  }

  test("conjunctive pruning compounds across columns: a file must" +
      " intersect EVERY predicate to survive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zm2").toString
    // x ranges overlap between a and b; y separates them
    Seq((1L, 5L, 100L), (2L, 6L, 110L)).toDF("id", "x", "y")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq((3L, 5L, 200L), (4L, 7L, 210L)).toDF("id", "x", "y")
      .coalesce(1).write.parquet(s"$dir/b")
    val idx = ZoneMap.collect(spark, Seq(s"$dir/a", s"$dir/b"),
      Seq("x", "y"))
    // x alone keeps both files; adding y prunes to one
    assert(ZoneMap.pruneBetweenAll(idx, Seq(("x", 5L, 6L))).size == 2)
    val both = ZoneMap.pruneBetweenAll(idx,
      Seq(("x", 5L, 6L), ("y", 200L, 220L)))
    assert(both.size == 1 && both.head.contains("/b/"), s"got $both")
  }

  test("footer-harvested stats are VALUE-IDENTICAL to the scan " +
      "collector — nulls, all-null columns, NaN files (per-file scan " +
      "fallback), pre-evolution narrow footers, and the file-string " +
      "rendering all agree") {
    import java.sql.Date
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zm_footer").toString
    // plain values + a null string
    Seq((1L, Some("alpha"), Some(Date.valueOf("2024-01-03")), Some(1.5)),
      (2L, None, Some(Date.valueOf("2024-02-01")), Some(-3.25)),
      (9L, Some("zeta"), None, Some(7.0)))
      .toDF("k", "s", "d", "x").coalesce(1).write.parquet(s"$dir/a")
    // all-null string column (footer: no min/max, nulls == rows)
    Seq((4L, None: Option[String], Some(Date.valueOf("2023-06-06")),
      Some(0.0)))
      .toDF("k", "s", "d", "x").coalesce(1).write.parquet(s"$dir/b")
    // NaN double: the writer omits min/max for the chunk — this file
    // must fall back to the scan, not trust unusable stats
    Seq((5L, Some("mid"), Some(Date.valueOf("2022-01-01")),
      Some(Double.NaN)),
      (6L, Some("mid2"), Some(Date.valueOf("2022-01-02")), Some(2.0)))
      .toDF("k", "s", "d", "x").coalesce(1).write.parquet(s"$dir/c")
    // pre-evolution footer: only k exists
    Seq(Tuple1(7L)).toDF("k").coalesce(1).write.parquet(s"$dir/n")
    val dirs = Seq(s"$dir/a", s"$dir/b", s"$dir/c", s"$dir/n")
    val cols = Seq("k", "s", "d", "x")
    val auto = ZoneMap.collect(spark, dirs, cols)
    val schema = spark.read.option("mergeSchema", "true")
      .parquet(dirs: _*).schema
    val scan = ZoneMap.collectScan(spark, dirs, cols, Some(schema))
    def keyed(df: org.apache.spark.sql.DataFrame) = {
      val names = df.columns.sorted
      // Scala == on boxed doubles says NaN != NaN; normalize so the
      // NaN-carrying fallback row still compares equal
      def norm(v: Any): Any = v match {
        case d: Double if d.isNaN => "NaN"
        case f: Float if f.isNaN => "NaN"
        case x => x
      }
      df.collect().map(r =>
        names.map(n => n -> norm(r.get(r.fieldIndex(n)))).toMap)
        .map(m => m("file").toString -> m).toMap
    }
    val (a, b) = (keyed(auto), keyed(scan))
    assert(a.keySet == b.keySet,
      s"file renderings must agree:\n${a.keySet}\nvs\n${b.keySet}")
    a.keySet.foreach { f =>
      assert(a(f) == b(f), s"stats differ for $f:\n${a(f)}\nvs\n${b(f)}")
    }
    // and the harvested index PRUNES correctly end-to-end: k=4 can
    // live in a (k spans 1..9) and b (k=4); c (5..6) and n (7) cannot
    val hit = ZoneMap.pruneBetweenAll(auto, Seq(("k", 4L, 4L)))
    assert(hit.size == 2 && hit.exists(_.contains("/a/")) &&
      hit.exists(_.contains("/b/")), s"got $hit")
  }
}
