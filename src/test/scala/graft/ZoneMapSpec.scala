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
}
