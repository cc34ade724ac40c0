package graft

import graft.operators.{BloomIndex, KmvSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch contracts (determinism, merge associativity, estimator
  * accuracy, exact-below-k) and BloomIndex file-skipping contracts (no
  * false negatives, pruning actually prunes, all-null blooms never
  * match). The q61 catalog oracle pins the end-to-end overlap math
  * against DuckDB; these specs pin the operator-level invariants the
  * catalog shape doesn't exercise. */
class KmvBloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two overlapping segments: a = 0..999, b = 500..1499 (|∩|=500, |∪|=1500)
  def segs = spark.range(0, 1000).select(lit("a").as("seg"), col("id"))
    .unionByName(
      spark.range(500, 1500).select(lit("b").as("seg"), col("id")))

  test("sketch is deterministic, sorted, capped at k; exact below k") {
    val k = 32
    val s1 = KmvSketch.sketch(segs, "seg", col("id"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val s2 = KmvSketch.sketch(segs.repartition(7), "seg", col("id"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(s1 == s2, "sketch must not depend on partitioning")
    assert(s1("a").size == k && s1("a") == s1("a").sorted)
    // a segment smaller than k keeps every hash → estimate is exact
    val tiny = spark.range(0, 10).select(lit("t").as("seg"), col("id"))
    val est = KmvSketch.sketch(tiny, "seg", col("id"), k)
      .select(KmvSketch.estimate(col("sk"), k)).head().getDouble(0)
    assert(est == 10.0, s"below-k estimate must be exact, got $est")
  }

  test("estimator lands within 3σ; merge = sketch of the union") {
    val k = 64
    val sk = KmvSketch.sketchWithExact(segs, "seg", col("id"), k)
    val ests = sk.select(col("seg"), KmvSketch.estimate(col("sk"), k),
      col("n_exact")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    ests.foreach { case (seg, est, n) =>
      assert(math.abs(est - n) <= 3.0 / math.sqrt(k - 2) * n,
        s"$seg: est $est vs exact $n outside 3σ")
    }
    // merging the two segment sketches == sketching the union directly
    val skMap = sk.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val merged = spark.range(1).select(KmvSketch.merge(
      typedLit(skMap("a")), typedLit(skMap("b")), k).as("u"))
      .head().getSeq[String](0)
    val direct = KmvSketch.sketch(
      segs.select(lit("u").as("seg"), col("id")), "seg", col("id"), k)
      .select("sk").head().getSeq[String](0)
    assert(merged == direct, "merge must equal the union's own sketch")
    // pairwise overlap: jaccard_est near 500/1500, est_inter near 500
    val ov = KmvSketch.pairwiseOverlap(sk, "seg", k).head()
    val jac = ov.getAs[Double]("jaccard_est")
    val inter = ov.getAs[Double]("est_inter")
    assert(math.abs(jac - 500.0 / 1500.0) < 0.2, s"jaccard_est $jac")
    assert(math.abs(inter - 500.0) < 500 * 0.5, s"est_inter $inter")
    // directional containment: |a∩b|/|a| truth = 0.5 both ways here
    val ct = KmvSketch.containmentEstimates(sk, "seg", k).head()
    assert(math.abs(ct.getAs[Double]("cont_a_in_b") - 0.5) < 0.25,
      s"cont_a_in_b ${ct.getAs[Double]("cont_a_in_b")}")
    assert(math.abs(ct.getAs[Double]("cont_b_in_a") - 0.5) < 0.25,
      s"cont_b_in_a ${ct.getAs[Double]("cont_b_in_a")}")
  }

  test("bloom index: no false negatives, real pruning, null-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bi").toString
    // three files with disjoint key ranges + one all-null file
    Seq.tabulate(100)(i => (i.toLong, s"k$i")).toDF("id", "key")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq.tabulate(100)(i => (100L + i, s"k${100 + i}")).toDF("id", "key")
      .coalesce(1).write.parquet(s"$dir/b")
    Seq.tabulate(100)(i => (200L + i, s"k${200 + i}")).toDF("id", "key")
      .coalesce(1).write.parquet(s"$dir/c")
    Seq((300L, None: Option[String])).toDF("id", "key")
      .coalesce(1).write.parquet(s"$dir/d")
    val dirs = Seq(s"$dir/a", s"$dir/b", s"$dir/c", s"$dir/d")
    val idx = BloomIndex.collect(spark, dirs, Seq("key"),
      expectedItemsPerFile = 1000)
    assert(idx.count() == 4, "one bloom row per file")
    // no false negatives: every present key's owning file survives
    val hit = BloomIndex.pruneEquals(idx, "key", Seq("k150"))
    assert(hit.exists(_.contains("/b/")), s"owner must survive: $hit")
    // pruning is real: a single-key probe keeps (far) fewer than all files
    assert(hit.size < 4, s"probe must prune something: $hit")
    // read returns exactly the matching rows
    val got = BloomIndex.readEquals(spark, idx, "key", Seq("k150", "k250"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(150L, 250L))
    // absent key: typically zero files survive (fpp-sized false positives
    // allowed); the read still returns zero rows with schema intact
    val none = BloomIndex.readEquals(spark, idx, "key", Seq("absent"))
    assert(none.count() == 0 && none.columns.contains("id"))
  }

  test("bloom probe: non-string types hash like the build side" +
      " (timestamp '.0'-suffix JVM rendering must not false-negative)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bi2").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-05 10:30:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-03-06 11:00:00")
    Seq((1L, ts, 2.5), (2L, ts2, 7.25)).toDF("id", "t", "x")
      .coalesce(1).write.parquet(s"$dir/a")
    Seq((3L, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), 9.0))
      .toDF("id", "t", "x").coalesce(1).write.parquet(s"$dir/b")
    val idx = BloomIndex.collect(spark, Seq(s"$dir/a", s"$dir/b"),
      Seq("t", "x"), expectedItemsPerFile = 100)
    // java.sql.Timestamp.toString appends '.0' — hashing v.toString
    // would MISS the owner file (false negative). The probe must
    // evaluate Spark's own cast-to-string rendering.
    val hitT = BloomIndex.pruneEquals(idx, "t", Seq(ts))
    assert(hitT.exists(_.contains("/a/")), s"timestamp owner lost: $hitT")
    val hitX = BloomIndex.pruneEquals(idx, "x", Seq(2.5))
    assert(hitX.exists(_.contains("/a/")), s"double owner lost: $hitX")
    // end-to-end read returns the row
    assert(BloomIndex.readEquals(spark, idx, "t", Seq(ts))
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
