package graft

import graft.functions.VectorFns
import graft.operators.SemDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup at production K (the operator form of d13): KMeans cells,
  * within-cell pairwise prune, keep-farthest-from-centroid. The keep
  * rule's defining properties are pinned directly: the kept set is an
  * independent set under the near-dup relation WITHIN cells, and every
  * dropped vector has a beating witness — both hold for ANY clustering,
  * which is what lets the clustering vary (label seeds in d13's oracle,
  * real Lloyd rounds here) without changing the operator contract. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def cosCol(an: String, bn: String, av: String,
      bv: String) =
    when(col(an) === 0 || col(bn) === 0, lit(null))
      .otherwise(VectorFns.dot(col(av), col(bv)) / (col(an) * col(bn)))

  test("kept set has NO same-cell pair above threshold; every dropped" +
      " vector has a beating same-cell witness; one row per vector") {
    val corpus = Tables.embeddings(spark, sf)
    val out = SemDedup.run(spark, corpus, k = 8, threshold = 0.4).cache()
    try {
      assert(out.count() == corpus.count(), "one decision per vector")
      val nDropped = out.filter(!col("kept")).count()
      assert(nDropped > 0, "the corpus carries near-dup pairs")

      val scored = out
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("vec_id"), col("cell"), col("cos_c"), col("kept"),
          col("embedding"), VectorFns.norm(col("embedding")).as("n"))
        .cache()
      // independence: among kept vectors no same-cell cosine >= τ pair
      val kept = scored.filter(col("kept"))
      val violations = kept.as("a").join(kept.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(cosCol("a.n", "b.n", "a.embedding", "b.embedding") >= 0.4)
        .count()
      assert(violations == 0,
        s"$violations kept same-cell near-dup pairs survived")
      // soundness: each dropped vector lost to SOME same-cell near-dup
      val witnessed = scored.filter(!col("kept")).as("a")
        .join(scored.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id") &&
            (col("b.cos_c") < col("a.cos_c") ||
              (col("b.cos_c") === col("a.cos_c") &&
                col("b.vec_id") < col("a.vec_id"))))
        .filter(cosCol("a.n", "b.n", "a.embedding", "b.embedding") >= 0.4)
        .select(col("a.vec_id")).distinct().count()
      assert(witnessed == nDropped,
        s"$witnessed of $nDropped dropped vectors have witnesses")
      scored.unpersist()
    } finally out.unpersist()
  }

  test("batchAgainstIndex: corpus near-dups always lose the batch row," +
      " batch pairs use the standard rule, and the index scan is" +
      " pruned to the batch's cells") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semidx").toString
    // three cells on coordinate axes; cell 2 exists ONLY in the corpus
    val centroids = Seq(
      (0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 1f, 0f, 0f)),
      (2, Seq(0f, 0f, 1f, 0f))).toDF("cell", "embedding")
    val corpus = Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)),    // cell 0
      (2L, Seq(0.1f, 1f, 0f, 0f)),    // cell 1
      (3L, Seq(0f, 0f, 1f, 0.1f)))    // cell 2
      .toDF("vec_id", "embedding")
    graft.operators.VectorSearch.writeIndex(corpus, centroids, dir)
    val batch = Seq(
      (101L, Seq(1f, 0.11f, 0f, 0f)), // ~corpus #1 → dropped_by corpus
      (102L, Seq(0f, 1f, 0.5f, 0f)),  // near-dup pair with 103; closer
      (103L, Seq(0f, 1f, 0.52f, 0f)), //   to centroid → 102 drops
      (104L, Seq(0f, 0f, 0f, 1f)))    // novel → kept
      .toDF("vec_id", "embedding")
    val out = SemDedup.batchAgainstIndex(spark, batch, centroids, dir,
      threshold = 0.95)
    val got = out.select(col("vec_id"), col("kept"), col("dropped_by"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got(101L) == ((false, Some("corpus"))), got.toString)
    assert(got(102L) == ((false, Some("batch"))), got.toString)
    assert(got(103L) == ((true, None)), got.toString)
    assert(got(104L) == ((true, None)), got.toString)
    // the batch landed in cells 0 and 1 only: the cell literals reach
    // the index scan as a PARTITION filter (inputFiles lists the
    // pre-pruning catalog, so pin the plan, which is what executes)
    val planStr = out.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN \\([01],[01]\\)".r
      .findFirstIn(planStr).isDefined,
      s"no cell partition filter on the index scan:\n$planStr")
  }

  test("streamDedup: a later batch's near-dup of an earlier survivor" +
      " is dropped; the accepted index grows only by non-duplicates") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_semstream").toString
    val in = s"$base/in"; val idx = s"$base/idx"; val cp = s"$base/cp"
    val centroids = Seq(
      (0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 1f, 0f, 0f)))
      .toDF("cell", "embedding")
    Seq((1L, Seq(1f, 0.1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    def drain(): Unit = {
      val q = SemDedup.streamDedup(spark,
        spark.readStream.schema(schema).parquet(in), centroids, idx,
        threshold = 0.95, checkpoint = cp)
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    drain()
    assert(spark.read.parquet(idx).count() == 2,
      "first batch (no index yet) admits both distinct vectors")
    // batch 2: a near-dup of survivor 1 plus a genuinely novel vector
    Seq((11L, Seq(1f, 0.11f, 0f, 0f)), (12L, Seq(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(in)
    drain()
    val ids = spark.read.parquet(idx).select("vec_id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 12L),
      s"11 duplicates survivor 1 and must not enter the index: $ids")
  }
}
