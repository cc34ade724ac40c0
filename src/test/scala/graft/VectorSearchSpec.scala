package graft

import graft.operators.VectorSearch
import org.scalatest.funsuite.AnyFunSuite

/** VectorSearch over an arbitrary (id, vector) frame: exact top-k ranks
  * by cosine with deterministic ties, IVF assignment picks the nearest
  * centroid, and probe search over clearly-separated clusters recovers
  * the exact neighbors (recall 1.0 when clusters align with cells). */
class VectorSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two well-separated 2-D clusters around (1,0) and (0,1)
  val corpus = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.05f)),
    (11L, Seq(0.0f, 1.0f)), (12L, Seq(0.1f, 0.9f)), (13L, Seq(0.05f, 0.8f)))
    .toDF("id", "v")
  val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
    .toDF("c", "v")

  test("cosineTopK ranks exact neighbors, excluding self") {
    val out = VectorSearch.cosineTopK(corpus,
      corpus.filter($"id" === 1L), k = 2,
      corpusId = "id", queryId = "id", vecCol = "v")
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    // nearest to (1,0) excluding itself, by ANGLE (cosine ignores
    // magnitude): 3=(0.8,0.05) at 3.6 deg beats 2=(0.9,0.1) at 6.3 deg
    assert(out == Seq((1L, 1, 3L), (1L, 2, 2L)))
  }

  test("ivfAssign puts every vector in its own cluster's cell") {
    val cells = VectorSearch.ivfAssign(corpus, centroids,
      corpusId = "id", cellId = "c", vecCol = "v")
      .select("id", "c").as[(Long, Long)].collect().toMap
    assert(cells == Map(1L -> 0L, 2L -> 0L, 3L -> 0L,
      11L -> 1L, 12L -> 1L, 13L -> 1L))
  }

  test("persisted index search equals in-memory ivfSearch and its scan" +
      " is partition-pruned to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx")
      .toString + "/index"
    VectorSearch.writeIndex(corpus, centroids, dir,
      corpusId = "id", cellId = "c", vecCol = "v")
    val qs = corpus.filter($"id" === 11L)
    val viaIndex = VectorSearch.searchIndex(spark, dir, qs, centroids,
      k = 2, nprobe = 1, corpusId = "id", queryId = "id", cellId = "c",
      vecCol = "v")
    val inMem = VectorSearch.ivfSearch(corpus, qs, centroids, k = 2,
      nprobe = 1, corpusId = "id", queryId = "id", cellId = "c",
      vecCol = "v")
    assert(viaIndex.collect().toSeq.map(_.toSeq) ==
      inMem.collect().toSeq.map(_.toSeq))
    // the scan must carry a partition filter on the cell column
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*c#".r.findFirstIn(plan).isDefined
      || plan.contains("c IN"),
      s"no partition pruning on the index scan:\n$plan")
  }

  test("ivfSearch with nprobe=1 recovers the exact in-cluster neighbors") {
    val out = VectorSearch.ivfSearch(corpus,
      corpus.filter($"id" === 11L), centroids, k = 2, nprobe = 1,
      corpusId = "id", queryId = "id", cellId = "c", vecCol = "v")
      .select("query_id", "rank", "neighbor_id", "probed_cell")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((11L, 1, 13L, 1L), (11L, 2, 12L, 1L)))
  }

  test("ivfPqSearch on separated clusters = exact in-cluster ranking" +
      " (wide sliver -> rerank recovers the probe-search result)") {
    val model = graft.operators.ProductQuantizer.fit(spark, corpus,
      m = 2, k = 2, rounds = 3, idCol = "id", vecCol = "v")
    val out = VectorSearch.ivfPqSearch(corpus,
      corpus.filter($"id" === 1L), centroids, model, k = 2, nprobe = 1,
      candidates = 10, corpusId = "id", queryId = "id", cellId = "c",
      vecCol = "v")
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    // candidates >> cluster size, so the exact re-rank sees every
    // in-cell vector: identical to ivfSearch's exact in-cluster top-2
    assert(out == Seq((1L, 1, 3L), (1L, 2, 2L)))
  }

  test("ivfPqSearch recall on the real embeddings corpus (in-engine" +
      " k-means cells + PQ codes + exact rerank) stays above gate") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val centroids8 = graft.operators.KMeans.fit(spark, emb, k = 8,
      maxRounds = 3).centroids
      .select($"cell".cast("long").as("cell"), $"embedding")
    val model = graft.operators.ProductQuantizer.fit(spark, emb,
      m = 16, k = 256, rounds = 3)
    val queries = emb.filter($"vec_id" < 5)
    val got = VectorSearch.ivfPqSearch(emb, queries, centroids8, model,
      k = 10, nprobe = 3, candidates = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = VectorSearch.cosineTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recalls = exact.map { case (q, truth) =>
      (truth & got.getOrElse(q, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF+PQ+rerank mean recall@10 = $mean%.3f (nprobe 3/8)")
    assert(mean >= 0.8, f"composed recall@10 $mean%.3f below gate")
  }
}
