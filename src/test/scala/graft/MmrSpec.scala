package graft

import graft.operators.{KMeans, Mmr, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified retrieval: λ=1 degenerates to plain relevance
  * ranking, intermediate λ alternates clusters instead of exhausting
  * the nearest one, determinism under repartitioning; plus the
  * persisted-IVF append path (new vectors land as per-cell adds and
  * become searchable without an index rebuild). */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight 2-D clusters: A near (1,0) — the query direction — and
  // B near (0,1); ids interleave so id order can't fake diversity
  def pool = Seq(
    (1L, Seq(1.00f, 0.00f)), (2L, Seq(0.00f, 1.00f)),
    (3L, Seq(0.99f, 0.01f)), (4L, Seq(0.01f, 0.99f)),
    (5L, Seq(0.98f, 0.02f)), (6L, Seq(0.02f, 0.98f)),
    (7L, Seq(0.97f, 0.03f)), (8L, Seq(0.03f, 0.97f)),
  ).toDF("vec_id", "embedding")

  val q = Seq(1.0f, 0.0f)

  test("lambda=1 == pure relevance order; tie-break by id") {
    val got = Mmr.rerank(pool, "vec_id", "embedding", q, k = 4,
      lambda = 1.0).select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 5L, 7L), s"relevance order: $got")
  }

  /** Sequential reference MMR with the same arithmetic order as the
    * operator (Float→Double products, left-to-right accumulation), so
    * the comparison is EXACT, not tolerance-based. */
  private def referenceMmr(vecs: Seq[(Long, Seq[Float])],
      qv: Seq[Float], k: Int, lambda: Double): Seq[Long] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def nrm(a: Seq[Float]) = math.sqrt(dot(a, a))
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val (na, nb) = (nrm(a), nrm(b))
      if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
    }
    val rel = vecs.map { case (i, v) => i -> cos(v, qv) }.toMap
    var maxSim = Map.empty[Long, Double]
    var picked = Vector.empty[Long]
    while (picked.size < math.min(k, vecs.size)) {
      val best = vecs.filterNot(v => picked.contains(v._1))
        .map { case (i, _) =>
          val s =
            if (maxSim.isEmpty && picked.isEmpty) lambda * rel(i)
            else lambda * rel(i) - (1 - lambda) * maxSim(i)
          (i, s)
        }
        .minBy { case (i, s) => (-s, i) }._1
      val bv = vecs.find(_._1 == best).get._2
      maxSim = vecs.map { case (i, v) =>
        i -> math.max(maxSim.getOrElse(i, -2.0), cos(v, bv)) }.toMap
      picked :+= best
    }
    picked
  }

  test("distributed MMR == sequential reference, exactly, for several" +
      " lambdas; diversity changes the order; repartition-stable") {
    val r = new scala.util.Random(42)
    val vecs = (1L to 20L).map(i =>
      (i, Seq.fill(4)((r.nextDouble() * 2 - 1).toFloat)))
    val pool20 = vecs.toDF("vec_id", "embedding")
    val qv = Seq(0.5f, 0.5f, 0.0f, 0.7f)
    for (lam <- Seq(0.3, 0.7, 1.0)) {
      val want = referenceMmr(vecs, qv, k = 8, lambda = lam)
      val got = Mmr.rerank(pool20, "vec_id", "embedding", qv, k = 8,
        lambda = lam).select("vec_id").as[Long].collect().toSeq
      assert(got == want, s"lambda=$lam: $got vs reference $want")
    }
    // diversity is real: λ=0.3 ordering differs from pure relevance
    val rel = referenceMmr(vecs, qv, 8, 1.0)
    val div = referenceMmr(vecs, qv, 8, 0.3)
    assert(rel != div, "diversification must change the selection order")
    // determinism under repartitioning
    val a = Mmr.rerank(pool20.repartition(7), "vec_id", "embedding",
      qv, k = 5, lambda = 0.5).select("vec_id").as[Long].collect().toSeq
    val b = Mmr.rerank(pool20, "vec_id", "embedding",
      qv, k = 5, lambda = 0.5).select("vec_id").as[Long].collect().toSeq
    assert(a == b)
  }

  test("k > pool size selects everything once; ranks are 1..n") {
    val got = Mmr.rerank(pool, "vec_id", "embedding", q, k = 50,
      lambda = 0.7)
    assert(got.count() == 8)
    assert(got.select("mmr_rank").as[Int].collect().sorted.toSeq ==
      (1 to 8))
  }

  test("retrieveDiverse = ivfPqSearch pool + rerank, with ONE pool" +
      " materialization: corpus scans do not grow with k") {
    val plain = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.8f, 0.05f)), (4L, Seq(0.95f, 0.02f)),
      (5L, Seq(0.85f, 0.12f)), (11L, Seq(0.0f, 1.0f)),
      (12L, Seq(0.1f, 0.9f))).toDF("id", "v")
    val centroids = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("c", "v")
    val model = graft.operators.ProductQuantizer.fit(spark, plain,
      m = 2, k = 2, rounds = 3, idCol = "id", vecCol = "v")
    // every job that scans the corpus bumps the accumulator per
    // partition — if the k greedy rounds re-ran the retrieval, scans
    // would grow with k
    val scans = spark.sparkContext.longAccumulator("corpusScans")
    val corpus = plain.as[(Long, Seq[Float])]
      .mapPartitions { it => scans.add(1); it }.toDF("id", "v")
    val qv = Seq(1.0f, 0.0f)
    def run(k: Int) = Mmr.retrieveDiverse(corpus, centroids, model, qv,
      k = k, poolSize = 5, nprobe = 1, candidates = 10,
      id = "id", cellId = "c", vecCol = "v")
    val r2 = run(2).select("id", "mmr_rank").as[(Long, Int)]
      .collect().toSeq
    val atK2 = scans.value
    scans.reset()
    val r4 = run(4).select("id", "mmr_rank").as[(Long, Int)]
      .collect().toSeq
    assert(scans.value == atK2,
      s"corpus scans grew with k: ${scans.value} vs $atK2")
    // rank-1 is the exact nearest; results match the manual composition
    assert(r2.head == ((1L, 1)) && r4.head == ((1L, 1)))
    assert(r4.take(2).map(_._1) == r2.map(_._1),
      "greedy MMR prefix is k-stable")
    val manualPool = graft.operators.VectorSearch.ivfPqSearch(
        plain, plain.filter($"id" === 1L), centroids, model, k = 5,
        nprobe = 1, candidates = 10, corpusId = "id", queryId = "id",
        cellId = "c", vecCol = "v")
      .select(col("neighbor_id").as("id"))
      .join(plain, Seq("id"))
    val manual = Mmr.rerank(manualPool, "id", "v", qv, k = 4)
      .select("id", "mmr_rank").as[(Long, Int)].collect().toSeq
    // manual pool excludes self (query drawn from the corpus); compare
    // on the shared candidates
    assert(r4.filter(_._1 != 1L).map(_._1).toSet
      .subsetOf(manual.map(_._1).toSet + 1L))
  }

  test("appendToIndex: appended vectors are searchable without rebuild") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfapp").resolve("idx").toString
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = KMeans.fit(spark, base, k = 4, maxRounds = 2).centroids
    VectorSearch.writeIndex(base, model, dir)
    val q1 = base.limit(1)
    val before = VectorSearch.searchIndex(spark, dir, q1, model, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    // append a synthetic near-duplicate of the query vector
    val qv = q1.select("embedding").head().getSeq[Float](0)
    val extra = Seq((999999L, qv)).toDF("vec_id", "embedding")
    VectorSearch.appendToIndex(extra, model, dir)
    val after = VectorSearch.searchIndex(spark, dir, q1, model, k = 5)
      .collect()
    assert(after.map(_.getAs[Long]("neighbor_id")).contains(999999L),
      s"appended vector must be retrievable: ${after.mkString(",")}")
    // and it ranks first: identical direction ⇒ cos = 1
    val top = after.minBy(_.getAs[Int]("rank"))
    assert(top.getAs[Long]("neighbor_id") == 999999L)
    // the previous neighbors are still found (one falls off the k-cut)
    val afterSet = after.map(_.getAs[Long]("neighbor_id")).toSet
    assert((before -- afterSet).size <= 1,
      s"at most one base neighbor displaced: before=$before after=$afterSet")
  }
}
