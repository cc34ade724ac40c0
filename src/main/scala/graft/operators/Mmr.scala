package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversified retrieval (Carbonell &
  * Goldstein, SIGIR 1998) — the post-retrieval step RAG stacks run so
  * the k passages handed to the model aren't k near-copies of the same
  * chunk: greedily pick argmax of
  * `λ·sim(q, c) − (1−λ)·max_{s∈S} sim(c, s)`.
  *
  * Two-stage by design: retrieve a candidate pool with [[VectorSearch]]
  * (exact or IVF — hundreds of rows), then diversify HERE. The greedy
  * loop is inherently sequential (selection r+1's penalty depends on
  * selection r), so each of the k rounds is one narrow map over the
  * candidate pool + one argmax — the per-round state shipped to
  * executors is ONE vector (the newest selection, a literal), and the
  * incremental `max_sim` update makes round cost O(|pool|·dim), not
  * O(|pool|·|S|·dim). Candidate pools are retrieval-sized, so rounds
  * are sub-second; nothing here ever touches the full corpus.
  *
  * Deterministic: cosine via the native [[graft.functions.DotProduct]]
  * (fixed IEEE fold order) and every argmax tie-broken by id ascending.
  */
object Mmr {

  /** Diversify `candidates` (id, vec, …) to k selections for the query
    * vector: returns the selected rows with `mmr_rank` (1-based
    * selection order), `relevance` (cos to query) and `mmr_score` (the
    * score at selection time). */
  def rerank(candidates: DataFrame, id: String, vecCol: String,
      queryVec: Seq[Float], k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1, "select at least one candidate")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val q = typedLit(queryVec)
    val qn = math.sqrt(queryVec.map(x => x.toDouble * x.toDouble).sum)
    def cosTo(vec: org.apache.spark.sql.Column,
        nrm: org.apache.spark.sql.Column,
        other: org.apache.spark.sql.Column, otherNrm: Double) =
      when(nrm === 0 || lit(otherNrm) === 0, lit(0.0))
        .otherwise(VectorFns.dot(vec, other) / (nrm * lit(otherNrm)))

    var cand = candidates
      .withColumn("__nrm", VectorFns.norm(col(vecCol)))
      .withColumn("relevance", cosTo(col(vecCol), col("__nrm"), q, qn))
      .withColumn("__max_sim", lit(null).cast("double"))
      .localCheckpoint(true)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Seq[Float], Double, Double)]
    var round = 0
    val n = cand.count()
    while (round < math.min(k, n).toInt) {
      val score = when(col("__max_sim").isNull, lit(lambda) * col("relevance"))
        .otherwise(lit(lambda) * col("relevance") -
          lit(1 - lambda) * col("__max_sim"))
      val notPicked =
        if (picked.isEmpty) lit(true)
        else !col(id).isin(picked.map(_._1).toSeq: _*)
      val best = cand
        .filter(notPicked)
        .withColumn("__score", score)
        .orderBy(col("__score").desc, col(id).asc)
        .select(col(id), col(vecCol), col("relevance"), col("__score"))
        .head()
      val bVec = best.getSeq[Float](1)
      val bNrm = math.sqrt(bVec.map(x => x.toDouble * x.toDouble).sum)
      picked += ((best.get(0), bVec, best.getDouble(2), best.getDouble(3)))
      val next = cand.withColumn("__max_sim",
        greatest(coalesce(col("__max_sim"), lit(-2.0)),
          cosTo(col(vecCol), col("__nrm"), typedLit(bVec), bNrm)))
        .localCheckpoint(true)
      cand.unpersist()
      cand = next
      round += 1
    }
    cand.unpersist()
    val s = candidates.sparkSession
    import s.implicits._
    val sel = picked.zipWithIndex.map { case ((i, _, rel, sc), r) =>
      (i.toString, r + 1, rel, sc)
    }.toSeq.toDF("__id_str", "mmr_rank", "relevance", "mmr_score")
    candidates.withColumn("__id_str", col(id).cast("string"))
      .join(sel, "__id_str")
      .drop("__id_str")
      .orderBy(col("mmr_rank"))
  }

  /** RETRIEVE-then-DIVERSIFY in one operator call (the RAG hot path):
    * [[VectorSearch.ivfPqSearch]] pools `poolSize` candidates for the
    * query over the billion-scale index layout (probed cells only, PQ
    * candidates, exact rerank), the pool — ids + float vectors, a
    * retrieval-sized sliver — is materialized EXACTLY ONCE
    * (`localCheckpoint`), and [[rerank]]'s k greedy rounds run over
    * that checkpointed sliver: the index, corpus, and PQ codes are
    * never touched again regardless of k (MmrSpec pins corpus-scan
    * count independent of k). */
  def retrieveDiverse(corpus: DataFrame, centroids: DataFrame,
      model: ProductQuantizer.Model, queryVec: Seq[Float], k: Int,
      poolSize: Int = 100, lambda: Double = 0.7, nprobe: Int = 2,
      candidates: Int = 200, id: String = "vec_id",
      cellId: String = "cell", vecCol: String = "embedding"): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val queries = Seq((0L, queryVec)).toDF(id, vecCol)
    val pool = VectorSearch.ivfPqSearch(corpus, queries, centroids,
        model, k = poolSize, nprobe = nprobe, candidates = candidates,
        corpusId = id, queryId = id, cellId = cellId, vecCol = vecCol)
      .select(col("neighbor_id").as(id))
      .join(corpus.select(col(id), col(vecCol)), Seq(id))
      .localCheckpoint(true)
    rerank(pool, id, vecCol, queryVec, k, lambda)
  }
}
