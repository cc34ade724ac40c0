package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the third leg of the vector-compression
  * family (IVF partitions the corpus, SQ8 shrinks components, PQ shrinks
  * whole VECTORS to `m` small codes): each embedding splits into `m`
  * contiguous subvectors, each subvector space gets its own k-means
  * codebook (`KMeans.fit` — bit-deterministic), and a vector stores only
  * its m nearest-centroid codes (m·log2 k bits, e.g. 64 float dims →
  * 4 × 4-bit codes = 2 bytes, a 128× compression).
  *
  * Search is asymmetric-distance (ADC): the QUERY stays exact; per query
  * a (sub, cell) inner-product table against the broadcast codebooks is
  * precomputed (m·k entries), and every encoded vector scores as the SUM
  * of m table lookups — a compressed linear scan that never touches the
  * float corpus. At 100 TB you compose: IVF prunes to nprobe cells, PQ
  * scans the survivors compressed, exact re-rank on the top sliver
  * (s05's pattern). Recall is gated against the exact baseline in
  * ProductQuantizerSpec, mirroring RecallSpec's contract for d02/d07.
  */
object ProductQuantizer {

  /** `codebooks`: (sub: Int, cell: Int, centroid: Array[Float]); `dims`
    * = full vector length, `m` subvectors of `dims / m` components. */
  final case class Model(codebooks: DataFrame, m: Int, k: Int, dims: Int)

  private def subCol(vecCol: String, sub: Int, width: Int) =
    slice(col(vecCol), sub * width + 1, width)

  /** Fit one codebook per subvector space over the corpus. */
  def fit(spark: SparkSession, corpus: DataFrame, m: Int, k: Int,
          rounds: Int = 3, idCol: String = "vec_id",
          vecCol: String = "embedding"): Model = {
    import spark.implicits._
    val dims = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val width = dims / m
    val books = (0 until m).map { s =>
      val sub = corpus.select(col(idCol), subCol(vecCol, s, width).as("v"))
      // l2 metric: ADC approximates INNER PRODUCTS, so codebooks must
      // minimize L2 reconstruction error — cosine assignment is
      // magnitude-blind and measured 0.34 recall@10 vs l2's (gated) level
      KMeans.fit(spark, sub, k, rounds, idCol = idCol, vecCol = "v",
        metric = "l2")
        .centroids
        .select(lit(s).as("sub"), col("cell"), col("v").as("centroid"))
    }.reduce(_ unionByName _)
    // m·k rows — driver-sized by definition; materialize once
    Model(books.localCheckpoint(true), m, k, dims)
  }

  /** Encode the corpus: (idCol, sub, code) — long format, ready for the
    * ADC join. One narrow pass per subvector; codes are the cosine
    * nearest centroid (KMeans' assignment metric). */
  def encode(corpus: DataFrame, model: Model,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val width = model.dims / model.m
    (0 until model.m).map { s =>
      // same L2 scoring as the fit's assignment: argmax v·c − |c|²/2
      val cent = model.codebooks.filter(col("sub") === s)
        .select(col("cell"), col("centroid").as("__cv"),
          (VectorFns.dot(col("centroid"), col("centroid")) / 2)
            .as("__half_cn2"))
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__score").desc, col("cell").asc)
      corpus.select(col(idCol), subCol(vecCol, s, width).as("v"))
        .join(broadcast(cent))
        .select(col(idCol), col("cell"),
          (VectorFns.dot(col("v"), col("__cv")) - col("__half_cn2"))
            .as("__score"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(idCol), lit(s).as("sub"), col("cell").as("code"))
    }.reduce(_ unionByName _)
  }

  /** ADC top-k: approximate inner product = Σ_sub ip(query_sub,
    * centroid[code]). `encoded` is `encode`'s output; queries stay
    * exact. Returns (query_id, rank, neighbor_id, approx_ip). */
  def search(encoded: DataFrame, model: Model, queries: DataFrame,
             topK: Int, queryId: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val width = model.dims / model.m
    val qsubs = (0 until model.m).map { s =>
      queries.select(col(queryId).as("query_id"),
        lit(s).as("sub"), subCol(vecCol, s, width).as("qv"))
    }.reduce(_ unionByName _)
    // per-query lookup table: m·k rows/query, broadcast to the scan
    val tables = qsubs.join(model.codebooks, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell").as("code"),
        VectorFns.dot(col("qv"), col("centroid")).as("ip"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_ip").desc, col("neighbor_id").asc)
    encoded
      .join(broadcast(tables), Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("ip")).as("approx_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("approx_ip"))
  }
}
