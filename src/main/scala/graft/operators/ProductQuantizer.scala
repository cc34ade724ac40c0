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

  /** The corpus split once into its m subvectors, long format
    * (__id, sub, v) — every fit round and the encode pass run over ALL
    * subspaces in this single frame, so a round is ONE Spark job
    * regardless of m (the per-sub sequential form was m× the jobs and
    * dominated the catalog bench: 16 subs × 3 rounds ran 24 s where the
    * joint loop runs ~2 s). */
  private def subFrame(corpus: DataFrame, m: Int, width: Int,
                       idCol: String, vecCol: String): DataFrame =
    (0 until m).map { s =>
      corpus.select(col(idCol).as("__id"), lit(s).as("sub"),
        subCol(vecCol, s, width).as("v"))
    }.reduce(_ unionByName _)

  /** Nearest codebook entry per (vector, sub) by SQUARED L2 — argmin
    * |v−c|² = argmax v·c − |c|²/2 (KMeans.assignL2 vectorized over the
    * sub key): ADC approximates INNER PRODUCTS, so codebooks must
    * minimize L2 reconstruction error — cosine assignment is
    * magnitude-blind and measured 0.34 recall@10 vs l2's (gated) level.
    * Keeps `v` so the fit's moment pass needs no join back. */
  private def nearest(subs: DataFrame, codebooks: DataFrame): DataFrame = {
    val cent = codebooks.select(col("sub"), col("cell"),
      col("centroid").as("__cv"),
      (VectorFns.dot(col("centroid"), col("centroid")) / 2)
        .as("__half_cn2"))
    val w = Window.partitionBy(col("sub"), col("__id"))
      .orderBy(col("__score").desc, col("cell").asc)
    subs.join(broadcast(cent), Seq("sub"))
      .select(col("__id"), col("sub"), col("cell"), col("v"),
        (VectorFns.dot(col("v"), col("__cv")) - col("__half_cn2"))
          .as("__score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
  }

  /** Fit one codebook per subvector space over the corpus — all m
    * subspaces jointly, one job per Lloyd round. Semantics per sub are
    * identical to `KMeans.fit(metric = "l2")`: seeds are the k lowest-id
    * vectors sliced per sub, updates sum 1024-quantized components as
    * exact integers (bit-deterministic under any partitioning), emptied
    * cells keep their centroid, and iteration stops when no component
    * moves by ≥ 1/1024. */
  def fit(spark: SparkSession, corpus: DataFrame, m: Int, k: Int,
          rounds: Int = 3, idCol: String = "vec_id",
          vecCol: String = "embedding"): Model = {
    import spark.implicits._
    val dims = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val width = dims / m
    val subs = subFrame(corpus, m, width, idCol, vecCol).cache()
    val seedRows = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0))
    var cent: Map[(Int, Int), Seq[Float]] =
      (for { s <- 0 until m; (v, c) <- seedRows.zipWithIndex }
        yield (s, c) -> v.slice(s * width, (s + 1) * width)).toMap
    def centDf = cent.toSeq.map { case ((s, c), v) => (s, c, v) }
      .toDF("sub", "cell", "centroid")
    var r = 0
    var moved = true
    while (moved && r < rounds) {
      val sums = nearest(subs, centDf)
        .select(col("sub"), col("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("cell"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * 1024).cast("long")).as("sq"))
        .collect()
        .map(row => (row.getInt(0), row.getInt(1)) ->
          ((row.getInt(2), row.getLong(3), row.getLong(4))))
        .groupBy(_._1)
      val next = cent.map { case (key, prev) =>
        sums.get(key) match {
          case Some(ds) =>
            val byDim = ds.map { case (_, (d, n, sq)) =>
              d -> (sq.toDouble / n / 1024.0)
            }.toMap
            key -> prev.indices.map(i =>
              byDim.getOrElse(i, prev(i).toDouble).toFloat).toSeq
          case None => key -> prev // emptied cell keeps its centroid
        }
      }
      moved = next.exists { case (kk, a) =>
        a.zip(cent(kk)).exists { case (x, y) =>
          math.abs(x - y) >= 1.0f / 1024
        }
      }
      cent = next
      r += 1
    }
    // m·k rows — driver-sized by definition; materialize once
    val books = centDf.localCheckpoint(true)
    subs.unpersist()
    Model(books, m, k, dims)
  }

  /** Encode the corpus: (idCol, sub, code) — long format, ready for the
    * ADC join. All subspaces in one pass (same L2 scoring and cell-id
    * tiebreak as the fit's assignment). */
  def encode(corpus: DataFrame, model: Model,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val width = model.dims / model.m
    nearest(subFrame(corpus, model.m, width, idCol, vecCol),
      model.codebooks)
      .select(col("__id").as(idCol), col("sub"), col("cell").as("code"))
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

  /** ADC top-k restricted to an `allowed` (query_id, vec_id) candidate
    * set — the pruned scan backing `VectorSearch.ivfPqSearch`: where
    * `search` scores every query against the WHOLE encoded corpus, this
    * scores only the pairs an index (IVF cells, LSH buckets, a metadata
    * filter) admitted. The allowed join replicates each vector's m code
    * rows once per admitting query — exactly the pruned scan volume, so
    * cost tracks the index's selectivity, not corpus size. `encoded`'s
    * id column must be named `vec_id` (as `encode` emits by default). */
  def searchWithin(encoded: DataFrame, model: Model, queries: DataFrame,
                   allowed: DataFrame, topK: Int,
                   queryId: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val width = model.dims / model.m
    val qsubs = (0 until model.m).map { s =>
      queries.select(col(queryId).as("query_id"),
        lit(s).as("sub"), subCol(vecCol, s, width).as("qv"))
    }.reduce(_ unionByName _)
    val tables = qsubs.join(model.codebooks, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell").as("code"),
        VectorFns.dot(col("qv"), col("centroid")).as("ip"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_ip").desc, col("neighbor_id").asc)
    encoded
      .join(allowed.select(col("query_id"), col("vec_id")), Seq("vec_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(tables), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("ip")).as("approx_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("approx_ip"))
  }
}
