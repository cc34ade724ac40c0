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
    * joint loop runs ~2 s). ONE scan, not an m-way union: the slices
    * materialize as an array per row and posexplode (pos = sub index)
    * — the union form planned m parallel scan branches (m× the scan
    * work and generated code; round-16 guide §2.3 "project early"). */
  private def subFrame(corpus: DataFrame, m: Int, width: Int,
                       idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("__id"),
      posexplode(array((0 until m).map(s =>
        subCol(vecCol, s, width)): _*)).as(Seq("sub", "v")))

  /** Nearest codebook entry per (vector, sub) by SQUARED L2 — argmin
    * |v−c|² = argmax v·c − |c|²/2: ADC approximates INNER PRODUCTS, so
    * codebooks must minimize L2 reconstruction error — cosine assignment
    * is magnitude-blind and measured 0.34 recall@10 vs l2's (gated)
    * level. Keeps `v` so the fit's moment pass needs no join back.
    *
    * The codebook is driver-sized, so assignment is ONE native codegen
    * expression over the literal codebook (PqNearestCell): zero fan-out,
    * zero exchange, k·width multiply-adds per row. The previous
    * relational argmin (broadcast join ×k + window/rank=1) shuffled and
    * sorted N·m·k scored rows PER fit round and per encode pass — the
    * round-16 before-plan's dominant cost (guide §1.2 step 1: fix the
    * distributed algorithm first). Scores and tiebreak (lowest cell)
    * are bit-identical — see PqNearestCell's scaladoc. */
  private def nearest(subs: DataFrame, cents: Array[Array[Array[Float]]],
      halves: Array[Array[Double]]): DataFrame =
    subs.select(col("__id"), col("sub"),
      graft.functions.PqNearestCell(col("sub").cast("int"), col("v"),
        cents, halves).as("cell"),
      col("v"))

  /** Codebook map → dense (cents, halves) arrays for PqNearestCell.
    * Half-norms use the same sequential left-to-right double fold as
    * DotProduct (then one exact /2), so scores match the old
    * dot(c,c)/2 column bit-for-bit. */
  private def toArrays(cent: Map[(Int, Int), Seq[Float]], m: Int, k: Int)
      : (Array[Array[Array[Float]]], Array[Array[Double]]) = {
    val cents = Array.tabulate(m, k)((s, c) => cent((s, c)).toArray)
    val halves = cents.map(_.map { cv =>
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        acc += cv(i).toDouble * cv(i).toDouble
        i += 1
      }
      acc / 2
    })
    (cents, halves)
  }

  /** Collect a Model's codebook table back to the dense driver-side form
    * (m·k rows — driver-sized by definition). */
  private def modelArrays(model: Model)
      : (Array[Array[Array[Float]]], Array[Array[Double]]) = {
    val cent = model.codebooks.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    toArrays(cent, model.m, model.k)
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
      val (ca, ha) = toArrays(cent, m, k)
      val sums = nearest(subs, ca, ha)
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
    val (ca, ha) = modelArrays(model)
    nearest(subFrame(corpus, model.m, width, idCol, vecCol), ca, ha)
      .select(col("__id").as(idCol), col("sub"), col("cell").as("code"))
  }

  /** ADC top-k: approximate inner product = Σ_sub ip(query_sub,
    * centroid[code]). `encoded` is `encode`'s output; queries stay
    * exact. Returns (query_id, rank, neighbor_id, approx_ip). */
  def search(encoded: DataFrame, model: Model, queries: DataFrame,
             topK: Int, queryId: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val width = model.dims / model.m
    val qsubs = queries.select(col(queryId).as("query_id"),
      posexplode(array((0 until model.m).map(s =>
        subCol(vecCol, s, width)): _*)).as(Seq("sub", "qv")))
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
    val qsubs = queries.select(col(queryId).as("query_id"),
      posexplode(array((0 until model.m).map(s =>
        subCol(vecCol, s, width)): _*)).as(Seq("sub", "qv")))
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
