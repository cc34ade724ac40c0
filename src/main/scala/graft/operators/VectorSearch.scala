package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library API for similarity search over ANY (id, vector) frame — the
  * operator forms behind catalog queries s01 (exact), s03/s04 (IVF) —
  * so callers bring their own corpus, query set, and centroid table
  * instead of the test tables' fixed schema.
  *
  * Scale shapes (the ones the catalog's plans pin):
  *  - exact top-k: the QUERY side broadcasts; the corpus is scanned
  *    once and never shuffled — right whenever queries ≪ corpus.
  *  - IVF: centroids broadcast for assignment (one window per vector);
  *    search probes only each query's `nprobe` nearest cells via an
  *    equi-join on the short cell key — per-query work is
  *    O(corpus/cells × nprobe), not O(corpus).
  * Cosines are ordered double folds (`VectorFns`), deterministic under
  * any partitioning; ties break on neighbor id.
  */
object VectorSearch {

  private def normed(df: DataFrame, id: String, vec: String,
                     idAs: String, vecAs: String, nrmAs: String) =
    df.select(col(id).as(idAs), col(vec).as(vecAs),
      VectorFns.norm(col(vec)).as(nrmAs))

  private def cos(av: org.apache.spark.sql.Column,
                  an: org.apache.spark.sql.Column,
                  bv: org.apache.spark.sql.Column,
                  bn: org.apache.spark.sql.Column) =
    when(an === 0 || bn === 0, lit(null))
      .otherwise(VectorFns.dot(av, bv) / (an * bn))

  /** Exact cosine top-k: `(query_id, rank, neighbor_id, cos)`. Rows
    * where query_id == neighbor_id are excluded (self-match). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 corpusId: String = "vec_id", queryId: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val c = normed(corpus, corpusId, vecCol, "neighbor_id", "cv", "cn")
    val q = normed(queries, queryId, vecCol, "query_id", "qv", "qn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cos(col("qv"), col("qn"), col("cv"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Assign every vector to its nearest centroid by cosine:
    * `(id, cell, cos)`. `centroids` is a small (cell, vector) frame. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                corpusId: String = "vec_id", cellId: String = "cell",
                vecCol: String = "embedding"): DataFrame =
    cellRanks(corpus, centroids, corpusId, cellId, vecCol)
      .filter(col("__rn") === 1)
      .select(col(corpusId), col(cellId), col("__ccos").as("cos"))

  private def cellRanks(corpus: DataFrame, centroids: DataFrame,
                        corpusId: String, cellId: String,
                        vecCol: String): DataFrame = {
    val c = normed(corpus, corpusId, vecCol, corpusId, "__v", "__n")
    val cent = normed(centroids, cellId, vecCol, cellId, "__cv", "__cn")
    val w = Window.partitionBy(col(corpusId))
      .orderBy(col("__ccos").desc, col(cellId).asc)
    c.join(broadcast(cent))
      .select(col(corpusId), col(cellId), col("__v"), col("__n"),
        cos(col("__v"), col("__n"), col("__cv"), col("__cn"))
          .as("__ccos"))
      .withColumn("__rn", row_number().over(w))
  }

  /** Persist the inverted file: the corpus assignment (vector, norm,
    * cell) written PARTITIONED BY the cell id, so a later search's scan
    * is partition-PRUNED to the probed cells — the on-disk layout that
    * makes IVF pay off at rest: nprobe/cells of the index is read,
    * never the corpus. Rebuild-on-recluster; appends of new vectors are
    * per-cell file adds. */
  def writeIndex(corpus: DataFrame, centroids: DataFrame, path: String,
                 corpusId: String = "vec_id", cellId: String = "cell",
                 vecCol: String = "embedding"): Unit =
    cellRanks(corpus, centroids, corpusId, cellId, vecCol)
      .filter(col("__rn") === 1)
      .select(col(corpusId), col("__v").as(vecCol), col("__n").as("nrm"),
        col(cellId))
      .write.partitionBy(cellId)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Append a batch to a persisted index: new vectors assign to their
    * cells and land as per-cell file ADDS — no rewrite of existing index
    * files, the incremental corpus-growth path (the same per-cell-append
    * contract SemDedup.streamDedup uses). Centroids must be the index's
    * own (an index is defined by its centroid set; re-fit ⇒ rebuild). */
  def appendToIndex(batch: DataFrame, centroids: DataFrame, path: String,
                    corpusId: String = "vec_id", cellId: String = "cell",
                    vecCol: String = "embedding"): Unit =
    cellRanks(batch, centroids, corpusId, cellId, vecCol)
      .filter(col("__rn") === 1)
      .select(col(corpusId), col("__v").as(vecCol), col("__n").as("nrm"),
        col(cellId))
      .write.partitionBy(cellId)
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(path)

  /** Search a persisted index: queries pick their `nprobe` cells from
    * the (broadcast-sized) centroid table, the probed cell ids collect
    * to a literal IN-list (the static-pruning idiom), and the index scan
    * reads ONLY those partitions. Same output as `ivfSearch`. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: DataFrame, centroids: DataFrame, k: Int,
                  nprobe: Int = 2, corpusId: String = "vec_id",
                  queryId: String = "vec_id", cellId: String = "cell",
                  vecCol: String = "embedding"): DataFrame = {
    val probes = cellRanks(queries, centroids, queryId, cellId, vecCol)
      .filter(col("__rn") <= nprobe)
      .select(col(queryId).as("query_id"), col(cellId),
        col("__v").as("qv"), col("__n").as("qn"))
      // eager localCheckpoint, not cache(): probes feed the collect below
      // AND the result plan, but a cache here could never be unpersisted
      // (the result is lazy) and would pin storage across calls; the
      // ContextCleaner frees checkpoint blocks once the result is dropped
      .localCheckpoint(true)
    val probedCells = probes.select(col(cellId)).distinct()
      .collect().map(_.get(0))
    val index = spark.read.parquet(path)
      .filter(col(cellId).isin(probedCells: _*)) // partition pruning
      .withColumnRenamed(vecCol, "cv").withColumnRenamed("nrm", "cn")
      .withColumnRenamed(corpusId, "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(index, Seq(cellId))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col(cellId),
        cos(col("qv"), col("qn"), col("cv"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"), col(cellId).as("probed_cell"))
  }

  /** IVF probe search: each query exact-ranks ONLY the corpus vectors
    * assigned to its `nprobe` nearest cells —
    * `(query_id, rank, neighbor_id, cos, probed_cell)`. */
  def ivfSearch(corpus: DataFrame, queries: DataFrame,
                centroids: DataFrame, k: Int, nprobe: Int = 2,
                corpusId: String = "vec_id", queryId: String = "vec_id",
                cellId: String = "cell",
                vecCol: String = "embedding"): DataFrame = {
    val assignment = cellRanks(corpus, centroids, corpusId, cellId, vecCol)
      .filter(col("__rn") === 1)
      .select(col(corpusId).as("neighbor_id"), col(cellId),
        col("__v").as("cv"), col("__n").as("cn"))
    val probes = cellRanks(queries, centroids, queryId, cellId, vecCol)
      .filter(col("__rn") <= nprobe)
      .select(col(queryId).as("query_id"), col(cellId),
        col("__v").as("qv"), col("__n").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(assignment, Seq(cellId))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col(cellId),
        cos(col("qv"), col("qn"), col("cv"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"), col(cellId).as("probed_cell"))
  }

  /** IVF + PQ composed search — the standard billion-scale ANN layout,
    * wiring the engine's three vector stages into one operator: the
    * inverted file prunes each query's scan to its `nprobe` nearest
    * cells, the product-quantized codes make the scanned sliver 16-32×
    * smaller than the float vectors (ADC table lookups, no float math
    * per candidate), and only the `candidates` best approximate scores
    * per query touch the float corpus for the exact cosine top-`k`.
    * Recall is the product of the two stages' recalls — gate it against
    * `cosineTopK` on a sample (VectorSearchSpec pins this corpus's
    * level); raise `nprobe` first when it dips, `candidates` second.
    * Output: `(query_id, rank, neighbor_id, cos)`. */
  def ivfPqSearch(corpus: DataFrame, queries: DataFrame,
                  centroids: DataFrame, model: ProductQuantizer.Model,
                  k: Int, nprobe: Int = 2, candidates: Int = 100,
                  corpusId: String = "vec_id", queryId: String = "vec_id",
                  cellId: String = "cell",
                  vecCol: String = "embedding"): DataFrame = {
    val canonical = corpus.select(col(corpusId).as("vec_id"),
      col(vecCol))
    val assignment = ivfAssign(canonical, centroids, "vec_id", cellId,
      vecCol).select(col("vec_id"), col(cellId))
    val probes = cellRanks(queries, centroids, queryId, cellId, vecCol)
      .filter(col("__rn") <= nprobe)
      .select(col(queryId).as("query_id"), col(cellId))
    val allowed = broadcast(probes).join(assignment, Seq(cellId))
      .select(col("query_id"), col("vec_id"))
    val encoded = ProductQuantizer.encode(canonical, model,
      idCol = "vec_id", vecCol = vecCol)
    val cands = ProductQuantizer.searchWithin(encoded, model, queries,
      allowed, candidates, queryId, vecCol)
    val c = normed(corpus, corpusId, vecCol, "neighbor_id", "cv", "cn")
    val q = normed(queries, queryId, vecCol, "query_id", "qv", "qn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.select(col("query_id"), col("neighbor_id"))
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cos(col("qv"), col("qn"), col("cv"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos"))
  }
}
