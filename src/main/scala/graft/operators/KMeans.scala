package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterated Lloyd k-means over an (id, Array[Float] vector) frame — the
  * training-side completion of the IVF family: `fit` produces the
  * centroid table that `VectorSearch.ivfAssign` / `writeIndex` /
  * `searchIndex` consume (s03/s04's pattern), so "cluster, index,
  * search" is one in-engine pipeline.
  *
  * Each round is the catalog's s06 update step made iterative:
  *  - assignment: cosine nearest centroid via `ivfAssign` — centroids
  *    broadcast, one window per vector, the corpus never shuffles;
  *  - update: posexplode → (cell, dim) hash agg with map-side combine,
  *    summing 1024-quantized components as EXACT integers (s06's trick),
  *    so the fit is bit-deterministic under ANY partitioning — float
  *    sums would make round N's centroids depend on task scheduling;
  *  - the k×dim per-round result collects to the driver (centroids are
  *    broadcast-sized by definition) to build the next round's table;
  *    cells that lose every member keep their previous centroid.
  *
  * Seeding is deterministic: the k lowest-id vectors. Iteration stops
  * early when no component moves by ≥ 1/1024 (the quantization grid),
  * i.e. the assignment is a fixed point.
  */
object KMeans {

  /** `centroids`: (cell: Int, vecCol: Array[Float]); `assignments`:
    * (idCol, cell, cos) under the final centroids; `rounds`: update
    * rounds actually run (< requested iff converged early). */
  final case class Model(centroids: DataFrame, assignments: DataFrame,
                         rounds: Int)

  /** Nearest centroid by SQUARED L2 — `argmin |v-c|² = argmax v·c −
    * |c|²/2` (the |v|² term is constant per vector), so the score is one
    * dot plus a per-centroid constant; ties break on cell id. The
    * assignment metric for quantizers that must preserve inner products
    * (PQ/ADC), where cosine's magnitude-blindness costs recall. */
  private def assignL2(corpus: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String): DataFrame = {
    val cent = centroids.select(col("cell"),
      col(vecCol).as("__cv"),
      (graft.functions.VectorFns.dot(col(vecCol), col(vecCol)) / 2)
        .as("__half_cn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("cell").asc)
    corpus.join(broadcast(cent))
      .select(col(idCol), col("cell"),
        (graft.functions.VectorFns.dot(col(vecCol), col("__cv")) -
          col("__half_cn2")).as("__score"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cell"))
  }

  def fit(spark: SparkSession, corpus: DataFrame, k: Int, maxRounds: Int,
          idCol: String = "vec_id", vecCol: String = "embedding",
          metric: String = "cosine"): Model = {
    import spark.implicits._
    require(k > 0 && maxRounds >= 0)
    require(metric == "cosine" || metric == "l2", s"unknown metric $metric")

    // deterministic seeds: the k lowest ids
    var centroids: Seq[(Int, Seq[Float])] = corpus
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0)).zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq
    def centroidDf = centroids.toDF("cell", vecCol)

    def assign(df: org.apache.spark.sql.DataFrame) =
      if (metric == "l2") assignL2(corpus, df, idCol, vecCol)
      else VectorSearch.ivfAssign(corpus, df,
        corpusId = idCol, cellId = "cell", vecCol = vecCol)
        .select(col(idCol), col("cell"))

    var rounds = 0
    var moved = true
    while (moved && rounds < maxRounds) {
      val assigned = assign(centroidDf)
      val sums = corpus.join(assigned, idCol)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v").cast("double") * 1024).cast("long")).as("sq"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      val next = centroids.map { case (cell, prev) =>
        sums.get(cell) match {
          case Some(ds) =>
            val byDim = ds.map(t => t._2 -> (t._4.toDouble / t._3 / 1024.0))
              .toMap
            (cell, prev.indices.map(i =>
              byDim.getOrElse(i, prev(i).toDouble).toFloat))
          case None => (cell, prev) // emptied cell keeps its centroid
        }
      }
      moved = next.zip(centroids).exists { case ((_, a), (_, b)) =>
        a.zip(b).exists { case (x, y) => math.abs(x - y) >= 1.0f / 1024 }
      }
      centroids = next
      rounds += 1
    }
    Model(centroidDf,
      if (metric == "l2") assign(centroidDf)
      else VectorSearch.ivfAssign(corpus, centroidDf, corpusId = idCol,
        cellId = "cell", vecCol = vecCol), rounds)
  }
}
