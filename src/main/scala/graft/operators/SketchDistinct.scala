package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained DISTINCT-COUNT rollup — MaterializedAgg's
  * missing half: counts and sums merge by addition, but a distinct count
  * is non-distributive, so the stored state is a mergeable per-key HLL
  * SKETCH (Datasketches, `hll_sketch_agg`) instead of a number. Each
  * refresh sketches ONLY the new batch (map-side partial, one
  * batch-sized shuffle) and folds it into the stored sketches with
  * `hll_union` — so "distinct users per day/country" over 100 TB of
  * history stays a batch-sized job forever, and the raw data never needs
  * to be re-scanned (or even retained) for the rollup to stay current.
  *
  * The q51/q29 validation philosophy applies downstream: consumers read
  * `estimate` (lgK=14 ⇒ ~0.8% relative error; exact in the sketch's
  * sparse mode at small cardinalities) and can gate it against an exact
  * recomputation where one is affordable. Union with a sketch of the
  * SAME lgK is lossless relative to sketching the concatenated input —
  * refresh order never matters (the spec pins this).
  *
  * Shares the single-writer lock with the other materializers. */
final class SketchDistinct(spark: SparkSession, targetPath: String,
                           keys: Seq[String], distinctCol: String,
                           lgK: Int = 14,
                           store: CommitStore = CommitStore.local) {

  private def partial(batch: DataFrame): DataFrame =
    batch.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      hll_sketch_agg(col(distinctCol), lit(lgK)).as("sk"))

  /** Fold one batch into the stored per-key sketches (creates the table
    * on first call). */
  def refresh(batch: DataFrame): Unit = {
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
        store) {
      val p = partial(batch)
      val merged =
        if (!store.exists(targetPath)) p
        else {
          val renamed = p.withColumnRenamed("n_rows", "n_rows__b")
            .withColumnRenamed("sk", "sk__b")
          spark.read.parquet(targetPath)
            .join(renamed, keys, "full_outer")
            .select((keys.map(col) :+
              (coalesce(col("n_rows"), lit(0L)) +
                coalesce(col("n_rows__b"), lit(0L))).as("n_rows") :+
              when(col("sk").isNull, col("sk__b"))
                .when(col("sk__b").isNull, col("sk"))
                .otherwise(hll_union(col("sk"), col("sk__b")))
                .as("sk")): _*)
        }
      Incremental.atomicOverwrite(store, targetPath)(tmp =>
        merged.write.mode(SaveMode.Overwrite).parquet(tmp))
    }
  }

  /** Current rollup: keys, row count, distinct estimate (the sketch
    * column rides along for further merging by downstream unions). */
  def read(): DataFrame =
    spark.read.parquet(targetPath)
      .withColumn("distinct_est", hll_sketch_estimate(col("sk")))

}
