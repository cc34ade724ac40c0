package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained KMV sketch rollup — [[SketchDistinct]]'s
  * sibling for the questions HLL cannot answer: the stored state is the
  * per-group k-minimum-values hash array, so the rollup supports not
  * just distinct ESTIMATES but set ALGEBRA between groups (union /
  * intersection / Jaccard via [[KmvSketch.overlapEstimates]]) long after
  * the raw data is gone — "how much do this quarter's buyer cohorts
  * overlap?" from KB of state, no fact-table re-scan.
  *
  * Each refresh sketches ONLY the new batch (the rank-≤-k cut gets
  * WindowGroupLimit pushdown, so the shuffle carries ≤ k rows per group
  * per partition) and folds it into the stored arrays with
  * [[KmvSketch.merge]] — associative and commutative, so refresh order
  * never matters and a rollup equals the sketch of the concatenated
  * history (the spec pins both). Shares the single-writer lock and the
  * checked atomic swap with the other materializers.
  */
final class KmvRollup(spark: SparkSession, targetPath: String,
    group: String, elemCol: String, k: Int = 64,
    store: CommitStore = CommitStore.local) {

  /** Fold one batch into the stored per-group sketches (creates the
    * table on first call). */
  def refresh(batch: DataFrame): Unit =
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
        store) {
      val p = KmvSketch.sketch(batch, group, col(elemCol), k)
      val merged =
        if (!store.exists(targetPath)) p
        else spark.read.parquet(targetPath)
          .join(p.withColumnRenamed("sk", "sk__b"), Seq(group),
            "full_outer")
          .select(col(group),
            when(col("sk").isNull, col("sk__b"))
              .when(col("sk__b").isNull, col("sk"))
              .otherwise(KmvSketch.merge(col("sk"), col("sk__b"), k))
              .as("sk"))
      Incremental.atomicOverwrite(store, targetPath)(tmp =>
        merged.write.mode(SaveMode.Overwrite).parquet(tmp))
    }

  /** Current rollup: group, sketch, distinct estimate. */
  def read(): DataFrame =
    spark.read.parquet(targetPath)
      .withColumn("distinct_est", KmvSketch.estimate(col("sk"), k))

  /** Pairwise union/intersection/Jaccard estimates between the stored
    * groups — the set algebra the raw data is no longer needed for. */
  def overlaps(): DataFrame =
    KmvSketch.overlapEstimates(spark.read.parquet(targetPath), group, k)
}
