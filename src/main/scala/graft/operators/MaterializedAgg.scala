package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained SUM/COUNT aggregate table — the materialized-
  * view refresh that makes a 100 TB rollup affordable: each refresh
  * aggregates ONLY the new batch (map-side partial + one batch-sized
  * shuffle) and merges it into the stored per-key totals by ADDITION, so
  * steady-state cost tracks batch size, never table-scan size. Sums are
  * stored as exact decimals (addition is associative and exact, so any
  * refresh order converges to the full recompute — the spec pins this);
  * averages derive as sum/count at read time. Distributive aggregates
  * only by design: MIN/MAX also merge, but anything non-distributive
  * (exact distinct, percentiles) needs the sketch path (q29/q32/q44).
  */
final class MaterializedAgg(spark: SparkSession, targetPath: String,
                            keys: Seq[String], sumCols: Seq[String],
                            store: CommitStore = CommitStore.local) {

  private def partial(batch: DataFrame): DataFrame = {
    // stored sum type is DecimalType(38, 2) EVERYWHERE: the native sum
    // result type (input precision + 10) would make the stored schema flip
    // between the first refresh and later merge-refreshes, and a narrower
    // merge cast would silently overflow-to-null under non-ANSI mode; 38,2
    // is stable across refreshes and has headroom for 100 TB totals
    val aggs = count(lit(1)).as("n_rows") +: sumCols.map(c =>
      sum(col(c).cast(DecimalType(22, 2)))
        .cast(DecimalType(38, 2)).as(s"sum_$c"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch into the stored totals (creates the table on first
    * call). */
  def refresh(batch: DataFrame): Unit =
    // same read-merge-overwrite race as Incremental.upsert: two concurrent
    // refreshes would each merge against the pre-state and the later swap
    // would drop the earlier batch's contribution — serialize via the
    // shared single-writer lock (losers get ConcurrentWriteException)
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
      store) { refreshLocked(batch) }

  private def refreshLocked(batch: DataFrame): Unit = {
    val p = partial(batch)
    val merged =
      if (!store.exists(targetPath)) p
      else {
        val t = spark.read.parquet(targetPath)
        val renamed = (Seq("n_rows") ++ sumCols.map(c => s"sum_$c"))
          .foldLeft(p)((df, c) => df.withColumnRenamed(c, s"${c}__b"))
        t.join(renamed, keys, "full_outer")
          .select((keys.map(col) :+
            (coalesce(col("n_rows"), lit(0L)) +
              coalesce(col("n_rows__b"), lit(0L))).as("n_rows")) ++
            sumCols.map(c =>
              (coalesce(col(s"sum_$c"), lit(0).cast(DecimalType(38, 2))) +
                coalesce(col(s"sum_${c}__b"),
                  lit(0).cast(DecimalType(38, 2))))
                .cast(DecimalType(38, 2)).as(s"sum_$c")): _*)
      }
    Incremental.atomicOverwrite(store, targetPath)(tmp =>
      merged.write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Current totals, with derived averages. */
  def read(): DataFrame = {
    val base = spark.read.parquet(targetPath)
    sumCols.foldLeft(base)((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows").cast("double")))
  }

}
