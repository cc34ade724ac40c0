package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Retention / lifecycle maintenance: drop partitions older than a cutoff.
  *
  * Re-expresses the reference's cleanup job
  * (ingestion/helper_functions/clear_old_data.py:1-41 — rm -rf of aged
  * data under each layer) as a real partition-granular operator: at
  * 100 TB retention must delete by PARTITION (a metadata-priced
  * operation), never by rewriting the table through a filter.
  *
  * Doomed partitions are resolved value → directory through Spark's own
  * reader — a partition-PRUNED scan of only the stale partitions, reading
  * zero data columns (input_file_name needs just the file listing) — the
  * same idiom as Incremental's emptied-partition cleanup: reconstructing
  * `part=value` paths by hand silently misses escaped or typed partition
  * values. Composes with Compaction/Incremental: all three touch the
  * table at partition granularity only, and all control-plane IO (lock,
  * existence, deletes) routes through the caller's [[CommitStore]]
  * binding.
  */
final class Retention(spark: SparkSession,
    store: CommitStore = CommitStore.local) {

  /** Drop every partition whose `partCol` value is strictly below
    * `cutoff`. Returns the deleted partition directories. */
  def dropPartitionsBefore(targetPath: String, partCol: String,
      cutoff: Column): Seq[String] =
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
        store) {
    if (!store.exists(targetPath)) return Nil
    val doomed = spark.read.parquet(targetPath)
      .filter(col(partCol) < cutoff) // static partition pruning
      .select(input_file_name()).distinct()
      .collect()
      .map(r => Incremental.parentDirOf(r.getString(0)))
      .distinct.toSeq
    doomed.foreach(store.deleteRecursively)
    doomed
  }

  /** Keep the most recent `days` days as of `asOf` (injected, not wall
    * clock — deterministic and spec-testable): drops partitions strictly
    * older than `asOf - days`. The cutoff is a literal, so the scan
    * prunes statically. */
  def retainDays(targetPath: String, partCol: String, days: Int,
      asOf: java.time.LocalDate): Seq[String] =
    dropPartitionsBefore(targetPath, partCol,
      lit(asOf.minusDays(days.toLong).toString).cast("date"))

  /** Production convenience: `retainDays` against the current UTC date. */
  def retainDays(targetPath: String, partCol: String, days: Int): Seq[String] =
    retainDays(targetPath, partCol, days,
      java.time.LocalDate.now(java.time.ZoneOffset.UTC))
}
