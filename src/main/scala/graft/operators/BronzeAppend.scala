package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-idempotent append (bronze layer).
  *
  * The reference appends only landing partitions whose `ingest_date` is not
  * yet in the bronze table (`WHERE ingest_date NOT IN (SELECT DISTINCT
  * ingest_date FROM bronze.x)` — spark_jobs/bronze.py:31-34,62-64), making
  * re-runs idempotent at partition granularity.
  *
  * Scale notes: the seen-partition set is tiny (one value per date), so we
  * collect it to literals and filter with `NOT isin` — Catalyst then does
  * STATIC partition pruning on the source scan (no shuffle, no anti-join of
  * 100 TB against itself; SURVEY.md §4 "partition pruning"). The append
  * itself writes only new partition directories.
  */
final class BronzeAppend(spark: SparkSession,
    store: CommitStore = CommitStore.local) {

  def seenPartitions(targetPath: String, partCol: String): Seq[Any] =
    if (!store.exists(targetPath)) Nil
    else spark.read.parquet(targetPath)
      .select(partCol).distinct().collect().map(_.get(0)).toSeq

  /** Append rows of `source` whose `partCol` value is unseen in the
    * target. Serialized through the shared single-writer lock: the
    * seen-check and the append are not atomic, so two concurrent runs of
    * the same batch would BOTH see a partition as unseen and duplicate
    * it — idempotence only holds when runs serialize (the reference gets
    * this from DuckDB's file lock). */
  def appendNewPartitions(source: DataFrame, targetPath: String,
                          partCol: String): Long =
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
        store) {
      val seen = seenPartitions(targetPath, partCol)
      val fresh =
        if (seen.isEmpty) source
        else source.filter(!col(partCol).isin(seen: _*))
      val n = fresh.count()
      if (n > 0)
        fresh.write.partitionBy(partCol).mode(SaveMode.Append)
          .parquet(targetPath)
      n
    }
}
