package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Incremental "delete+insert" materializer with a sliding late-data window.
  *
  * Re-expresses the reference's dbt incremental models
  * (`materialized='incremental', unique_key=…, incremental_strategy=
  * 'delete+insert'` — stg_clickstream_events.sql:1-6 and siblings) plus their
  * 1-day lookback predicate (`ts >= max(ts) - INTERVAL 1 DAY` over the
  * target, stg_orders.sql:17-25) on plain Parquet, transactionally via a
  * write-to-temp-then-atomic-swap protocol (the reference leans on DuckDB's
  * single-file transactionality; SURVEY.md §7.4 risk 2).
  *
  * Scale notes: the upsert is `target left_anti updates ∪ updates`. The
  * anti-join shuffles both sides on the key — at 100 TB you avoid rewriting
  * unrelated data by FIRST pruning the target to the partitions the updates
  * can touch (delete+insert at partition granularity,
  * `partitionOverwriteMode=dynamic`); `upsertPartitioned` does exactly that,
  * so only affected date partitions are read or rewritten and the anti-join
  * runs over a sliver of the table.
  */
final class Incremental(spark: SparkSession) {

  /** Scalar watermark: `coalesce(max(tsCol) - lookback, epoch)` over the
    * current target — collected to a literal so the source scan gets a
    * pushed-down, partition-prunable filter (SURVEY.md §4 "collected to
    * literals first"). */
  def watermark(targetPath: String, tsCol: String,
                lookback: String): Option[java.sql.Timestamp] =
    if (!Files.exists(Paths.get(targetPath))) None
    else {
      val row = spark.read.parquet(targetPath)
        .agg(max(col(tsCol).cast("timestamp") - expr(s"INTERVAL $lookback")))
        .first()
      if (row.isNullAt(0)) None else Some(row.getTimestamp(0))
    }

  /** Filter `source` to rows at-or-after the target watermark (`>=`, the
    * standardized comparator — SURVEY.md §2.12 item 4). */
  def lateWindow(source: DataFrame, targetPath: String, tsCol: String,
                 lookback: String = "1 DAY"): DataFrame =
    watermark(targetPath, tsCol, lookback) match {
      case Some(wm) => source.filter(col(tsCol) >= lit(wm))
      case None     => source
    }

  /** Full-table delete+insert upsert by unique key, atomic swap. */
  def upsert(targetPath: String, updates: DataFrame,
             keys: Seq[String]): Unit = {
    val target = Paths.get(targetPath)
    val updatesCached = updates.cache()
    try {
      val merged =
        if (!Files.exists(target)) updatesCached
        else spark.read.parquet(targetPath)
          .join(updatesCached.select(keys.map(col): _*).distinct(),
            keys, "left_anti")
          .unionByName(updatesCached)
      atomicOverwrite(target, merged)
    } finally updatesCached.unpersist()
  }

  /** Partition-granular delete+insert: only partitions present in `updates`
    * are read, merged, and rewritten (dynamic partition overwrite). */
  def upsertPartitioned(targetPath: String, updates: DataFrame,
                        keys: Seq[String], partCol: String): Unit = {
    val target = Paths.get(targetPath)
    if (!Files.exists(target)) {
      updates.write.partitionBy(partCol).mode(SaveMode.Overwrite)
        .parquet(targetPath)
      return
    }
    val updatesCached = updates.cache()
    try {
      val updKeys = updatesCached.select(keys.map(col): _*).distinct().cache()
      // Partition discovery re-INFERS the partition column's type from the
      // dir names (a "2024-01-01" string partCol comes back as DATE);
      // normalize to the updates' type or partition values from the two
      // sides never compare equal.
      def target() = spark.read.parquet(targetPath).withColumn(partCol,
        col(partCol).cast(updatesCached.schema(partCol).dataType))
      // Delete scope must cover every partition an updated key CURRENTLY
      // lives in, not just the partitions the update rows land in: if an
      // update moves key K across partitions, K's stale row in the old
      // partition must go too (the reference's delete+insert deletes by key
      // over the whole table, dbt delete+insert semantics). The semi-join
      // below finds those partitions; when partCol is an immutable function
      // of the key it finds nothing extra and costs one pruned-column scan.
      val keyParts = target()
        .join(updKeys, keys, "left_semi")
        .select(partCol).distinct().collect().map(_.get(0))
      val updParts = updatesCached.select(partCol).distinct()
        .collect().map(_.get(0))
      val touched = (keyParts ++ updParts).distinct.toSeq
      val existing = target()
        .filter(col(partCol).isin(touched: _*)) // static partition pruning
        .join(updKeys, keys, "left_anti")
      // localCheckpoint cuts the file lineage: the merged rows are
      // materialized BEFORE the dynamic overwrite deletes the partition
      // dirs they were read from (read-overwrite conflict otherwise)
      val merged = existing.unionByName(updatesCached).localCheckpoint()
      merged.write.partitionBy(partCol).mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(targetPath)
      // dynamic overwrite only rewrites partitions PRESENT in the output;
      // a touched partition whose every row was an updated key's stale row
      // ends up empty and must be dropped explicitly
      val stillThere = merged.select(partCol).distinct()
        .collect().map(_.get(0)).toSet
      touched.filterNot(stillThere).foreach { p =>
        deleteRecursively(Paths.get(targetPath, s"$partCol=$p"))
      }
      updKeys.unpersist()
    } finally updatesCached.unpersist()
  }

  /** Write df to `path.__tmp`, then swap into place (old data preserved at
    * `path.__old` until the swap completes, then deleted). */
  private def atomicOverwrite(target: Path, df: DataFrame): Unit = {
    val tmp = Paths.get(target.toString + ".__tmp")
    val old = Paths.get(target.toString + ".__old")
    deleteRecursively(tmp); deleteRecursively(old)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (Files.exists(target))
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
