package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction maintenance job.
  *
  * Mirrors the reference's per-date-partition compaction
  * (ingestion/streaming_ingest.py:121-174: merge every parquet under a date
  * partition into one file, drop the micro-batch subdirs) as a Spark job.
  *
  * Scale notes: compaction is embarrassingly parallel ACROSS partitions and a
  * `repartition(n)` within one. We size output files by bytes rather than
  * hard-coding 1 file, so a 100 TB table compacts to ~targetFileBytes files
  * per partition instead of one giant row group per date. All planning
  * metadata (partition listing, file sizes) and every swap go through the
  * caller's [[CommitStore]] binding — local java.nio by default, Hadoop
  * `FileSystem` for HDFS-class stores — and each partition's rewrite uses
  * the shared CHECKED tmp+swap primitive (a failed rename restores the
  * previous partition and throws; it can never silently drop data).
  */
final class Compaction(spark: SparkSession,
                       targetFileBytes: Long = 512L * 1024 * 1024,
                       minFilesToCompact: Int = 2,
                       store: CommitStore = CommitStore.local) {

  /** Compact every immediate `part=` subdirectory of `root` that has at
    * least `minFilesToCompact` parquet files. Returns compacted dirs.
    * Holds the table's single-writer lock: the per-partition
    * move/swap sequence interleaved with a concurrent upsert's
    * delete+overwrite is the same lost-write hazard Incremental guards
    * against (maintenance and materialization mutually exclude). */
  def compact(root: String): Seq[String] =
    rewritePartitions(root, minFiles = minFilesToCompact, None)(
      (df, nOut) => df.repartition(nOut))

  /** Clustering rewrite: like compact, but rows are also SORTED by
    * `clusterCols` within each output file. Parquet stores per-row-group
    * min/max stats; clustering makes those ranges narrow and disjoint, so
    * later point/range filters on the cluster columns skip whole row
    * groups at scan time (the poor-man's Z-ORDER for a single sort key
    * set — a maintenance-time trade of one sort for every future scan). */
  def cluster(root: String, clusterCols: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.col
    rewritePartitions(root, minFiles = 1, None) { (df, nOut) =>
      // range-repartition then sort within: output file f covers one
      // contiguous range of the cluster key
      df.repartitionByRange(nOut, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
    }
  }

  /** Z-ORDER clustering rewrite: like `cluster`, but rows sort on a
    * Morton key interleaving ALL of `dimCols` — each output file then
    * covers a narrow range in EVERY dimension (a lexicographic sort
    * leaves trailing dimensions full-range in every file), so row-group
    * stats prune scans filtered on any clustered dimension. Per-dim
    * min/max are collected to literals (the static-pruning idiom) to
    * scale values onto the 16-bit grid; `filesPerPartition` overrides the
    * byte-derived output count (tests, or externally-planned layouts). */
  def clusterZOrder(root: String, dimCols: Seq[String],
                    filesPerPartition: Option[Int] = None): Seq[String] = {
    import org.apache.spark.sql.functions.{col, min, max}
    rewritePartitions(root, minFiles = 1, filesPerPartition) {
      (df, nOut) =>
        val aggs = dimCols.flatMap(c =>
          Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        val stats = df.agg(aggs.head, aggs.tail: _*).first()
        // an all-null (or non-castable) dimension yields null min/max —
        // getDouble would NPE mid-rewrite; a degenerate (0,0) range is
        // safe because ZOrder.scale maps degenerate ranges to 0
        def statAt(i: Int): Double =
          Option(stats.get(i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        val bounds = dimCols.indices.map(i =>
          (statAt(2 * i), statAt(2 * i + 1)))
        val z = ZOrder.zValue(dimCols.zip(bounds).map { case (c, (lo, hi)) =>
          ZOrder.scale(col(c), lo, hi)
        })
        df.withColumn("__z", z)
          .repartitionByRange(nOut, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
    }
  }

  /** Shared rewrite driver: for each qualifying `part=` dir (or the flat
    * root itself), read, apply `shape(df, nOut)`, and swap the rewritten
    * copy into place via the checked tmp+swap. `shape` receives the
    * byte-derived (or overridden) output file count; `compact` passes a
    * plain `repartition`. */
  private def rewritePartitions(root: String, minFiles: Int,
      filesOverride: Option[Int])(
      shape: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.DataFrame): Seq[String] =
    Incremental.withLock(root, Incremental.DefaultLockStaleMs, store) {
      if (!store.exists(root)) return Nil
      val parts = partDirs(root)
      parts.flatMap { part =>
        val sizes = TableStats.parquetSizes(part, store)
        if (sizes.size < minFiles) None
        else {
          val nOut = filesOverride.getOrElse(
            math.max(1, (sizes.sum / targetFileBytes).toInt))
          val df = spark.read.parquet(part)
          Incremental.atomicOverwrite(store, part)(tmp =>
            shape(df, nOut).write.mode(SaveMode.Overwrite)
              .parquet(tmp))
          Some(part)
        }
      }
    }

  private def partDirs(root: String): Seq[String] =
    store.listEntries(root)
      .filter(e => e.isDir && e.name.contains("="))
      .map(e => s"$root/${e.name}")
      .sorted
}
