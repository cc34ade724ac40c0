package graft.operators

/** Layout advisory for a partitioned parquet table: per-partition file
  * counts, bytes, and skew — the numbers an operator reads BEFORE
  * deciding to run Compaction (too many small files), ZOrder (scan
  * locality), or q14-style salting (partition skew). Pure filesystem
  * metadata: no Spark job, no data read — at 100 TB this is a listing
  * call per partition (on an object store, one LIST page per prefix),
  * which is exactly why maintenance planning consults stats instead of
  * scanning data. All listing goes through a [[CommitStore]] binding
  * (local java.nio by default, Hadoop `FileSystem` for HDFS-class
  * stores), so the same planner runs wherever the table lives.
  */
object TableStats {

  final case class PartitionStat(partition: String, files: Int,
      bytes: Long, minFileBytes: Long, maxFileBytes: Long)

  final case class Report(partitions: Seq[PartitionStat],
      totalFiles: Int, totalBytes: Long,
      /** max partition bytes / mean partition bytes; 1.0 = balanced.
        * The threshold a caller checks before a big keyed job: > ~4-8
        * means one task set will straggle (salt or AQE-skew it). */
      skewRatio: Double,
      /** partitions whose file count exceeds the small-file threshold —
        * Compaction's work list. */
      needsCompaction: Seq[String])

  /** Stats for every `part=`-style immediate subdir of `root`; a flat
    * (unpartitioned) table reports as one pseudo-partition "". */
  def report(root: String, smallFileThreshold: Int = 8,
      store: CommitStore = CommitStore.local): Report = {
    if (!store.exists(root))
      return Report(Nil, 0, 0L, 1.0, Nil)
    val partDirs = store.listEntries(root)
      .filter(e => e.isDir && e.name.contains("="))
      .map(_.name).sorted
    val stats =
      if (partDirs.nonEmpty) partDirs.map(n => statOf(n, s"$root/$n", store))
      else Seq(statOf("", root, store))
    val nonEmpty = stats.filter(_.files > 0)
    val totalBytes = nonEmpty.map(_.bytes).sum
    val skew =
      if (nonEmpty.isEmpty || totalBytes == 0) 1.0
      else nonEmpty.map(_.bytes).max.toDouble /
        (totalBytes.toDouble / nonEmpty.size)
    Report(stats, nonEmpty.map(_.files).sum, totalBytes, skew,
      nonEmpty.filter(_.files >= smallFileThreshold).map(_.partition))
  }

  /** Recursive parquet file sizes under `dir` through the store's typed
    * listing (micro-batch subdirs nest one level in the landing layout,
    * so the walk must recurse). */
  private[operators] def parquetSizes(dir: String,
      store: CommitStore): Seq[Long] =
    store.listEntries(dir).flatMap { e =>
      if (e.isDir) parquetSizes(s"$dir/${e.name}", store)
      else if (e.name.endsWith(".parquet")) Seq(e.bytes)
      else Nil
    }

  private def statOf(name: String, dir: String,
      store: CommitStore): PartitionStat = {
    val sizes = parquetSizes(dir, store)
    if (sizes.isEmpty) PartitionStat(name, 0, 0L, 0L, 0L)
    else PartitionStat(name, sizes.size, sizes.sum, sizes.min, sizes.max)
  }
}
