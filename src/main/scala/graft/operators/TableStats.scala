package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Layout advisory for a partitioned parquet table: per-partition file
  * counts, bytes, and skew — the numbers an operator reads BEFORE
  * deciding to run Compaction (too many small files), ZOrder (scan
  * locality), or q14-style salting (partition skew). Pure filesystem
  * metadata: no Spark job, no data read — at 100 TB this is a listing
  * call per partition (on an object store, one LIST page per prefix),
  * which is exactly why maintenance planning consults stats instead of
  * scanning data.
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
  def report(root: String, smallFileThreshold: Int = 8): Report = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath))
      return Report(Nil, 0, 0L, 1.0, Nil)
    // list()/walk() hold a directory fd until closed (ADVICE r4)
    val partDirs = Using.resource(Files.list(rootPath))(_.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.contains("="))
      .toSeq).sortBy(_.getFileName.toString)
    val stats =
      if (partDirs.nonEmpty) partDirs.map(p =>
        statOf(p.getFileName.toString, p))
      else Seq(statOf("", rootPath))
    val nonEmpty = stats.filter(_.files > 0)
    val totalBytes = nonEmpty.map(_.bytes).sum
    val skew =
      if (nonEmpty.isEmpty || totalBytes == 0) 1.0
      else nonEmpty.map(_.bytes).max.toDouble /
        (totalBytes.toDouble / nonEmpty.size)
    Report(stats, nonEmpty.map(_.files).sum, totalBytes, skew,
      nonEmpty.filter(_.files >= smallFileThreshold).map(_.partition))
  }

  private def statOf(name: String, dir: Path): PartitionStat = {
    val sizes = Using.resource(Files.walk(dir))(_.iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .map(Files.size).toSeq)
    if (sizes.isEmpty) PartitionStat(name, 0, 0L, 0L, 0L)
    else PartitionStat(name, sizes.size, sizes.sum, sizes.min, sizes.max)
  }
}
