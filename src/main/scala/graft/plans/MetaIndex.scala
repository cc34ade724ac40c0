package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitionSpec,
  PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PLAN-FROM-METADATA file index: the Iceberg manifest-file idea (the
  * commit records every data file; planning reads metadata, never
  * LISTs the store) as a Spark `FileIndex`. A snapshot version whose
  * commit recorded its file manifest
  * ([[graft.operators.PartitionedSnapshots]] `filemeta` sidecar) plans
  * a scan from exactly those `FileStatus` entries — zero directory
  * listings, zero footer reads, zero `getFileStatus` probes — which is
  * the difference between O(live partitions) store round-trips per
  * plan and one metadata read at 100k+ partitions.
  *
  * File sizes come from the commit-time listing (exact, the files are
  * immutable), so `sizeInBytes` feeds Catalyst accurate stats (join
  * broadcastability) and split planning sees true lengths. The
  * modification time is the owner version's commit time (see
  * `PartitionedSnapshots.planStatuses`): the files are immutable, but
  * `_metadata.file_modification_time` must answer consistently with
  * the listing path, not 1970.
  *
  * Partition schema is EMPTY by design: the real partition column
  * rides inside the data files (the `__p` shadow-dir layout documented
  * on PartitionedSnapshots), so file-level pruning on it comes from
  * parquet footer stats and the zone-map/bloom sidecars, exactly as on
  * the listing path. */
final class GraftFileIndex(spark: SparkSession, root: Path,
    files0: Seq[FileStatus])
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  // qualify once against the root's filesystem (client-side — no
  // store round-trip), so the scan's PartitionedFile paths carry an
  // explicit scheme instead of resolving against the cluster's
  // default FS at read time
  private val files: Seq[FileStatus] = {
    val fs = root.getFileSystem(hadoopConf)
    files0.map { f =>
      new FileStatus(f.getLen, false, 1, f.getBlockSize,
        f.getModificationTime, fs.makeQualified(f.getPath))
    }
  }

  override def rootPaths: Seq[Path] = Seq(root)

  // listFiles/allFiles serve the recorded set DIRECTLY — the base
  // class's implementations re-derive them by matching leaf dirs
  // against qualified root paths, a dance that exists for discovered
  // listings; this index IS the listing
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions
        .Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions
        .Expression])
      : Seq[org.apache.spark.sql.execution.datasources
        .PartitionDirectory] =
    Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
      org.apache.spark.sql.catalyst.InternalRow.empty, files.map(f =>
        org.apache.spark.sql.execution.datasources
          .FileStatusWithMetadata(f))))

  override def allFiles(): Seq[FileStatus] = files

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override val leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new scala.collection.mutable.LinkedHashMap[Path, FileStatus]()
    files.foreach(f => m.put(f.getPath, f))
    m
  }

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    files.groupBy(_.getPath.getParent)
      .map { case (d, fs) => d -> fs.toArray }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def refresh(): Unit = ()
}

/** DSv2 parquet table whose scan plans from a [[GraftFileIndex]] and
  * whose schema is the commit-recorded one — the SQL catalog's
  * plan-from-metadata path: `SELECT` over a 100k-partition snapshot
  * costs one filemeta parse instead of 100k dir listings plus footer
  * schema inference. Everything else (ParquetScanBuilder's filter
  * pushdown, column pruning, vectorized read) is inherited unchanged. */
final class IndexedParquetTable(name: String, spark: SparkSession,
    options: CaseInsensitiveStringMap, tableRoot: String,
    tableSchema: StructType, files: Seq[FileStatus])
  extends ParquetTable(name, spark, options, Seq(tableRoot),
    Some(tableSchema), classOf[ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new GraftFileIndex(spark, new Path(tableRoot), files)
}
