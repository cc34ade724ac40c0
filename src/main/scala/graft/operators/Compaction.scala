package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small-file compaction maintenance job.
  *
  * Mirrors the reference's per-date-partition compaction
  * (ingestion/streaming_ingest.py:121-174: merge every parquet under a date
  * partition into one file, drop the micro-batch subdirs) as a Spark job.
  *
  * Scale notes: compaction is embarrassingly parallel ACROSS partitions and a
  * `repartition(n)` within one. We size output files by bytes rather than
  * hard-coding 1 file, so a 100 TB table compacts to ~targetFileBytes files
  * per partition instead of one giant row group per date.
  */
final class Compaction(spark: SparkSession,
                       targetFileBytes: Long = 512L * 1024 * 1024,
                       minFilesToCompact: Int = 2) {

  /** Compact every immediate `part=` subdirectory of `root` that has at
    * least `minFilesToCompact` parquet files. Returns compacted dirs.
    * Holds the table's single-writer lock: the per-partition
    * move/swap sequence interleaved with a concurrent upsert's
    * delete+overwrite is the same lost-write hazard Incremental guards
    * against (maintenance and materialization mutually exclude). */
  def compact(root: String): Seq[String] = Incremental.withLock(
      Paths.get(root)) {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil
    val parts = partDirs(rootPath)
    parts.flatMap { part =>
      val files = parquetFiles(part)
      if (files.size < minFilesToCompact) None
      else {
        val bytes = files.map(Files.size).sum
        val nOut = math.max(1, (bytes / targetFileBytes).toInt)
        val df = spark.read.parquet(part.toString)
        val tmp = Paths.get(part.toString + ".__compact")
        deleteRecursively(tmp)
        df.repartition(nOut).write.mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        val old = Paths.get(part.toString + ".__old")
        Files.move(part, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, part, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        Some(part.toString)
      }
    }
  }

  /** Clustering rewrite: like compact, but rows are also SORTED by
    * `clusterCols` within each output file. Parquet stores per-row-group
    * min/max stats; clustering makes those ranges narrow and disjoint, so
    * later point/range filters on the cluster columns skip whole row
    * groups at scan time (the poor-man's Z-ORDER for a single sort key
    * set — a maintenance-time trade of one sort for every future scan). */
  def cluster(root: String, clusterCols: Seq[String]): Seq[String] =
    Incremental.withLock(Paths.get(root)) {
    import org.apache.spark.sql.functions.col
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil
    val parts = partDirs(rootPath)
    parts.flatMap { part =>
      val files = parquetFiles(part)
      if (files.isEmpty) None
      else {
        val bytes = files.map(Files.size).sum
        val nOut = math.max(1, (bytes / targetFileBytes).toInt)
        val df = spark.read.parquet(part.toString)
        val tmp = Paths.get(part.toString + ".__cluster")
        deleteRecursively(tmp)
        // range-repartition then sort within: output file f covers one
        // contiguous range of the cluster key
        df.repartitionByRange(nOut, clusterCols.map(col): _*)
          .sortWithinPartitions(clusterCols.map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val old = Paths.get(part.toString + ".__old")
        Files.move(part, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, part, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        Some(part.toString)
      }
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
                    filesPerPartition: Option[Int] = None): Seq[String] =
    Incremental.withLock(Paths.get(root)) {
    import org.apache.spark.sql.functions.{col, min, max}
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil
    val parts = partDirs(rootPath)
    parts.flatMap { part =>
      val files = parquetFiles(part)
      if (files.isEmpty) None
      else {
        val bytes = files.map(Files.size).sum
        val nOut = filesPerPartition.getOrElse(
          math.max(1, (bytes / targetFileBytes).toInt))
        val df = spark.read.parquet(part.toString)
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
        val tmp = Paths.get(part.toString + ".__zorder")
        deleteRecursively(tmp)
        df.withColumn("__z", z)
          .repartitionByRange(nOut, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val old = Paths.get(part.toString + ".__old")
        Files.move(part, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, part, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        Some(part.toString)
      }
    }
  }

  // list()/walk() hold a directory fd until closed (ADVICE r4)
  private def partDirs(rootPath: Path): Seq[Path] =
    Using.resource(Files.list(rootPath))(_.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.contains("="))
      .toSeq).sortBy(_.toString)

  private def parquetFiles(part: Path): Seq[Path] =
    Using.resource(Files.walk(part))(_.iterator().asScala
      .filter(f => f.toString.endsWith(".parquet")).toSeq)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Using.resource(Files.walk(p))(
        _.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f)))
}
