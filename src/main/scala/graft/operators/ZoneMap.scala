package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FILE-LEVEL data skipping on plain parquet — the Delta/Iceberg idea of
  * file stats living in a metadata layer, as a sidecar index the reader
  * consults BEFORE the scan plans. Parquet footers already carry row-group
  * min/max, but the engine still has to LIST and OPEN every file per query
  * to see them; at 100 TB (millions of files) the open-per-file round
  * trips dominate selective queries. A zone map moves those stats into one
  * small parquet table read once: a range predicate then prunes the FILE
  * LIST on the driver (metadata-sized, exactly like Delta's stats pruning)
  * and only survivors reach the scan, whose footer pushdown then prunes
  * row groups as usual — two-level skipping.
  *
  * Stat collection harvests the parquet FOOTERS first (round 14): the
  * chunk-level min/max/null-count statistics the writer already
  * computed are read distributedly — O(files) footer reads, zero data
  * pages — for every column whose physical/logical type has EXACT
  * footer stats (boolean, integral, float/double, string, date,
  * int64 timestamps). A file whose stats are absent (large-binary
  * stats omission, INT96 timestamps, decimals, nested types, legacy
  * writers) falls back to the original distributed column-pruned SCAN
  * for just that file — per-file, so one odd file never forces a
  * table scan. At 100 TB this is the difference between building the
  * index by reading 100 TB and building it by reading footers.
  */
object ZoneMap {

  /** One row per data file under `dirs`: `file`, `rows`, and
    * `min__c`/`max__c`/`nulls__c` per indexed column. Files are
    * immutable once written, so stats never go stale — an index is
    * invalidated only by its file list changing.
    *
    * Harvests FOOTERS when every indexed column's type carries exact
    * chunk statistics; any file whose stats are unusable falls back to
    * the data scan individually (see the object doc). */
  def collect(spark: SparkSession, dirs: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "index at least one column")
    val dataSchema = spark.read.option("mergeSchema", "true")
      .parquet(dirs: _*).schema
    val types = cols.map(c =>
      c -> dataSchema.find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    if (types.exists(t => t._2.isEmpty || !exactStatType(t._2.get)))
      return collectScan(spark, dirs, cols, Some(dataSchema))
    val colTypes = types.map { case (c, t) => (c, t.get) }
    val hconf = spark.sessionState.newHadoopConf()
    // rendered EXACTLY as input_file_name() renders (SparkPath's
    // uri string): readWhere intersects zone and bloom survivor sets
    // by raw string, so footer-built and scan-built rows must agree
    val files = dirs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hconf).listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.toUri.toString)
    }
    if (files.isEmpty) return collectScan(spark, dirs, cols, None)
    val harvested = org.apache.spark.sql.graft.Bridge
      .mapFilesWithConf(spark, files,
        math.min(files.size, spark.sparkContext.defaultParallelism)) {
        (f, conf) => f -> harvestFooter(f, colTypes, conf)
      }
    val good = harvested.toSeq.collect {
      case (_, Some(vals)) if vals.nonEmpty => Row.fromSeq(vals)
    }
    val fallback = harvested.toSeq.collect { case (f, None) => f }
    // a SYSTEMATIC harvest failure (credentials not reaching
    // executors, a store rejecting footer reads) silently degrades
    // every file to the data scan — the 100 TB win disappears with no
    // signal unless the count is visible
    if (fallback.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"zone-map footer harvest fell back to the data scan for " +
          s"${fallback.size} of ${files.size} files (missing/legacy " +
          "stats, or footer reads failing against the store)")
    val outSchema = StructType(
      StructField("file", StringType) +:
        colTypes.flatMap { case (c, dt) => Seq(
          StructField(s"min__$c", dt), StructField(s"max__$c", dt),
          StructField(s"nulls__$c", LongType))
        } :+ StructField("rows", LongType))
    import scala.jdk.CollectionConverters._
    val footerDf = spark.createDataFrame(good.asJava, outSchema)
    if (fallback.isEmpty) footerDf
    else footerDf.unionByName(
      collectScan(spark, fallback, cols, Some(dataSchema)))
  }

  /** The original distributed column-pruned SCAN collector — the
    * semantic definition of the stats and the fallback for files or
    * types without exact footer statistics. An explicit `schema`
    * null-fills columns a pre-evolution file's footer lacks (the
    * whole-dirs call infers it; a per-file fallback must not fail on
    * a narrow footer). */
  private[graft] def collectScan(spark: SparkSession,
      paths: Seq[String], cols: Seq[String],
      schema: Option[StructType] = None): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min__$c"), max(col(c)).as(s"max__$c"),
      sum(col(c).isNull.cast("long")).as(s"nulls__$c"))) :+
      count(lit(1)).as("rows")
    val r = spark.read.option("mergeSchema", "true")
    schema.fold(r)(s => r.schema(s)).parquet(paths: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Types whose parquet chunk statistics are EXACT when present
    * (boolean/integral/float/double, UTF8 strings — unsigned byte
    * order equals Spark's UTF8String order — dates, int64
    * timestamps). Decimals, binaries, nested and NTZ types fall back
    * to the scan. Shared with the commit-time stats harvest
    * ([[FileStats]]). */
  private[graft] def exactStatType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | DateType |
        TimestampType => true
    case _ => false
  }

  /** Per-file footer harvest for the INDEX BUILDER: Some(row values)
    * on success, Some(Nil) for a zero-row file (the scan form emits no
    * row for those either), None → this file needs the data scan. The
    * index row is all-or-nothing: ONE unusable column sends the whole
    * file to the scan fallback (the sidecar schema is fixed across
    * files). The commit-time harvest ([[footerFileStats]]) is
    * per-column tolerant instead. */
  private def harvestFooter(path: String,
      colTypes: Seq[(String, DataType)],
      conf: org.apache.hadoop.conf.Configuration): Option[Seq[Any]] =
    footerFileStats(path, colTypes, conf).flatMap {
      case (0L, _) => Some(Nil)
      case (totalRows, per) =>
        if (per.exists(_.isEmpty)) None
        else Some((path +: per.flatMap {
          case Some((mn, mx, n)) => Seq(mn, mx, n)
          case None => Nil
        }) :+ totalRows)
    }

  /** ONE footer read → (total rows, per-column stat verdicts), the
    * shape the COMMIT path shares with the index builder: each column
    * maps to Some((min, max, nulls)) with EXTERNAL values (min/max
    * null for an all-null or footer-absent column), or None when that
    * column's stats are UNUSABLE for pruning — missing/legacy stats,
    * INT96 timestamps, stats omitted by the writer for NaN floats or
    * oversized binaries (detected as no-min/max with non-null rows —
    * trusting such a file would silently prune live rows), or a
    * non-exact-stat type. None overall = the footer itself failed to
    * read (row count unknown too). */
  private[graft] def footerFileStats(path: String,
      colTypes: Seq[(String, DataType)],
      conf: org.apache.hadoop.conf.Configuration)
      : Option[(Long, Seq[Option[(Any, Any, Long)]])] =
    try {
      import scala.jdk.CollectionConverters._
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val totalRows = blocks.map(_.getRowCount).sum
        val stats = colTypes.map { case (name, dt) =>
          try {
            if (!exactStatType(dt)) throw Unusable
            val present = footer.getFileMetaData.getSchema.getFields
              .asScala.exists(_.getName.equalsIgnoreCase(name))
            if (!present) Some((null: Any, null: Any, totalRows))
            else {
              var mn: Any = null
              var mx: Any = null
              var nulls = 0L
              blocks.foreach { b =>
                val cc = b.getColumns.asScala.find(c =>
                  c.getPath.size == 1 &&
                    c.getPath.toDotString.equalsIgnoreCase(name))
                  .getOrElse(throw Unusable)
                val st = cc.getStatistics
                if (st == null || !st.isNumNullsSet) throw Unusable
                nulls += st.getNumNulls
                if (st.hasNonNullValue) {
                  val unit = timeUnitOf(cc.getPrimitiveType, dt)
                  val bMin = decode(st.genericGetMin, dt, unit)
                  val bMax = decode(st.genericGetMax, dt, unit)
                  if (mn == null || cmp(dt, bMin, mn) < 0) mn = bMin
                  if (mx == null || cmp(dt, bMax, mx) > 0) mx = bMax
                } else if (st.getNumNulls != b.getRowCount)
                  throw Unusable
              }
              Some((mn, mx, nulls))
            }
          } catch {
            case Unusable => None
          }
        }
        Some((totalRows, stats))
      } finally reader.close()
    } catch { case _: Throwable => None }

  private object Unusable
    extends Exception with scala.util.control.NoStackTrace

  /** Parquet timestamp unit multiplier → microseconds; throws
    * Unusable for INT96 / non-timestamp primitives under a
    * TimestampType column. */
  private def timeUnitOf(p: org.apache.parquet.schema.PrimitiveType,
      dt: DataType): Long = dt match {
    case TimestampType =>
      import org.apache.parquet.schema.LogicalTypeAnnotation
      p.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => 1L
            case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000L
            case _ => throw Unusable // NANOS: not exactly representable
          }
        case _ => throw Unusable // INT96 or untyped int64
      }
    case _ => 0L
  }

  /** Parquet generic stat value → the Spark EXTERNAL value of `dt`
    * (what `createDataFrame` rows carry). */
  private def decode(v: Any, dt: DataType, unitToMicros: Long): Any =
    dt match {
      case BooleanType | IntegerType | LongType | FloatType |
          DoubleType => v
      case ByteType => v.asInstanceOf[java.lang.Integer].byteValue()
      case ShortType => v.asInstanceOf[java.lang.Integer].shortValue()
      case StringType => new String(
        v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
        java.nio.charset.StandardCharsets.UTF_8)
      case DateType => java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[java.lang.Integer].longValue())
      case TimestampType =>
        val us = v.asInstanceOf[java.lang.Long].longValue() * unitToMicros
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      case _ => throw Unusable
    }

  /** Ordering of DECODED externals, matching Spark's comparison
    * semantics (UTF8 byte order for strings; floats are NaN-free here
    * by the hasNonNullValue guard). */
  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType =>
      org.apache.spark.unsafe.types.UTF8String
        .fromString(a.asInstanceOf[String])
        .compareTo(org.apache.spark.unsafe.types.UTF8String
          .fromString(b.asInstanceOf[String]))
    case BooleanType => java.lang.Boolean.compare(
      a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case ByteType | ShortType | IntegerType | LongType =>
      java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue())
    case FloatType | DoubleType =>
      java.lang.Double.compare(a.asInstanceOf[Number].doubleValue(),
        b.asInstanceOf[Number].doubleValue())
    case DateType => a.asInstanceOf[java.time.LocalDate]
      .compareTo(b.asInstanceOf[java.time.LocalDate])
    case TimestampType => a.asInstanceOf[java.time.Instant]
      .compareTo(b.asInstanceOf[java.time.Instant])
    case _ => throw Unusable
  }

  /** Files of `index` that can hold a row with `c` in [lo, hi] — the
    * survivor list a pruned scan reads. A file is skipped when its
    * interval misses the predicate's or it is all-null in `c` (a range
    * predicate never matches NULL). The collect is file-count-sized
    * metadata, same as every lakehouse driver-side pruning step. */
  def pruneBetween(index: DataFrame, c: String, lo: Any,
      hi: Any): Seq[String] =
    index.filter(col(s"max__$c") >= lit(lo) && col(s"min__$c") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Conjunctive pruning over several columns: a file survives only if
    * EVERY predicate's [lo, hi] intersects its interval — pruning power
    * multiplies across independent columns (the reason Z-order layouts
    * index several dims: each column's surviving fraction compounds). */
  def pruneBetweenAll(index: DataFrame,
      preds: Seq[(String, Any, Any)]): Seq[String] = {
    require(preds.nonEmpty, "at least one predicate")
    val cond = preds.map { case (c, lo, hi) =>
      col(s"max__$c") >= lit(lo) && col(s"min__$c") <= lit(hi)
    }.reduce(_ && _)
    index.filter(cond).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Zone-map-pruned range read: scan only surviving files, with the
    * exact predicate re-applied (pruning is a superset guarantee). */
  def readBetween(spark: SparkSession, index: DataFrame, c: String,
      lo: Any, hi: Any): DataFrame = {
    val files = pruneBetween(index, c, lo, hi)
    if (files.nonEmpty)
      spark.read.option("mergeSchema", "true").parquet(files: _*)
        .filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    else {
      // every file pruned: empty relation in the table's shape (schema
      // from any indexed file, no data read — limit(0) short-circuits)
      val any = index.select("file").limit(1).collect()
      if (any.isEmpty) throw new IllegalStateException(
        "zone map indexes no files — table is empty or index was " +
          "built over the wrong dirs")
      spark.read.parquet(any(0).getString(0)).limit(0)
    }
  }
}
