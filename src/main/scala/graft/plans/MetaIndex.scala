package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{PartitionSpec,
  PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan,
  ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** COMMIT-RECORDED per-file statistics (round 15, the stats-at-write
  * default): every `filemeta` ref's exact row count plus the
  * [[graft.operators.FileStats]]-rendered column stats for the
  * table's declared `zonemap_cols`, keyed by the (owner version,
  * partition dir, file name) triple the planned path renders — a
  * keying that survives scheme/authority/qualification differences by
  * construction. Maintained by every commit in the same footer read
  * that records row counts, carried forward with the manifest: always
  * fresh at every version, unlike the explicitly built sidecars.
  * `schema` supplies the column types the encoded stats decode
  * against. */
final class CommitStatsIndex(
    val byKey: Map[(Long, String, String),
      (Option[Long], Option[String])],
    val schema: StructType) {
  def colType(name: String): Option[DataType] =
    schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
}

/** What [[GraftFileIndex]] needs to FILE-SKIP on pushed predicates —
  * all of it already on disk at commit time:
  *
  *  - `partCol`/`partType`: the table's partition column; every
  *    recorded file's partition VALUE is encoded in its `__p=` path
  *    segment, so a predicate over the partition column prunes files
  *    exactly, with zero data reads (the Iceberg manifest-partition-
  *    pruning idea).
  *  - `commitStats`: the commit-recorded per-file row counts and
  *    column stats ([[CommitStatsIndex]]) — the ALWAYS-FRESH
  *    data-column skipping path, maintained by every writer with no
  *    index build.
  *  - `zoneMapDir`/`bloomDir`: the version's stats sidecars where
  *    built ([[graft.operators.ZoneMap]]/[[graft.operators.BloomIndex]]
  *    as per-version indexes) — range and equality predicates over
  *    DATA columns prune to stats survivors, the same skipping the
  *    operator API's `readWhere`/`readEquals` does, now reached
  *    through plain SQL. */
final case class FilePrune(partCol: String, partType: DataType,
    zoneMapDir: Option[String], bloomDir: Option[String],
    commitStats: Option[CommitStatsIndex] = None)

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
  * on PartitionedSnapshots), so Spark classifies every pushed
  * predicate as a DATA filter — and `listFiles` evaluates those
  * against the metadata it holds (see [[FilePrune]]):
  *
  *  1. a conjunct referencing ONLY the partition column binds against
  *     the value parsed from each file's `__p=` segment and is
  *     evaluated per DISTINCT partition value (arbitrary deterministic
  *     expressions, not just equality — `year(p) = 2024` prunes too);
  *  2. range/equality conjuncts over zone-mapped or bloom-indexed
  *     data columns prune to the sidecars' survivors.
  *
  * Pruning is fail-safe in the KEEP direction: a file is dropped only
  * when metadata POSITIVELY rejects it (a partition value that parsed
  * and evaluated false; a stats row whose interval provably misses; a
  * bloom that cannot contain the probe). Unparseable values, unknown
  * predicate shapes, non-deterministic or subquery conjuncts, and
  * files absent from a sidecar all KEEP the file — the exact predicate
  * is always re-applied by the scan above, so pruning is never a
  * semantic. Without this, a selective query over a 100k-partition
  * snapshot schedules ~100k footer reads and pays at execution time
  * the listing cost plan-from-metadata removed from planning. */
final class GraftFileIndex(spark: SparkSession, root: Path,
    files0: Seq[FileStatus], prune: Option[FilePrune] = None)
  extends PartitioningAwareFileIndex(spark, Map.empty, None)
  with PredicateHelper {

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
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression])
      : Seq[org.apache.spark.sql.execution.datasources
        .PartitionDirectory] =
    Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
      InternalRow.empty,
      pruneFiles(partitionFilters ++ dataFilters).map(f =>
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

  // ── predicate file-skipping ──────────────────────────────────────

  /** Scheme/authority-insensitive file identity: the sidecars key
    * files by `input_file_name()` (URL-encoded, `file:///…`), the
    * recorded statuses render `file:/…` — compare decoded absolute
    * paths so a rendering difference can only LOSE pruning, never a
    * file (membership is consulted in the reject direction only). */
  private def uriPath(s: String): String =
    scala.util.Try(org.apache.spark.paths.SparkPath.fromUrlString(s)
      .toPath.toUri.getPath).getOrElse(s)

  // one pruning pass per distinct filter set per plan: the scan asks
  // once for split planning (listFiles) and once for statistics
  // (prunedStats) with the same filters — the sidecar jobs and stat
  // decodes must not run twice
  private val pruneMemo = new java.util.concurrent.ConcurrentHashMap[
    Seq[Expression], Seq[FileStatus]]()

  private def pruneFiles(filters: Seq[Expression]): Seq[FileStatus] = {
    val p = prune.getOrElse(return files)
    if (filters.isEmpty || files.isEmpty) return files
    pruneMemo.computeIfAbsent(filters, { _ =>
      // only deterministic, subquery-free conjuncts participate —
      // runtime/dynamic expressions must not decide a static file list
      val conjuncts = filters.flatMap(splitConjunctivePredicates)
        .filter(e => e.deterministic &&
          e.find(_.isInstanceOf[PlanExpression[_]]).isEmpty)
      if (conjuncts.isEmpty) files
      else {
        val afterPart = prunePartitions(p, conjuncts)
        val afterStats = pruneCommitStats(p, conjuncts, afterPart)
        pruneSidecars(p, conjuncts, afterStats)
      }
    })
  }

  /** Exact byte total — and, when every survivor carries a commit-
    * recorded row count, the exact row total — of the files `filters`
    * leave planned. The row total is a SOUND UPPER BOUND for the
    * scan's cardinality under pruning (the pushed predicate still
    * filters within surviving files), which is what lets a selective
    * join broadcast where the unfiltered table would not. */
  private[graft] def prunedStats(filters: Seq[Expression])
      : (Long, Option[Long]) = {
    val survivors = pruneFiles(filters)
    val bytes = survivors.map(_.getLen).sum
    val rows = prune.flatMap(_.commitStats).flatMap { idx =>
      val counts = survivors.map(f =>
        fileKey(f).flatMap(idx.byKey.get).flatMap(_._1))
      if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
    }
    (bytes, rows)
  }

  /** STORAGE-PARTITIONED-JOIN spec: the partition column's output
    * field name, its type, and each planned file's TYPED partition
    * value (Catalyst internal; null for the default partition) keyed
    * by decoded absolute path. None when the table has no partition
    * spec, the type is timestamp (session-dependent rendering — the
    * same exclusion as partition pruning), or ANY file's value fails
    * to parse — SPJ must know every file's key or report nothing.
    * This is what lets the scan report `KeyGroupedPartitioning` and a
    * join of two co-partitioned snapshot tables skip BOTH exchanges
    * (Spark SPJ, SPARK-37375 — the Iceberg/Delta
    * `SupportsReportPartitioning` shape). */
  private[graft] lazy val spjKeysByPath
      : Option[(String, DataType, Map[String, Any])] =
    prune.flatMap { p =>
      if (p.partType == org.apache.spark.sql.types.TimestampType) None
      else {
        val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
        val cache = scala.collection.mutable
          .Map.empty[Option[String], Option[Any]]
        def parse(rendered: Option[String]): Option[Any] =
          cache.getOrElseUpdate(rendered, rendered match {
            case None => Some(null)
            case Some(s) =>
              val v = Cast(Literal(UTF8String.fromString(s), StringType),
                p.partType, tz, EvalMode.TRY).eval()
              if (v == null) None else Some(v)
          })
        val entries = files.map { f =>
          partRendered(f).flatMap(parse)
            .map(v => f.getPath.toUri.getPath -> v)
        }
        if (entries.exists(_.isEmpty)) None
        else Some((p.partCol, p.partType, entries.flatten.toMap))
      }
    }

  /** The (owner version, partition dir, file name) triple of a planned
    * path — the qualification-insensitive key [[CommitStatsIndex]]
    * records under. None for paths outside the version-dir layout
    * (which then simply never stat-prune). */
  private def fileKey(f: FileStatus): Option[(Long, String, String)] = {
    val p = f.getPath
    for {
      part <- Option(p.getParent)
      data <- Option(part.getParent) if data.getName == "data"
      vdir <- Option(data.getParent) if vdir.getName.startsWith("v")
      owner <- scala.util.Try(vdir.getName.drop(1).toLong).toOption
    } yield (owner, part.getName, p.getName)
  }

  /** Prune through the COMMIT-RECORDED per-file stats (stats-at-write,
    * see [[CommitStatsIndex]]): each translatable conjunct compiles
    * once to a Catalyst predicate over `(min, max, nulls, rows)` and
    * evaluates per file against the decoded stats — driver-side over
    * file-count metadata, zero store reads, zero Spark jobs. Reject
    * only on a POSITIVE refutation: a false OR NULL survive verdict
    * (all-null stats under a comparison never match), exactly the
    * sidecar rule; files without a key, without stats, or whose
    * column is absent from the recorded map always KEEP. */
  private def pruneCommitStats(p: FilePrune,
      conjuncts: Seq[Expression], in: Seq[FileStatus])
      : Seq[FileStatus] = {
    val idx = p.commitStats.getOrElse(return in)
    if (in.isEmpty || idx.byKey.isEmpty) return in
    import org.apache.spark.sql.types.LongType
    def minRef(dt: DataType) = BoundReference(0, dt, nullable = true)
    def maxRef(dt: DataType) = BoundReference(1, dt, nullable = true)
    val nullsRef = BoundReference(2, LongType, nullable = false)
    val rowsRef = BoundReference(3, LongType, nullable = false)
    // (lowercase column, its type, survive predicate, needs row count)
    final case class StatPred(col: String, dt: DataType,
        pred: BasePredicate, needsRows: Boolean)
    def typed(name: String, want: Option[DataType]): Option[DataType] =
      idx.colType(name).filter(dt =>
        graft.operators.FileStats.statType(dt) &&
          want.forall(_ == dt))
    val preds: Seq[StatPred] =
      conjuncts.flatMap(colLit).flatMap { case (name, op, l) =>
        typed(name, Some(l.dataType)).map { dt =>
          val e = op match {
            case "=" => And(LessThanOrEqual(minRef(dt), l),
              GreaterThanOrEqual(maxRef(dt), l))
            case ">" => GreaterThan(maxRef(dt), l)
            case ">=" => GreaterThanOrEqual(maxRef(dt), l)
            case "<" => LessThan(minRef(dt), l)
            case "<=" => LessThanOrEqual(minRef(dt), l)
          }
          StatPred(name.toLowerCase, dt, Predicate.create(e),
            needsRows = false)
        }
      } ++ nullChecksOf(conjuncts).flatMap { case (name, isNull) =>
        typed(name, None).map { dt =>
          val e =
            if (isNull) GreaterThan(nullsRef, Literal(0L))
            else GreaterThan(rowsRef, nullsRef)
          StatPred(name.toLowerCase, dt, Predicate.create(e),
            needsRows = !isNull)
        }
      } ++ conjuncts.flatMap(inList).flatMap { case (name, lits) =>
        // NULL literals never match equality and drop out; remaining
        // literals must ALL type-match (testing a subset of the IN
        // values could wrongly reject a file holding an untested one)
        val nonNull = lits.filter(_.value != null)
        typed(name, None).filter(dt => nonNull.nonEmpty &&
          nonNull.forall(_.dataType == dt)).map { dt =>
          val e = nonNull.map(l =>
            And(LessThanOrEqual(minRef(dt), l),
              GreaterThanOrEqual(maxRef(dt), l)): Expression)
            .reduce(Or(_, _))
          StatPred(name.toLowerCase, dt, Predicate.create(e),
            needsRows = false)
        }
      } ++ prefixesOf(conjuncts).flatMap { case (name, lo, hiExcl) =>
        typed(name, Some(StringType)).map { dt =>
          val e = And(
            GreaterThanOrEqual(maxRef(dt),
              Literal(UTF8String.fromString(lo), StringType)),
            LessThan(minRef(dt),
              Literal(UTF8String.fromString(hiExcl), StringType)))
          StatPred(name.toLowerCase, dt, Predicate.create(e),
            needsRows = false)
        }
      }
    if (preds.isEmpty) return in
    in.filter { f =>
      fileKey(f).flatMap(idx.byKey.get) match {
        case Some((rowsOpt, Some(raw))) =>
          val stats = graft.operators.FileStats.parse(raw)
            .map { case (c, st) => c.toLowerCase -> st }.toMap
          preds.forall { sp =>
            stats.get(sp.col) match {
              case None => true // no recorded stats: keep
              case Some(st) if sp.needsRows && rowsOpt.isEmpty => true
              case Some(st) => scala.util.Try {
                val mn = st.min.map(graft.operators.FileStats
                  .decodeValue(sp.dt, _)).orNull
                val mx = st.max.map(graft.operators.FileStats
                  .decodeValue(sp.dt, _)).orNull
                // a NULL survive verdict unboxes to false — the sound
                // reject for all-null stats under a comparison
                sp.pred.eval(InternalRow(mn, mx, st.nulls,
                  rowsOpt.getOrElse(0L)))
              }.getOrElse(true) // corrupt token: keep
            }
          }
        case _ => true
      }
    }
  }

  private def nullChecksOf(conjuncts: Seq[Expression])
      : Seq[(String, Boolean)] = conjuncts.flatMap {
    case IsNull(a: AttributeReference) => Some((a.name, true))
    case IsNotNull(a: AttributeReference) => Some((a.name, false))
    case _ => None
  }

  /** LIKE 'p%' (StartsWith): every match s satisfies p <= s < p' where
    * p' increments the prefix's last character — sound in UTF8String
    * byte order only for pure-ASCII prefixes (non-ASCII last bytes
    * don't align with character increments), so others simply don't
    * prune. */
  private def prefixesOf(conjuncts: Seq[Expression])
      : Seq[(String, String, String)] = conjuncts.flatMap {
    case StartsWith(a: AttributeReference, Literal(v, StringType))
        if v != null =>
      val p = v.toString
      if (p.nonEmpty && p.forall(c => c >= ' ' && c < 0x7f))
        Some((a.name, p, p.init + (p.last + 1).toChar))
      else None
    case _ => None
  }

  /** The rendered partition value of a file's `__p=` dir segment:
    * None = not a partition-shaped path (keep, never prune). */
  private def partRendered(f: FileStatus): Option[Option[String]] = {
    val dir = f.getPath.getParent.getName
    if (!dir.startsWith("__p=")) None
    else {
      val raw = dir.stripPrefix("__p=")
      if (raw == "__HIVE_DEFAULT_PARTITION__") Some(None)
      else Some(Some(ExternalCatalogUtils.unescapePathName(raw)))
    }
  }

  private def prunePartitions(p: FilePrune,
      conjuncts: Seq[Expression]): Seq[FileStatus] = {
    // a TimestampType partition value renders through the WRITER's
    // session timezone; parsing it back under a different reader
    // timezone would shift the instant and could wrongly prune a
    // matching file — session-dependent renderings must not decide a
    // static file list (timestamp partition keys are outside the
    // manifest-addressing contract anyway; date/string/numeric
    // renderings are timezone-free and prune normally)
    if (p.partType == org.apache.spark.sql.types.TimestampType)
      return files
    val partConjs = conjuncts.filter(e => e.references.nonEmpty &&
      e.references.forall(_.name.equalsIgnoreCase(p.partCol)))
    if (partConjs.isEmpty) return files
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    val preds = partConjs.map { e =>
      Predicate.create(e.transform {
        case a: AttributeReference
            if a.name.equalsIgnoreCase(p.partCol) =>
          BoundReference(0, p.partType, nullable = true)
      })
    }
    // evaluate once per DISTINCT partition value, not per file; a
    // value that fails to parse back into the column type keeps its
    // files (can only happen to hand-laid-out data — rendered values
    // round-trip by construction)
    def keepValue(rendered: Option[String]): Boolean = rendered match {
      case None => preds.forall(_.eval(InternalRow(null)))
      case Some(s) =>
        val v = Cast(Literal(UTF8String.fromString(s), StringType),
          p.partType, tz, EvalMode.TRY).eval()
        if (v == null) true // parse failure — keep
        else preds.forall(_.eval(InternalRow(v)))
    }
    val verdict =
      scala.collection.mutable.Map.empty[Option[String], Boolean]
    files.filter(f => partRendered(f).forall(r =>
      verdict.getOrElseUpdate(r, keepValue(r))))
  }

  /** Literal probe value of an equality/comparison conjunct on column
    * `c` (attribute on either side), as (exact attr name, operator
    * tag, literal). */
  private def colLit(e: Expression)
      : Option[(String, String, Literal)] = e match {
    case EqualTo(a: AttributeReference, l: Literal) => Some((a.name, "=", l))
    case EqualTo(l: Literal, a: AttributeReference) => Some((a.name, "=", l))
    case GreaterThan(a: AttributeReference, l: Literal) => Some((a.name, ">", l))
    case GreaterThan(l: Literal, a: AttributeReference) => Some((a.name, "<", l))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => Some((a.name, ">=", l))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => Some((a.name, "<=", l))
    case LessThan(a: AttributeReference, l: Literal) => Some((a.name, "<", l))
    case LessThan(l: Literal, a: AttributeReference) => Some((a.name, ">", l))
    case LessThanOrEqual(a: AttributeReference, l: Literal) => Some((a.name, "<=", l))
    case LessThanOrEqual(l: Literal, a: AttributeReference) => Some((a.name, ">=", l))
    case _ => None
  }

  private def inList(e: Expression)
      : Option[(String, Seq[Literal])] = e match {
    case In(a: AttributeReference, vs)
        if vs.forall(_.isInstanceOf[Literal]) =>
      Some((a.name, vs.map(_.asInstanceOf[Literal])))
    case InSet(a: AttributeReference, vs) =>
      Some((a.name, vs.toSeq.map(Literal(_, a.dataType))))
    case _ => None
  }

  // sidecar indexes load lazily (the stats rows materialize only when
  // a conjunct can actually use them), once per planned scan, and
  // through the process-wide [[SidecarCache]] — repeated point
  // queries against the same (table, version) re-evaluate verdicts
  // over driver-cached rows instead of re-reading the sidecar parquet
  // per plan
  private lazy val zoneIdx = prune.flatMap(_.zoneMapDir).map(d =>
    SidecarCache.load(spark, d))
  private lazy val bloomIdxDf = prune.flatMap(_.bloomDir).map(d =>
    SidecarCache.load(spark, d))
  private def statCols(df: org.apache.spark.sql.DataFrame,
      prefix: String): Map[String, String] =
    df.schema.fieldNames.filter(_.startsWith(prefix))
      .map(c => c.stripPrefix(prefix).toLowerCase -> c.stripPrefix(prefix))
      .toMap

  private def pruneSidecars(p: FilePrune, conjuncts: Seq[Expression],
      in: Seq[FileStatus]): Seq[FileStatus] = {
    if (in.isEmpty) return in
    var rejected = Set.empty[String]
    // zone map: min/max/null-count intervals per file — one survive
    // condition per translatable conjunct, evaluated BY SPARK over the
    // index rows (no driver-side cross-type value comparison)
    if (p.zoneMapDir.isDefined) {
      val cmps = conjuncts.flatMap(colLit)
      val nullChecks = nullChecksOf(conjuncts)
      val prefixes = prefixesOf(conjuncts)
      val ins = conjuncts.flatMap(inList)
      if (cmps.nonEmpty || nullChecks.nonEmpty || ins.nonEmpty ||
          prefixes.nonEmpty)
        zoneIdx.foreach { idx =>
        val mapped = statCols(idx, "min__")
        def stat(kind: String, c: String) = col(kind + "__" + c)
        val survives = cmps.flatMap { case (name, op, l) =>
          mapped.get(name.toLowerCase).map { c =>
            val v = Bridge.toColumn(l)
            op match {
              case "=" => stat("min", c) <= v && stat("max", c) >= v
              case ">" => stat("max", c) > v
              case ">=" => stat("max", c) >= v
              case "<" => stat("min", c) < v
              case "<=" => stat("min", c) <= v
            }
          }
        } ++ nullChecks.flatMap { case (name, isNull) =>
          mapped.get(name.toLowerCase).map { c =>
            if (isNull) stat("nulls", c) > lit(0L)
            else col("rows") > stat("nulls", c)
          }
        } ++ ins.flatMap { case (name, lits) =>
          mapped.get(name.toLowerCase).map { c =>
            lits.map(l => stat("min", c) <= Bridge.toColumn(l) &&
              stat("max", c) >= Bridge.toColumn(l))
              .reduce(_ || _)
          }
        } ++ prefixes.flatMap { case (name, lo, hiExcl) =>
          mapped.get(name.toLowerCase).map { c =>
            stat("max", c) >= lit(lo) && stat("min", c) < lit(hiExcl)
          }
        }
        if (survives.nonEmpty) {
          // reject = the index POSITIVELY refutes every-row-match; a
          // NULL survive verdict (all-null stats under a comparison)
          // is a refutation too — comparisons never match NULL
          val rej = not(coalesce(survives.reduce(_ && _), lit(false)))
          rejected ++= idx.filter(rej).select("file").collect()
            .map(r => uriPath(r.getString(0)))
        }
      }
    }
    // bloom: equality probes on high-cardinality columns — no false
    // negatives, so a non-surviving indexed file is a positive reject
    if (p.bloomDir.isDefined) {
      val eqs = (conjuncts.flatMap(e => colLit(e).collect {
        case (n, "=", l) if l.value != null => (n, Seq(l))
      }) ++ conjuncts.flatMap(inList).map { case (n, ls) =>
        (n, ls.filter(_.value != null))
      }).filter(_._2.nonEmpty)
      if (eqs.nonEmpty) bloomIdxDf.foreach { idx =>
        val mapped = statCols(idx, "bloom__")
        eqs.foreach { case (name, lits) =>
          mapped.get(name.toLowerCase).foreach { c =>
            val values = lits.map(l =>
              org.apache.spark.sql.catalyst.CatalystTypeConverters
                .convertToScala(l.value, l.dataType))
            val survivors = graft.operators.BloomIndex
              .pruneEquals(idx, c, values).map(uriPath).toSet
            rejected ++= idx.select("file").collect()
              .map(r => uriPath(r.getString(0)))
              .filterNot(survivors)
          }
        }
      }
    }
    if (rejected.isEmpty) in
    else in.filterNot(f => rejected(f.getPath.toUri.getPath))
  }
}

/** Process-wide cache of LOADED zone-map/bloom sidecars keyed by
  * (dir, `_SUCCESS` mtime, Σ file bytes, file count). A published
  * sidecar dir is immutable — a rebuild at the same version rewrites
  * the dir and lands a new `_SUCCESS` mtime, which misses the cache
  * by key — so repeated plans of the same (table, version) evaluate
  * their pruning verdicts over driver-cached rows (a local relation)
  * instead of re-reading the sidecar parquet per plan: the dashboard
  * firing hundreds of point queries per minute at a 100k-file table
  * pays one sidecar read, then one metadata probe (the listStatus)
  * per plan. The bytes/count key components guard coarse mtime
  * granularity (object stores truncate to seconds — a same-granule
  * rebuild, plausible for the streaming sink's per-batch zone-map
  * extension, would otherwise serve stale rows); they come from the
  * SAME listStatus probe the mtime does, so the strengthening costs
  * nothing. Bounded two ways: a sidecar over [[MaxEntryBytes]] on
  * disk is served uncached (bloom blobs at extreme file counts must
  * not pin driver memory), and past [[MaxEntries]] the
  * LEAST-RECENTLY-USED entry is dropped — not the whole map, so a
  * 17-table dashboard round-robins at 16/17 hit rate instead of 0.
  * Fail-safe: any probe error degrades to the uncached read, never
  * to a plan failure. */
private[graft] object SidecarCache {
  private val MaxEntries = 16
  private val MaxEntryBytes = 64L * 1024 * 1024
  private type Key = (String, Long, Long, Int)
  private type Entry = (StructType, Array[org.apache.spark.sql.Row])
  // access-ordered LinkedHashMap: get() refreshes recency, insert past
  // the bound evicts exactly the eldest. All access synchronized — the
  // driver plans concurrently but entries are metadata-sized.
  private val cache = new java.util.LinkedHashMap[Key, Entry](
      MaxEntries + 1, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Key, Entry]): Boolean = size > MaxEntries
  }
  // observability: specs pin the second-plan-is-free contract on
  // these, and a load storm (every plan missing) is visible
  private[graft] val loads = new java.util.concurrent.atomic.AtomicLong
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong

  private def local(spark: SparkSession,
      e: (StructType, Array[org.apache.spark.sql.Row]))
      : org.apache.spark.sql.DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(e._2: _*), e._1)

  def load(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val key: Option[Key] = scala.util.Try {
      val path = new Path(dir)
      val fs = path.getFileSystem(
        spark.sessionState.newHadoopConf())
      val st = fs.listStatus(path)
      val mtime = st.collectFirst {
        case s if s.getPath.getName == "_SUCCESS" =>
          s.getModificationTime
      }
      val files = st.filterNot(_.isDirectory)
      val bytes = files.map(_.getLen).sum
      mtime.filter(_ => bytes <= MaxEntryBytes)
        .map(m => (dir, m, bytes, files.length))
    }.toOption.flatten
    key match {
      case None =>
        loads.incrementAndGet()
        spark.read.parquet(dir)
      case Some(k) =>
        val cached = cache.synchronized(Option(cache.get(k)))
        cached match {
          case Some(e) =>
            hits.incrementAndGet()
            local(spark, e)
          case None =>
            loads.incrementAndGet()
            val df = spark.read.parquet(dir)
            val entry = (df.schema, df.collect())
            cache.synchronized(cache.put(k, entry))
            local(spark, entry)
        }
    }
  }

  private[graft] def entryCount: Int = cache.synchronized(cache.size)
}

/** [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]]
  * that reports the commit-recorded EXACT row count through
  * `SupportsReportStatistics`. The filemeta sidecar records per-file
  * rows at commit (footer reads of just-written files), so an
  * unfiltered scan's `numRows` is exact — CBO/AQE get true
  * cardinality instead of deriving it from size heuristics. Once a
  * filter or aggregate is pushed, cardinality is no longer the
  * table's: fall back to the inherited estimate (exact sizeInBytes,
  * unknown rows) rather than overstate. Column pruning does not
  * change cardinality, so a pruned projection keeps the exact count. */
final class StatParquetScan(base: ParquetScan,
    val rowCount: Option[Long])
  extends ParquetScan(base.sparkSession, base.hadoopConf,
    base.fileIndex, base.dataSchema, base.readDataSchema,
    base.readPartitionSchema, base.pushedFilters,
    StatParquetScan.markOptions(base.options, rowCount),
    base.pushedAggregate, base.partitionFilters, base.dataFilters,
    base.pushedVariantExtractions)
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // Scan DEDUPLICATION could otherwise substitute a plain ParquetScan
  // with identical fields for this one, silently dropping the exact
  // statistic — and ParquetScan.equals pattern-matches on `case p:
  // ParquetScan` (no canEqual), so overriding equals HERE only closes
  // one direction: `plainScan.equals(statScan)` would still compare
  // true. The structural fix is the [[StatParquetScan.markOptions]]
  // marker: the row count rides in `options`, a field ParquetScan's
  // own equals compares, so an independently-built stat-less scan is
  // unequal in BOTH directions and two stat scans are equal exactly
  // when their recorded counts agree. The overrides below keep the
  // contract explicit (and cover rowCount directly).
  override def equals(other: Any): Boolean = other match {
    case s: StatParquetScan => super.equals(s) && rowCount == s.rowCount
    case _ => false
  }
  override def hashCode(): Int =
    31 * super.hashCode() + rowCount.hashCode()

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val inherited = super.estimateStatistics()
    if (pushedAggregate.isDefined) inherited
    else if (dataFilters.isEmpty && partitionFilters.isEmpty)
      rowCount.fold(inherited)(n =>
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            inherited.sizeInBytes()
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.of(n)
        })
    else fileIndex match {
      // FILTERED scan (round 15): the pruned file list's recorded
      // stats give a SOUND UPPER BOUND — Σ surviving files' exact
      // rows, and their exact bytes scaled by the same read-schema /
      // compression factors FileScan applies to the unpruned index.
      // An upper bound beats unknown for AQE: a selective point query
      // against a large table now broadcasts where the unfiltered
      // cardinality would have forced a shuffle join.
      case g: GraftFileIndex =>
        val (bytes, rows) = g.prunedStats(
          partitionFilters ++ dataFilters)
        val conf = sparkSession.sessionState.conf
        val scaled = (conf.fileCompressionFactor * bytes /
          math.max(1, dataSchema.defaultSize) *
          math.max(1, readDataSchema.defaultSize)).toLong
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(scaled)
          override def numRows(): java.util.OptionalLong =
            rows.fold(java.util.OptionalLong.empty())(
              java.util.OptionalLong.of)
        }
      case _ => inherited
    }
  }

  // ── storage-partitioned joins (Spark SPJ, SPARK-37375) ───────────
  //
  // The manifest knows every file's partition value; grouping the
  // planned files by it and reporting KeyGroupedPartitioning over the
  // partition column lets a join between two snapshot tables
  // co-partitioned on that column drop BOTH ShuffleExchanges — at
  // fact-fact scale the single largest avoidable exchange on the SQL
  // door. TWO gates: spark.sql.sources.v2.bucketing.enabled (Spark's
  // own switch — default TRUE in Spark 4) AND graft's
  // preserve-data-grouping session conf (default FALSE) — the same
  // split Iceberg ships (`preserve-data-grouping`), because grouping
  // trades split packing for key alignment: one input partition per
  // partition VALUE, so a 10 GB partition becomes ONE task. That is
  // the right trade exactly when a join/aggregation consumes the
  // clustering, and the wrong one for every plain scan — a
  // data-shape-dependent choice the USER makes per session, not a
  // default that throttles a 100 TB table's scan parallelism.
  private def spjEnabled: Boolean = {
    val conf = sparkSession.sessionState.conf
    conf.v2BucketingEnabled && pushedAggregate.isEmpty &&
      conf.getConfString(StatParquetScan.PreserveGroupingKey, "false")
        .equalsIgnoreCase("true")
  }

  private lazy val spjGroups: Option[(String,
      Array[org.apache.spark.sql.connector.read.InputPartition])] = {
    if (!spjEnabled) None
    else fileIndex match {
      case g: GraftFileIndex => g.spjKeysByPath.flatMap {
        case (colName, _, byPath) =>
          // the key expression resolves against the scan OUTPUT — the
          // partition column must survive column pruning (a query not
          // reading it gets no grouping, correctly)
          val outName = readDataSchema.fields
            .find(_.name.equalsIgnoreCase(colName)).map(_.name)
          outName.flatMap { name =>
            val fps = super.planInputPartitions()
            val files =
              if (fps.forall(_.isInstanceOf[org.apache.spark.sql
                .execution.datasources.FilePartition]))
                Some(fps.flatMap(_.asInstanceOf[org.apache.spark.sql
                  .execution.datasources.FilePartition].files))
              else None
            def pathOf(pf: org.apache.spark.sql.execution
                .datasources.PartitionedFile): Option[String] =
              scala.util.Try(pf.filePath.toPath.toUri.getPath).toOption
            val keyed = files.map(_.map(pf =>
              pathOf(pf).flatMap(byPath.get).map(_ -> pf)))
            if (keyed.isEmpty || keyed.get.exists(_.isEmpty)) None
            else {
              val pairs = keyed.get
              // deterministic group order (insertion-ordered); Spark
              // sorts groups by key internally where SPJ requires it
              val grouped = scala.collection.mutable
                .LinkedHashMap.empty[Any, scala.collection.mutable
                  .ArrayBuffer[org.apache.spark.sql.execution
                    .datasources.PartitionedFile]]
              pairs.flatten.foreach { case (k, pf) =>
                grouped.getOrElseUpdate(k,
                  scala.collection.mutable.ArrayBuffer.empty) += pf
              }
              Some((name, grouped.zipWithIndex.map {
                case ((k, pfs), i) =>
                  new KeyedFilePartition(i, pfs.toArray,
                    InternalRow(k))
                    : org.apache.spark.sql.connector.read.InputPartition
              }.toArray))
            }
          }
      }
      case _ => None
    }
  }

  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    spjGroups.fold(super.planInputPartitions())(_._2)

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjGroups match {
      case Some((name, parts)) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(org.apache.spark.sql.connector.expressions
              .Expressions.identity(name)), parts.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }
}

object StatParquetScan {
  /** Session conf that turns on partition-preserving scan grouping
    * (storage-partitioned joins). Mirrors Iceberg's
    * `preserve-data-grouping`: set it for join-heavy co-partitioned
    * workloads; leave it off (the default) where plain-scan
    * parallelism matters more than exchange elimination. */
  val PreserveGroupingKey = "spark.graft.spj.preserveDataGrouping"

  /** The options key carrying the commit-recorded row count. Unknown
    * keys are inert to the parquet reader; the POINT is that `options`
    * is a field `ParquetScan.equals` compares, which makes scan-dedup
    * equality see the statistic from either side of the comparison
    * (see the class-level equality note). */
  private[plans] val RowCountOptionKey = "graft.commit-row-count"

  private[plans] def markOptions(base: CaseInsensitiveStringMap,
      rowCount: Option[Long]): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](base.asCaseSensitiveMap())
    m.put(RowCountOptionKey, rowCount.fold("unknown")(_.toString))
    new CaseInsensitiveStringMap(m)
  }
}

/** A [[org.apache.spark.sql.execution.datasources.FilePartition]]
  * that knows its partition-key row — the `HasPartitionKey` contract
  * Spark's key-grouped scan requires of every input partition. All
  * rows in these files carry exactly this key (each file holds one
  * `__p` value by the writer's layout). */
final class KeyedFilePartition(idx: Int,
    fs: Array[org.apache.spark.sql.execution.datasources
      .PartitionedFile], key: InternalRow)
  extends org.apache.spark.sql.execution.datasources
    .FilePartition(idx, fs)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** ParquetScanBuilder whose built scan carries the recorded row count
  * and the SPJ partitioning report (see [[StatParquetScan]]); all
  * pushdown state accumulates in the inherited builder and transfers
  * through `super.build()`. */
final class StatScanBuilder(spark: SparkSession,
    fileIndex: org.apache.spark.sql.execution.datasources
      .PartitioningAwareFileIndex,
    schema: StructType, dataSchema: StructType,
    options: CaseInsensitiveStringMap, rowCount: Option[Long])
  extends ParquetScanBuilder(spark, fileIndex, schema, dataSchema,
    options) {

  override def build(): ParquetScan =
    new StatParquetScan(super.build(), rowCount)
}

/** DSv2 parquet table whose scan plans from a [[GraftFileIndex]] and
  * whose schema is the commit-recorded one — the SQL catalog's
  * plan-from-metadata path: `SELECT` over a 100k-partition snapshot
  * costs one filemeta parse instead of 100k dir listings plus footer
  * schema inference, a pushed predicate file-skips through the same
  * index, and the recorded row count surfaces as exact Catalyst
  * statistics. Everything else (ParquetScanBuilder's filter pushdown,
  * column pruning, vectorized read) is inherited unchanged. */
final class IndexedParquetTable(name: String, spark: SparkSession,
    options: CaseInsensitiveStringMap, tableRoot: String,
    tableSchema: StructType, files: Seq[FileStatus],
    prune: Option[FilePrune] = None,
    rowCount: Option[Long] = None)
  extends ParquetTable(name, spark, options, Seq(tableRoot),
    Some(tableSchema), classOf[ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new GraftFileIndex(spark, new Path(tableRoot), files, prune)

  override def newScanBuilder(params: CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetScanBuilder = {
    val b = super.newScanBuilder(params)
    new StatScanBuilder(b.sparkSession, b.fileIndex, b.schema,
      b.dataSchema, b.options, rowCount)
  }
}
