package graft.operators

import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codec for COMMIT-RECORDED per-file column statistics — the Delta
  * stats-at-write idea (each add-file action carries the file's
  * min/max/null-count JSON in the commit log) re-expressed for the
  * `filemeta` sidecar: the commit already opens every just-written
  * file's footer for its row count; for the table's declared
  * `zonemap_cols` the SAME read also harvests min/max/null-count, and
  * the rendered stats ride as one extra tab field on the file's
  * manifest line. Untouched partitions carry their lines forward with
  * zero store calls — so data-column file-skipping is ALWAYS FRESH at
  * every version, with no `build_zone_map` maintenance call and no
  * staleness window (the gap round 14 left: skipping existed only as
  * an explicitly built, aging sidecar).
  *
  * Rendering: one `col:min:max:nulls` entry per column, entries joined
  * by `/`, every value escaped with Spark's own partition-path
  * escaping ([[ExternalCatalogUtils.escapePathName]] — it escapes the
  * separators `/` and `:`, `%`, tabs and newlines, so the token can
  * never collide with the filemeta line format). A bare `%` marks a
  * NULL min/max (an all-null or absent column) — unambiguous because a
  * real `%` always escapes to `%25`. A column whose footer stats are
  * UNUSABLE (NaN-omitted float stats, legacy writers, truncation) is
  * simply ABSENT from the map: absent = no verdict = never prune, the
  * same fail-safe-KEEP rule as every other pruning layer.
  *
  * Values encode timezone-free and exactly: integral/boolean/float as
  * their canonical string (Scala's float/double `toString` is the
  * shortest round-tripping rendering), strings raw (escaped), dates as
  * epoch DAYS, timestamps as epoch MICROS — and decode straight to
  * Catalyst INTERNAL values, so the pruning layer compares them with
  * the exact semantics of the pushed predicate's own literals. */
object FileStats {

  /** One column's recorded stats: min/max in ENCODED string form
    * (None = NULL, i.e. the file is all-null or predates the column),
    * plus the exact null count. */
  final case class ColStat(min: Option[String], max: Option[String],
      nulls: Long)

  /** Column types whose commit-time footer stats are exact — the same
    * set [[ZoneMap]] trusts for its footer harvest. */
  def statType(dt: DataType): Boolean = ZoneMap.exactStatType(dt)

  /** EXTERNAL footer value (what the parquet harvest decodes to) →
    * encoded string. */
  def encodeValue(dt: DataType, v: Any): String = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType => v.toString
    case StringType => v.asInstanceOf[String]
    case DateType =>
      v.asInstanceOf[java.time.LocalDate].toEpochDay.toString
    case TimestampType =>
      val i = v.asInstanceOf[java.time.Instant]
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case other => throw new IllegalArgumentException(
      s"no stats encoding for $other")
  }

  /** Encoded string → Catalyst INTERNAL value (UTF8String for strings,
    * epoch days/micros for date/timestamp) — the form
    * `Predicate.eval` compares against pushed-literal internals. */
  def decodeValue(dt: DataType, s: String): Any = dt match {
    case BooleanType => java.lang.Boolean.valueOf(s)
    case ByteType => java.lang.Byte.valueOf(s)
    case ShortType => java.lang.Short.valueOf(s)
    case IntegerType => java.lang.Integer.valueOf(s)
    case LongType => java.lang.Long.valueOf(s)
    case FloatType => java.lang.Float.valueOf(s)
    case DoubleType => java.lang.Double.valueOf(s)
    case StringType => UTF8String.fromString(s)
    case DateType => java.lang.Integer.valueOf(s.toLong.toInt)
    case TimestampType => java.lang.Long.valueOf(s)
    case other => throw new IllegalArgumentException(
      s"no stats decoding for $other")
  }

  private val Null = "%"
  private def esc(s: String) = ExternalCatalogUtils.escapePathName(s)
  private def unesc(s: String) = ExternalCatalogUtils.unescapePathName(s)
  private def tok(v: Option[String]) = v.fold(Null)(esc)
  private def untok(s: String): Option[String] =
    if (s == Null) None else Some(unesc(s))

  /** Render a file's column stats as one separator-safe token. */
  def render(stats: Seq[(String, ColStat)]): String =
    stats.map { case (c, s) =>
      s"${esc(c)}:${tok(s.min)}:${tok(s.max)}:${s.nulls}"
    }.mkString("/")

  /** Parse a rendered token; malformed entries are dropped (stats are
    * an acceleration — a corrupt token must degrade to no-pruning,
    * never fail the read). Column names key case-insensitively at the
    * pruning layer, so the original case is preserved here. */
  def parse(s: String): Seq[(String, ColStat)] =
    s.split('/').toSeq.filter(_.nonEmpty).flatMap { e =>
      val a = e.split(':')
      if (a.length != 4) None
      else scala.util.Try(
        unesc(a(0)) -> ColStat(untok(a(1)), untok(a(2)), a(3).toLong)
      ).toOption
    }
}
