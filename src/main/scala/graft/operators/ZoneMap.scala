package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  * Stat collection is a distributed column-pruned scan (only the indexed
  * columns are read), grouped by `input_file_name` — one shuffle of
  * file-count-sized data. Footer harvesting would avoid re-reading data
  * pages entirely; the scan form is kept because it is engine-typed (no
  * per-physical-type stat decoding) and runs once per immutable file.
  */
object ZoneMap {

  /** One row per data file under `dirs`: `file`, `rows`, and
    * `min__c`/`max__c`/`nulls__c` per indexed column. Files are
    * immutable once written, so stats never go stale — an index is
    * invalidated only by its file list changing. */
  def collect(spark: SparkSession, dirs: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "index at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min__$c"), max(col(c)).as(s"max__$c"),
      sum(col(c).isNull.cast("long")).as(s"nulls__$c"))) :+
      count(lit(1)).as("rows")
    spark.read.parquet(dirs: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
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
