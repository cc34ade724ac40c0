package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** PER-FILE Bloom sidecar index — the point-lookup complement to
  * [[ZoneMap]]. Min/max zone maps prune range predicates, but an equality
  * probe on a HIGH-CARDINALITY column over unsorted data (order lookup by
  * key, user lookup by id, dedup probe by content hash) matches almost
  * every file's [min,max] interval, so zone maps prune nothing there.
  * A per-file Bloom filter answers "can this file contain v?" with no
  * false negatives, so a point lookup reads only the (few) files whose
  * bloom admits v — the Delta Lake / Iceberg bloom-column-index idea on
  * plain parquet, living in one small sidecar table read once per query.
  *
  * Build is a distributed column-pruned scan grouped by `input_file_name`
  * folding Spark's own native BloomFilterAggregate (the expression
  * InjectRuntimeFilter plans; mergeable, codegen'd — no UDF, same shape as
  * [[BloomDedup]]): shuffle volume is one serialized bloom per file. Files
  * are immutable once written, so the index only invalidates when the file
  * list changes — same freshness contract as ZoneMap.
  *
  * Probe cost model at 100 TB: bits sized for `fpp` (default 1%) means a
  * key-scoped lookup expects |files|·fpp false-positive opens plus the
  * true owners — vs opening every footer without the index. The pruning
  * decision runs on file-count-sized metadata on the driver, exactly like
  * every lakehouse stats-pruning step.
  */
object BloomIndex {

  /** One row per data file under `dirs`: `file`, `rows`, `bloom__c` (a
    * serialized bloom of column c) for each indexed column. NULLs are not
    * folded (an equality probe never matches NULL). */
  def collect(spark: SparkSession, dirs: Seq[String], cols: Seq[String],
      expectedItemsPerFile: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "index at least one column")
    val numBits = math.max(64L,
      math.ceil(-expectedItemsPerFile * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val aggs = cols.map { c =>
      Bridge.toColumn(new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.toExpression(col(c).cast("string")))),
        Literal(expectedItemsPerFile), Literal(numBits))
        .toAggregateExpression()).as(s"bloom__$c")
    } :+ count(lit(1)).as("rows")
    spark.read.parquet(dirs: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose bloom for `c` might contain ANY of `values` — the
    * survivor list a point lookup reads (no false negatives; false
    * positives re-filtered by the scan). Probing runs on the DRIVER over
    * the file-count-sized index (the same metadata-sized step as every
    * lakehouse stats prune): Spark's BloomFilterMightContain expression
    * requires a foldable bloom side, so per-file blooms are deserialized
    * via the public sketch API and probed with the same XxHash64(cast-
    * to-string) hashing [[collect]] folded in. A null bloom (file
    * all-NULL in `c`) can never match an equality probe and is pruned. */
  def pruneEquals(index: DataFrame, c: String, values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "probe at least one value")
    // hash through the SAME expression the build side folded —
    // XxHash64(Cast(v AS string)) evaluated by Spark, NOT JVM
    // v.toString: the two renderings differ for timestamp ('.0'
    // suffix), date, double, decimal and boolean values, and a
    // rendering mismatch is a FALSE NEGATIVE (silently dropped file)
    val tz = Option(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val hashes = values.map { v =>
      new XxHash64(Seq(org.apache.spark.sql.catalyst.expressions.Cast(
        Literal(v), org.apache.spark.sql.types.StringType, tz)))
        .eval(null).asInstanceOf[Long]
    }
    index.select(col("file"), col(s"bloom__$c")).collect().toSeq
      .filter { r =>
        !r.isNullAt(1) && {
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          hashes.exists(bf.mightContainLong)
        }
      }
      .map(_.getString(0))
  }

  /** Bloom-pruned point lookup: scan only surviving files with the exact
    * predicate re-applied. Empty survivor set short-circuits to an empty
    * relation in the table's schema. */
  def readEquals(spark: SparkSession, index: DataFrame, c: String,
      values: Seq[Any]): DataFrame = {
    val files = pruneEquals(index, c, values)
    if (files.nonEmpty)
      spark.read.option("mergeSchema", "true").parquet(files: _*)
        .filter(col(c).isin(values: _*))
    else {
      val any = index.select("file").limit(1).collect()
      if (any.isEmpty) throw new IllegalStateException(
        "bloom index holds no files — table is empty or index was built " +
          "over the wrong dirs")
      spark.read.parquet(any(0).getString(0)).limit(0)
    }
  }
}
