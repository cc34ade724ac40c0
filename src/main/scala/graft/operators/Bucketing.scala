package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * The reference joins its fact tables on user/order keys per query run
  * (e.g. dbt_project/models/marts/facts/fact_order_items.sql joining
  * clickstream to orders); at 100 TB every such join re-shuffles both
  * sides on every run. Bucketing is the Spark-native fix: write both
  * tables hash-bucketed (and sorted) by the join key ONCE, and every
  * subsequent equi-join on that key plans a SortMergeJoin with ZERO
  * Exchange on the bucketed sides — the shuffle is paid once at write
  * time instead of once per query.
  *
  * Scale notes:
  *  - bucket count is a layout-time decision: pick so one bucket of the
  *    BIG side fits an executor core's working set (at 100 TB / 1000
  *    buckets ≈ 100 GB per bucket — too big; thousands of buckets are
  *    normal at that scale). Both sides must use the SAME count (or a
  *    divisor, with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`)
  *    for the exchange to be elided.
  *  - `sortBy` on the bucket key additionally elides the per-task Sort
  *    when every bucket holds one file (`spark.sql.sources.v1.bucketing`
  *    reads expose the sort order).
  *  - bucketed tables are catalog tables by definition (the bucket spec
  *    lives in the metastore), hence `saveAsTable`, not `parquet(path)`.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables previously written by `writeBucketed` with the
    * same bucket count on `key`. The plan this produces is the point of
    * the operator: SortMergeJoin whose children are bare bucketed scans —
    * no ShuffleExchange on either side (asserted in BucketingSpec). */
  def cojoin(spark: SparkSession, left: String, right: String,
             key: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, Seq(key))
  }
}
