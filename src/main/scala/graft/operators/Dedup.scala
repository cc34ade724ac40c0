package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators.
  *
  * Semantics derive from the reference's silver-layer dedup models
  * (stg_clickstream_events.sql:8-33, stg_orders.sql:7-32 in
  * mattyg3/ecommerce_analytics_platform): `row_number() over (partition by
  * key order by recency desc) = 1`, i.e. keep-latest-per-key, with injected
  * duplicates upstream (producers/linked_clickstream_order_generator.py:366-371).
  *
  * Scale notes: `keepLatest` is a single hash-partitioned shuffle on the key
  * columns followed by an in-partition sort — the same shape Spark plans for
  * SQL `row_number`. At 100 TB the shuffle is unavoidable (dedup is a global
  * operation per key); what matters is that (a) nothing else shuffles, (b) the
  * key space is well distributed (event ids / order ids are), and (c) AQE can
  * split skewed partitions. For duplicate-FREE detection (`exactDups`) we use
  * groupBy-count which benefits from partial aggregation map-side.
  */
object Dedup {

  /** Keep exactly one row per key: the one with the greatest `recency`,
    * ties broken deterministically by `tiebreakers` (descending). */
  def keepLatest(df: DataFrame, keys: Seq[String], recency: Column,
                 tiebreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((recency.desc +: tiebreakers.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the first row per key by ascending order (first-touch
    * attribution; reference dim_session_context.sql:5-27). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Column,
                tiebreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((order.asc +: tiebreakers.map(_.asc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate groups by a set of columns (hash-groupBy). Returns one
    * row per duplicated value combination with its multiplicity. */
  def exactDups(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Drop exact duplicates on a column set, keeping the row with the
    * minimum `keeper` value (deterministic, unlike dropDuplicates). */
  def dropExact(df: DataFrame, cols: Seq[String], keeper: Column): DataFrame =
    keepFirst(df, cols, keeper)
}
