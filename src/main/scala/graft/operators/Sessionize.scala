package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization.
  *
  * The reference's sessions are producer-assigned ids rolled up by
  * min/max/count (stg_clickstream_sessions.sql:22-31, with the 30-minute
  * session cap enforced by the producer,
  * producers/linked_clickstream_order_generator.py:84,208-211). This operator
  * generalizes that: derive session ids from the event stream itself with a
  * max-gap rule, then roll up — the canonical lag + cumulative-sum idiom.
  *
  * Scale notes: one shuffle on `userCol` (window partition), then both window
  * functions and the final rollup reuse that partitioning — Catalyst plans a
  * single Exchange. Sessions never span users, so the operator parallelizes
  * per-user; skewed users (bots) are bounded by the in-partition sort only.
  */
object Sessionize {

  /** Assign `session_idx` (0-based per user) using a gap threshold. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             gapSeconds: Long, tiebreak: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tiebreak).asc)
    val newSess = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(byUser))
        > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new_sess", coalesce(newSess, lit(0)))
      .withColumn("session_idx",
        sum(col("__new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_sess")
  }

  /** Sessionize and roll up to one row per (user, session). */
  def rollup(events: DataFrame, userCol: String, tsCol: String,
             gapSeconds: Long, tiebreak: String): DataFrame =
    assign(events, userCol, tsCol, gapSeconds, tiebreak)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start_ts"),
        max(col(tsCol)).as("session_end_ts"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"))
}
