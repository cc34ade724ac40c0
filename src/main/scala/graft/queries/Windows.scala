package graft.queries

import graft.Tables
import graft.operators.{Dedup, Sessionize}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dsl._

/** Window-function catalog: keyed dedup (keep-latest / keep-first),
  * ranking, lead/lag, running frames, and gap-based sessionization
  * (SURVEY.md §2.5 W1-W3 + §2.9 ST7 generalized).
  *
  * Every window spec uses a TOTAL order (ts + unique event_id tiebreak) so
  * output is deterministic under any partitioning — the SURVEY §7.4
  * tie-risk rule. Each query costs exactly one shuffle (on the window
  * partition key); downstream rollups reuse that partitioning.
  */
object Windows {

  def all: Seq[Q] = Seq(q08DedupLatest, q09FirstTouch, q10WindowFuncs,
    q11Sessionize, q33WindowDist, q43MomGrowth)

  /** Distribution window functions — ntile quartile buckets, percent_rank
    * and cume_dist over order value within each priority class. The rank
    * fractions are ratios of exact integers ((rank-1)/(n-1), cnt≤/n) so
    * the doubles are engine-exact; the total order under each window
    * (price, then key) is what makes ntile's bucket boundaries stable.
    * One shuffle on the partition key, same as any ranking window. */
  val q33WindowDist: Q = Q("q33_window_dist", (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
      CAST(ntile(4) OVER w AS INT) AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
      ORDER BY o_totalprice ASC, o_orderkey ASC)
    ORDER BY o_orderkey"""))

  /** W1/W2: keep-latest-per-key with deterministic tiebreak. Key here is
    * (user_id, event_type) — "latest event of each type per user". */
  val q08DedupLatest: Q = Q("q08_dedup_latest", (s, d) => {
    Dedup.keepLatest(Tables.events(s, d),
      Seq("user_id", "event_type"), col("ts"), Seq(col("event_id")))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }, Some("""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT user_id, event_type, event_id, ts, value,
        row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    ORDER BY user_id, event_type"""))

  /** W3: first-touch attribution — first event per user. */
  val q09FirstTouch: Q = Q("q09_first_touch", (s, d) => {
    Dedup.keepFirst(Tables.events(s, d),
      Seq("user_id"), col("ts"), Seq(col("event_id")))
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("ts").as("first_ts"), col("event_type").as("first_event_type"))
      .orderBy(col("user_id"))
  }, Some("""
    SELECT user_id, event_id AS first_event_id, ts AS first_ts,
      event_type AS first_event_type FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS rn
      FROM events) WHERE rn = 1
    ORDER BY user_id"""))

  /** Ranking + lead/lag + running-frame aggregates in one windowed pass.
    * The running sum accumulates left-to-right within the frame on both
    * engines, so double results match bit-for-bit. */
  val q10WindowFuncs: Q = Q("q10_window_funcs", (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("user_id") < 200)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
      .withColumn("running_events",
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap_us",
        unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(w)))
      .orderBy(col("user_id"), col("rn"))
  }, Some("""
    SELECT user_id, event_id, ts, value,
      row_number() OVER w AS rn,
      lag(value, 1) OVER w AS prev_value,
      lead(event_id, 1) OVER w AS next_event_id,
      CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS running_events,
      epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
    FROM events WHERE user_id < 200
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ORDER BY user_id, rn"""))

  /** Gap-based sessionization (30-min inactivity) + per-session rollup:
    * the lag → flag → cumulative-sum idiom, then one groupBy that reuses
    * the user_id partitioning. */
  val q11Sessionize: Q = Q("q11_sessionize", (s, d) => {
    Sessionize.rollup(Tables.events(s, d), "user_id", "ts",
      gapSeconds = 1800, tiebreak = "event_id")
      .withColumn("session_idx", col("session_idx").cast("bigint"))
      .orderBy(col("user_id"), col("session_idx"))
  }, Some("""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM events),
    assigned AS (
      SELECT user_id, ts,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id
          ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_idx
      FROM flagged)
    SELECT user_id, session_idx,
      MIN(ts) AS session_start_ts,
      MAX(ts) AS session_end_ts,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM assigned GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx"""))

  /** Month-over-month growth — lag over a pre-aggregated time series.
    * The monthly rollup reduces the fact table to ~one row per month
    * BEFORE the unpartitioned window, so the "global window = single
    * task" cost applies to a vanishingly small frame at any corpus size
    * (the 100 TB rule for global windows: aggregate first, window the
    * aggregate). Growth fraction = one double division of
    * exact-decimal-derived revenues — deterministic in both engines. */
  val q43MomGrowth: Q = Q("q43_mom_growth", (s, d) => {
    val w = Window.orderBy(col("month"))
    Tables.orders(s, d)
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("revenue"))
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("mom_pct",
        when(col("prev_revenue").isNull || col("prev_revenue") === 0,
          lit(null))
          .otherwise((col("revenue") - col("prev_revenue")) /
            col("prev_revenue")))
      .orderBy(col("month"))
  }, Some(s"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        COUNT(*) AS n_orders,
        ${decSumSql("o_totalprice")} AS revenue
      FROM orders GROUP BY 1)
    SELECT month, n_orders, revenue,
      lag(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
      CASE WHEN lag(revenue, 1) OVER (ORDER BY month) IS NULL
          OR lag(revenue, 1) OVER (ORDER BY month) = 0 THEN NULL
        ELSE (revenue - lag(revenue, 1) OVER (ORDER BY month))
          / lag(revenue, 1) OVER (ORDER BY month) END AS mom_pct
    FROM monthly ORDER BY month"""))
}
