package graft.etl

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's dbt model DAG (dbt_project/models/ in
  * mattyg3/ecommerce_analytics_platform), re-expressed as pure
  * `DataFrame => DataFrame` transforms: staging (silver) → facts/dims →
  * metrics (gold). Model-for-model citations inline. Reference bugs fixed
  * per SURVEY §2.12: funnel matches the real `view_product` event type
  * (not the never-emitted `product_view`), `>=` lookback comparators.
  *
  * Scale posture: every model pre-aggregates before joining (A2 before J1
  * etc.), dims broadcast, facts partition naturally by date columns.
  */
object ReferenceModels {

  private val dec = DecimalType(18, 4)

  /** stg_clickstream_events.sql:8-49 — keep-latest dedup by event_id,
    * null-time rejection, upper(country), event_date.
    * (user_agent deliberately dropped, §2.12 item 5; source_system kept
    * like the reference, null when the bronze fixture lacks it.) */
  def stgClickstreamEvents(bronzeEvents: DataFrame): DataFrame = {
    val srcSystem =
      if (bronzeEvents.columns.contains("source_system")) col("source_system")
      else lit(null).cast("string")
    Dedup.keepLatest(
      bronzeEvents.filter(col("event_time").isNotNull),
      Seq("event_id"), col("pipeline_ingested_at"), Seq(col("batch_id")))
      .select(col("event_id"), col("event_type"), col("version"),
        col("user_id"), col("session_id"), col("product_id"),
        col("event_time"), col("event_time").cast("date").as("event_date"),
        upper(col("country")).as("country"), col("device"),
        col("referrer"), srcSystem.as("source_system"),
        col("experiment_id"), col("pipeline_ingested_at"))
  }

  /** stg_clickstream_sessions.sql:22-40 — A1 session rollup with epoch
    * duration. */
  def stgClickstreamSessions(stgEvents: DataFrame): DataFrame =
    stgEvents.groupBy(col("session_id"), col("user_id"))
      .agg(min(col("event_time")).as("session_start_ts"),
        max(col("event_time")).as("session_end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("session_duration_s",
        unix_timestamp(col("session_end_ts")) -
          unix_timestamp(col("session_start_ts")))

  /** stg_orders.sql:7-52 — keep-latest dedup by order_id + per-row array
    * aggregates over items (A16: size + higher-order aggregate, the
    * no-explode idiom). */
  def stgOrders(bronzeOrders: DataFrame): DataFrame =
    Dedup.keepLatest(
      bronzeOrders.filter(col("order_time").isNotNull),
      Seq("order_id"), col("pipeline_ingested_at"), Seq(col("batch_id")))
      .withColumn("item_count", size(col("items")))
      .withColumn("order_total_amount",
        aggregate(col("items"), lit(0).cast(dec),
          (acc, x) => (acc + x.getField("quantity").cast(dec) *
            x.getField("price").cast(dec)).cast(dec))
          .cast("double"))
      .withColumn("order_date", col("order_time").cast("date"))

  /** stg_order_items.sql:7-18 — G1/J10 lateral explode of the items array
    * with parent columns retained. */
  def stgOrderItems(stgOrders: DataFrame): DataFrame =
    stgOrders.select(col("order_id"), col("session_id"), col("user_id"),
        col("order_time"), col("order_date"), col("order_status"),
        posexplode(col("items")).as(Seq("line_number", "item")))
      .select(col("order_id"), col("session_id"), col("user_id"),
        col("order_time"), col("order_date"), col("order_status"),
        col("line_number"),
        col("item.product_id").as("product_id"),
        col("item.quantity").as("quantity"),
        col("item.price").as("price"),
        (col("item.quantity").cast(dec) * col("item.price").cast(dec))
          .cast("double").as("line_amount"))

  /** fact_events.sql:9-22 — incremental pass-through projection of
    * staging, partitioned by event_date (partition_by config :5); the
    * 1-day delete+insert materialization is `Incremental.upsertPartitioned`
    * at the pipeline layer — the model itself is the SELECT shape. */
  def factEvents(stgEvents: DataFrame): DataFrame =
    stgEvents.select(col("event_id"), col("event_time").as("event_ts"),
      col("event_date"), col("event_type"), col("user_id"),
      col("session_id"), col("product_id"), col("country"), col("device"),
      col("referrer"), col("source_system"), col("experiment_id"))

  /** fact_orders.sql:8-19 — order-grain projection with order_date. */
  def factOrders(stgOrders: DataFrame): DataFrame =
    stgOrders.select(col("order_id"), col("user_id"), col("session_id"),
      col("order_time").as("order_ts"), col("order_date"),
      col("order_status"), col("item_count"), col("order_total_amount"))

  /** fact_order_items.sql:8-19 — line-item-grain projection,
    * unique_key (order_id, product_id). */
  def factOrderItems(stgOrderItems: DataFrame): DataFrame =
    stgOrderItems.select(col("order_id"), col("product_id"), col("user_id"),
      col("session_id"), col("quantity"), col("price"), col("line_amount"),
      col("order_time").as("order_ts"), col("order_date"))

  /** dim_session_context.sql:5-27 — W3 first-event-per-session
    * attribution (row_number asc, rn = 1) over fact_events. */
  def dimSessionContext(factEvents: DataFrame): DataFrame =
    Dedup.keepFirst(
      factEvents.filter(col("session_id").isNotNull),
      Seq("session_id"), col("event_ts"), Seq(col("event_id")))
      .select(col("session_id"), col("country"), col("device"),
        col("referrer"), col("source_system"))

  /** fact_sessions.sql:25-48 — J1 left join of sessions to a per-session
    * order rollup (A2), coalesce defaults, has_order flag (P10/P11). */
  def factSessions(stgSessions: DataFrame, stgOrders: DataFrame): DataFrame = {
    val perSession = stgOrders.groupBy(col("session_id"))
      .agg(countDistinct(col("order_id")).as("n_orders_raw"),
        sum(col("order_total_amount").cast(dec)).cast("double")
          .as("order_amount_raw"))
    stgSessions.join(perSession, Seq("session_id"), "left")
      .withColumn("n_orders", coalesce(col("n_orders_raw"), lit(0L)))
      .withColumn("order_amount", coalesce(col("order_amount_raw"), lit(0.0)))
      .withColumn("has_order", col("n_orders") > 0)
      .withColumn("session_date", col("session_start_ts").cast("date"))
      .drop("n_orders_raw", "order_amount_raw")
  }

  /** dim_users.sql:5-35 — user event lifecycle ⟕ order lifecycle (J2). */
  def dimUsers(stgEvents: DataFrame, stgOrders: DataFrame): DataFrame = {
    val ev = stgEvents.groupBy(col("user_id"))
      .agg(min(col("event_time")).as("first_seen_ts"),
        max(col("event_time")).as("last_seen_ts"))
    val ord = stgOrders.groupBy(col("user_id"))
      .agg(min(col("order_time")).as("first_order_ts"),
        countDistinct(col("order_id")).as("lifetime_orders"),
        sum(col("order_total_amount").cast(dec)).cast("double")
          .as("lifetime_value"))
    ev.join(ord, Seq("user_id"), "left")
      .withColumn("lifetime_orders", coalesce(col("lifetime_orders"), lit(0L)))
      .withColumn("lifetime_value", coalesce(col("lifetime_value"), lit(0.0)))
  }

  /** dim_products.sql:5-13 — product sales totals (A5). */
  def dimProducts(stgOrderItems: DataFrame): DataFrame =
    stgOrderItems.filter(col("product_id").isNotNull)
      .groupBy(col("product_id"))
      .agg(min(col("order_time")).as("first_sold_ts"),
        sum(col("quantity")).cast("bigint").as("total_units"),
        sum(col("line_amount").cast(dec)).cast("double").as("total_amount"))

  /** dim_date.sql:5-30 — A6 bounds + G2 generate_series spine with
    * calendar attributes. */
  def dimDate(stgEvents: DataFrame): DataFrame =
    stgEvents.agg(min(col("event_date")).as("lo"),
        max(col("event_date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("date"))
      .select(col("date"), year(col("date")).as("year"),
        quarter(col("date")).as("quarter"), month(col("date")).as("month"),
        dayofmonth(col("date")).as("day_of_month"),
        dayofweek(col("date")).as("day_of_week"),
        dayofweek(col("date")).isin(1, 7).as("is_weekend"))

  /** metrics_daily_kpis.sql:5-57 — date spine ⟕ daily sessions ⟕ daily
    * orders ⟕ converting sessions (J3/J4, A7-A9), guarded rates. */
  def metricsDailyKpis(factSessions: DataFrame, stgOrders: DataFrame,
      dimDate: DataFrame): DataFrame = {
    val daily = factSessions.groupBy(col("session_date").as("date"))
      .agg(count(lit(1)).as("sessions"),
        countDistinct(col("user_id")).as("dau"))
    val orders = stgOrders
      .filter(col("order_status") === "completed")
      .groupBy(col("order_date").as("date"))
      .agg(countDistinct(col("order_id")).as("orders"),
        sum(col("order_total_amount").cast(dec)).cast("double")
          .as("revenue"))
    val converting = factSessions.filter(col("has_order"))
      .groupBy(col("session_date").as("date"))
      .agg(countDistinct(col("session_id")).as("converting_sessions"))
    dimDate.select(col("date"))
      .join(daily, Seq("date"), "left")
      .join(orders, Seq("date"), "left")
      .join(converting, Seq("date"), "left")
      .select(col("date"),
        coalesce(col("sessions"), lit(0L)).as("sessions"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("orders"), lit(0L)).as("orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("converting_sessions"), lit(0L))
          .as("converting_sessions"))
      .withColumn("aov", when(col("orders") === 0, lit(null))
        .otherwise(col("revenue") / col("orders").cast("double")))
      .withColumn("conversion_rate", when(col("sessions") === 0, lit(null))
        .otherwise(col("converting_sessions").cast("double") /
          col("sessions").cast("double")))
  }

  /** metrics_daily_funnel.sql:5-38 — per-(session,date) funnel flags
    * (A10) rolled up daily (A11), J5 composite-key join to orders.
    * Uses the REAL event types (§2.12 item 3). */
  def metricsDailyFunnel(stgEvents: DataFrame, stgOrders: DataFrame)
      : DataFrame = {
    val flags = stgEvents.groupBy(col("event_date").as("date"),
        col("session_id"))
      .agg(
        max(when(col("event_type") === "view_product", 1).otherwise(0))
          .as("f_view"),
        max(when(col("event_type") === "add_to_cart", 1).otherwise(0))
          .as("f_cart"),
        max(when(col("event_type") === "checkout_start", 1).otherwise(0))
          .as("f_checkout"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("f_purchase"))
    val orders = stgOrders.select(col("session_id"),
      col("order_date").as("date")).distinct()
    flags.join(orders, Seq("session_id", "date"), "left")
      .groupBy(col("date"))
      .agg(countDistinct(col("session_id")).as("sessions"),
        sum(col("f_view")).cast("bigint").as("sessions_viewed"),
        sum(col("f_cart")).cast("bigint").as("sessions_carted"),
        sum(col("f_checkout")).cast("bigint").as("sessions_checkout"),
        sum(col("f_purchase")).cast("bigint").as("sessions_purchased"))
  }

  /** metrics_user_lifecycle.sql:5-46 — per-user session/order lifecycle
    * (A12/A13, J6), days_to_first_purchase ≥ 0 or null. */
  def metricsUserLifecycle(stgSessions: DataFrame, stgOrders: DataFrame)
      : DataFrame = {
    val s = stgSessions.groupBy(col("user_id"))
      .agg(min(col("session_start_ts")).as("first_session_ts"),
        count(lit(1)).as("total_sessions"))
    val o = stgOrders.groupBy(col("user_id"))
      .agg(min(col("order_time")).as("first_order_ts"),
        countDistinct(col("order_id")).as("total_orders"),
        sum(col("order_total_amount").cast(dec)).cast("double")
          .as("total_spend"))
    s.join(o, Seq("user_id"), "left")
      .withColumn("total_orders", coalesce(col("total_orders"), lit(0L)))
      .withColumn("total_spend", coalesce(col("total_spend"), lit(0.0)))
      .withColumn("days_to_first_purchase",
        datediff(col("first_order_ts").cast("date"),
          col("first_session_ts").cast("date")))
  }

  /** metrics_product_performance_daily.sql:5-47 — per-(date,product)
    * sales (A14, J7) ⟕ views (A15, J8), with the real `view_product`. */
  def metricsProductPerformanceDaily(stgOrderItems: DataFrame,
      stgEvents: DataFrame): DataFrame = {
    val sales = stgOrderItems
      .filter(col("order_status") === "completed")
      .groupBy(col("order_date").as("date"), col("product_id"))
      .agg(sum(col("quantity")).cast("bigint").as("units_sold"),
        countDistinct(col("order_id")).as("orders"),
        sum(col("line_amount").cast(dec)).cast("double").as("revenue"))
    val views = stgEvents.filter(col("event_type") === "view_product")
      .groupBy(col("event_date").as("date"), col("product_id"))
      .agg(countDistinct(col("session_id")).as("sessions_viewed"))
    sales.join(views, Seq("date", "product_id"), "left")
      .withColumn("sessions_viewed", coalesce(col("sessions_viewed"), lit(0L)))
      .withColumn("view_to_buy_rate", when(col("sessions_viewed") === 0,
        lit(null)).otherwise(col("orders").cast("double") /
          col("sessions_viewed").cast("double")))
  }
}
