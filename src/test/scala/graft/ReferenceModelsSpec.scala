package graft

import graft.datagen.Generator
import graft.etl.ReferenceModels._
import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** End-to-end over the reference-shaped generator: the full dbt-DAG
  * re-expression (staging → facts/dims → metrics) must satisfy the
  * reference's schema.yml test corpus semantics (§2.11) plus structural
  * invariants the reference never even checked. */
class ReferenceModelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val gen = new Generator(seed = 894L)
  lazy val sim = gen.simulate(Instant.parse("2024-06-01T00:00:00Z"),
    hours = 6, sessionsPerHour = 40)

  lazy val bronzeEvents: DataFrame = {
    val rows = sim.zipWithIndex.flatMap { case ((evs, _), h) =>
      evs.map(e => (e.eventId, e.eventType, e.version, e.userId,
        e.sessionId, e.productId, java.sql.Timestamp.from(e.eventTime),
        java.sql.Timestamp.from(e.sourceIngestedAt), e.device, e.country,
        e.userAgent, e.referrer, e.experimentId, h.toLong))
    }
    rows.toDF("event_id", "event_type", "version", "user_id", "session_id",
      "product_id", "event_time", "source_ingested_at", "device", "country",
      "user_agent", "referrer", "experiment_id", "batch_id")
      .withColumn("pipeline_ingested_at", col("source_ingested_at"))
  }

  lazy val bronzeOrders: DataFrame = {
    val rows = sim.zipWithIndex.flatMap { case ((_, ords), h) =>
      ords.map(o => (o.orderId, o.sessionId, o.userId,
        o.items.map(i => (i.productId, i.quantity, i.price)),
        o.orderStatus, java.sql.Timestamp.from(o.orderTime),
        java.sql.Timestamp.from(o.sourceIngestedAt), h.toLong))
    }
    rows.toDF("order_id", "session_id", "user_id", "items_raw",
      "order_status", "order_time", "source_ingested_at", "batch_id")
      .withColumn("items", expr(
        "transform(items_raw, x -> named_struct(" +
          "'product_id', x._1, 'quantity', x._2, 'price', x._3))"))
      .drop("items_raw")
      .withColumn("pipeline_ingested_at", col("source_ingested_at"))
  }

  lazy val events = stgClickstreamEvents(bronzeEvents).cache()
  lazy val sessions = stgClickstreamSessions(events).cache()
  lazy val orders = stgOrders(bronzeOrders).cache()
  lazy val items = stgOrderItems(orders).cache()

  test("generator injects the documented pathologies") {
    val raw = bronzeEvents.count()
    val distinct = bronzeEvents.select("event_id").distinct().count()
    assert(raw > 500)
    // v1 rows have null v2-only columns; v2 rows carry them
    val v1BadCols = bronzeEvents.filter(col("version") === "1" &&
      col("experiment_id").isNotNull).count()
    val v2WithCols = bronzeEvents.filter(col("version") === "2" &&
      col("experiment_id").isNotNull).count()
    assert(v1BadCols == 0 && v2WithCols > 0)
    // late events exist: event_time earlier than arrival by > 60s
    val late = bronzeEvents.filter(
      unix_timestamp(col("source_ingested_at")) -
        unix_timestamp(col("event_time")) > 60).count()
    assert(late > 0)
    assert(distinct <= raw) // dup injection may or may not fire per seed
  }

  test("staging dedup: silver keys unique even with injected duplicates") {
    assert(Quality.unique(events, Seq("event_id")) == 0)
    assert(Quality.unique(orders, Seq("order_id")) == 0)
    assert(Quality.notNull(events, "event_time") == 0)
  }

  test("schema.yml test corpus: relationships + ranges hold") {
    Quality.run(Seq(
      "items_order_fk" -> (() =>
        Quality.relationships(items, "order_id", orders, "order_id")),
      "orders_session_fk" -> (() =>
        Quality.relationships(orders, "session_id", sessions, "session_id")),
      "amount_nonneg" -> (() =>
        Quality.expressionIsTrue(orders, col("order_total_amount") >= 0)),
      "quantity_positive" -> (() =>
        Quality.expressionIsTrue(items, col("quantity") > 0)),
      "duration_nonneg" -> (() =>
        Quality.expressionIsTrue(sessions, col("session_duration_s") >= 0))),
      failFast = true)
    succeed
  }

  test("explode/agg inverse: per-order line amounts sum to order total") {
    val fromItems = items.groupBy(col("order_id"))
      .agg(sum(col("line_amount").cast("decimal(18,4)")).cast("double")
        .as("total_from_items"))
    val joined = orders.select(col("order_id"), col("order_total_amount"))
      .join(fromItems, Seq("order_id"))
    val mismatches = joined.filter(
      abs(col("order_total_amount") - col("total_from_items")) > 1e-9).count()
    assert(mismatches == 0)
    assert(Quality.expressionIsTrue(orders,
      col("item_count") === size(col("items"))) == 0)
  }

  test("gold: funnel is monotone and kpis reconcile with orders") {
    val funnel = metricsDailyFunnel(events, orders)
    assert(Quality.expressionIsTrue(funnel,
      col("sessions_viewed") >= col("sessions_carted") &&
        col("sessions_carted") >= col("sessions_checkout")) == 0)
    // funnel actually fires (the reference's product_view bug zeroed it)
    assert(funnel.agg(sum("sessions_viewed")).first().getLong(0) > 0)

    val fs = factSessions(sessions, orders)
    val kpis = metricsDailyKpis(fs, orders, dimDate(events))
    val revKpis = kpis.agg(sum(col("revenue").cast("decimal(18,4)")))
      .first().getDecimal(0)
    val revOrders = orders.filter(col("order_status") === "completed")
      .agg(sum(col("order_total_amount").cast("decimal(18,4)")))
      .first().getDecimal(0)
    assert(revKpis.compareTo(revOrders) == 0)

    val lifecycle = metricsUserLifecycle(sessions, orders)
    assert(Quality.expressionIsTrue(lifecycle,
      col("days_to_first_purchase").isNull ||
        col("days_to_first_purchase") >= 0) == 0)

    val perf = metricsProductPerformanceDaily(items, events)
    assert(Quality.unique(perf, Seq("date", "product_id")) == 0)

    val du = dimUsers(events, orders)
    assert(Quality.unique(du, Seq("user_id")) == 0)
    val dp = dimProducts(items)
    assert(Quality.unique(dp, Seq("product_id")) == 0)
  }

  test("facts are grain-preserving projections; dim_session_context" +
      " attributes first-touch per session") {
    val fe = factEvents(events)
    assert(fe.count() == events.count())
    assert(fe.columns.contains("event_ts") && fe.columns.contains("source_system"))
    val fo = factOrders(orders)
    assert(fo.count() == orders.count())
    assert(Quality.unique(fo, Seq("order_id")) == 0)
    val fi = factOrderItems(items)
    assert(fi.count() == items.count())
    val ctx = dimSessionContext(fe)
    assert(Quality.unique(ctx, Seq("session_id")) == 0)
    // first-touch: the context row carries the earliest event's attributes
    val someSession = fe.filter(col("session_id").isNotNull)
      .orderBy(col("session_id"), col("event_ts")).select("session_id")
      .first().getString(0)
    val firstDevice = fe.filter(col("session_id") === someSession)
      .orderBy(col("event_ts"), col("event_id"))
      .select("device").first().getString(0)
    assert(ctx.filter(col("session_id") === someSession)
      .select("device").first().getString(0) == firstDevice)
  }

  test("dedup idempotence property: silver(bronze ∪ bronze) == silver(bronze)") {
    val doubled = stgClickstreamEvents(bronzeEvents.union(bronzeEvents))
    assert(doubled.count() == events.count())
  }
}
