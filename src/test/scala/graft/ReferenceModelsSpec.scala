package graft

import graft.etl.ReferenceModels._
import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dbt-DAG re-expression as PURE transforms (staging → facts/dims →
  * metrics) over the reference-shaped generator: schema.yml semantics
  * (§2.11) plus structural invariants the reference never even checked.
  * (The materializing runner + full schema.yml corpus gate is
  * ReferencePipelineSpec.) */
class ReferenceModelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val (bronzeEvents, bronzeOrders) = ReferenceFixtures.bronze(spark, 6)

  lazy val events = stgClickstreamEvents(bronzeEvents).cache()
  lazy val sessions = stgClickstreamSessions(events).cache()
  lazy val orders = stgOrders(bronzeOrders).cache()
  lazy val items = stgOrderItems(orders).cache()
  lazy val fe: DataFrame = factEvents(events).cache()
  lazy val fo: DataFrame = factOrders(orders).cache()
  lazy val fi: DataFrame = factOrderItems(items).cache()
  lazy val fs: DataFrame = factSessions(sessions, orders).cache()

  test("simulateEach streams the EXACT batches simulate materializes" +
      " (the e2e pipeline bench writes hour-by-hour through it; the rng" +
      " must be consumed in the identical order)") {
    import graft.datagen.Generator
    import java.time.Instant
    val start = Instant.parse("2024-06-01T00:00:00Z")
    val a = new Generator(seed = 7L).simulate(start, 3, 50)
      .map { case (e, o) => (e.map(_.eventId), o.map(_.orderId)) }
    val b = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[String], Seq[String])]
    new Generator(seed = 7L).simulateEach(start, 3, 50)((h, e, o) => {
      assert(h == b.size, "hours must arrive in order")
      b += ((e.map(_.eventId), o.map(_.orderId)))
    })
    assert(a == b.toSeq)
  }

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
    assert(Quality.notNull(events, "event_ts") == 0)
  }

  test("staging output columns match the reference SQL exactly") {
    assert(events.columns.toSeq == Seq("event_id", "event_type", "user_id",
      "session_id", "product_id", "event_ts", "event_date", "country",
      "device", "experiment_id", "referrer", "source_system",
      "pipeline_ingested_at"))
    assert(sessions.columns.toSeq == Seq("session_id", "user_id",
      "session_start_ts", "session_end_ts", "session_duration_sec",
      "event_count"))
    assert(orders.columns.toSeq == Seq("order_id", "user_id", "session_id",
      "items", "order_status", "order_ts", "item_count",
      "order_total_amount", "source_system", "pipeline_ingested_at"))
    assert(items.columns.toSeq == Seq("order_id", "user_id", "session_id",
      "product_id", "quantity", "price", "line_amount", "order_ts",
      "pipeline_ingested_at"))
  }

  test("schema.yml test corpus: relationships + ranges hold on staging") {
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
        Quality.expressionIsTrue(sessions,
          col("session_duration_sec") >= 0))),
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
    val funnel = metricsDailyFunnel(fe, fo)
    assert(Quality.expressionIsTrue(funnel,
      col("sessions_with_product_view") >= col("sessions_with_add_to_cart")
        && col("sessions_with_add_to_cart") >=
          col("sessions_with_checkout")) == 0)
    // funnel actually fires (the reference's product_view bug zeroed it)
    assert(funnel.agg(sum("sessions_with_product_view"))
      .first().getLong(0) > 0)

    val kpis = metricsDailyKpis(fs, fo, dimDate(fe))
    // KPI revenue covers ALL orders (the reference applies no status
    // filter, metrics_daily_kpis.sql:15-22)
    val revKpis = kpis.agg(sum(col("revenue").cast("decimal(18,4)")))
      .first().getDecimal(0)
    val revOrders = orders
      .agg(sum(col("order_total_amount").cast("decimal(18,4)")))
      .first().getDecimal(0)
    assert(revKpis.compareTo(revOrders) == 0)

    val lifecycle = metricsUserLifecycle(fs, fo)
    assert(Quality.expressionIsTrue(lifecycle,
      col("days_to_first_purchase").isNull ||
        col("days_to_first_purchase") >= 0) == 0)

    val perf = metricsProductPerformanceDaily(fi, fo, fe)
    assert(Quality.unique(perf, Seq("date", "product_id")) == 0)

    val du = dimUsers(fe, fo)
    assert(Quality.unique(du, Seq("user_id")) == 0)
    val dp = dimProducts(fi)
    assert(Quality.unique(dp, Seq("product_id")) == 0)
  }

  test("facts are grain-preserving projections; dim_session_context" +
      " attributes first-touch per session") {
    assert(fe.count() == events.count())
    assert(fe.columns.contains("event_ts") &&
      fe.columns.contains("source_system"))
    assert(fo.count() == orders.count())
    assert(Quality.unique(fo, Seq("order_id")) == 0)
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
