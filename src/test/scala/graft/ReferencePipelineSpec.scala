package graft

import graft.etl.ReferencePipeline
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The dbt_runner equivalence, end-to-end: generator bronze → all 16
  * models materialized with the reference's materialization configs →
  * the ENTIRE schema.yml test corpus green → re-run idempotent → an
  * incremental batch lands through the same path. */
class ReferencePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full DAG: 16 models materialize, the whole schema.yml corpus" +
      " passes, re-runs are idempotent, incremental batches land") {
    val base = Files.createTempDirectory("graft_refpipe").toString
    val p = new ReferencePipeline(spark, base)
    val (ev6, ord6) = ReferenceFixtures.bronze(spark, 6)

    // first build from scratch
    val results = p.run(ev6, ord6)
    assert(results.size >= 95, s"only ${results.size} checks ran")
    assert(results.forall(_.passed))
    p.modelPaths.keys.foreach { n =>
      assert(p.table(n).count() > 0, s"$n is empty")
    }
    // facts preserve staging grain
    assert(p.table("fact_events").count() ==
      p.table("stg_clickstream_events").count())
    assert(p.table("fact_orders").count() == p.table("stg_orders").count())

    // re-run with no new data: every layer identical (delete+insert
    // replaces rows with byte-identical recomputations)
    val factsBefore = TestSpark.rows(p.table("fact_orders"))
    val kpisBefore = TestSpark.rows(p.table("metrics_daily_kpis"))
    p.run(ev6, ord6)
    assert(TestSpark.rows(p.table("fact_orders")) == factsBefore)
    assert(TestSpark.rows(p.table("metrics_daily_kpis")) == kpisBefore)

    // incremental batch: 3 more simulated hours (the first 6 are a
    // deterministic prefix) flow through the same run path — the
    // steady-state run is sliver-narrowed (sidecars exist from the
    // first run); corpus stays green and the tables grow. A hand-made
    // LATE event (old event_ts, newest arrival) rides along: the
    // arrival sliver must admit it even though its event time is old.
    val evCount6 = p.table("fact_events").count()
    val (ev9raw, ord9) = ReferenceFixtures.bronze(spark, 9)
    import org.apache.spark.sql.functions._
    val maxes = ev9raw.agg(max("event_time"), max("pipeline_ingested_at"),
      max("batch_id")).head()
    val lateArrival = new java.sql.Timestamp(
      maxes.getTimestamp(1).getTime + 60000L)
    val lateRow = ev9raw.limit(1)
      .withColumn("event_id", lit("late-event-1"))
      .withColumn("session_id", lit("late-session-1"))
      .withColumn("event_time", lit(new java.sql.Timestamp(
        maxes.getTimestamp(0).getTime - 2 * 3600 * 1000L)))
      .withColumn("source_ingested_at", lit(lateArrival))
      .withColumn("pipeline_ingested_at", lit(lateArrival))
      .withColumn("batch_id", lit(maxes.getLong(2) + 1))
    val ev9 = ev9raw.unionByName(lateRow)
    val results9 = p.run(ev9, ord9)
    assert(results9.forall(_.passed))
    assert(p.table("fact_events").count() > evCount6)
    assert(p.table("fact_events").count() ==
      p.table("stg_clickstream_events").count())
    assert(p.table("fact_events")
      .filter(col("event_id") === "late-event-1").count() == 1,
      "arrival sliver must admit a late-event-time row")

    // THE sliver-correctness gate: the incrementally-maintained models
    // equal a from-scratch rebuild of the same bronze (row-identical),
    // and a FULL-OVERLAP pipeline (sliver narrowing off — the
    // crash-recovery path) lands the same rows too
    val scratchBase = Files.createTempDirectory("graft_refpipe_s").toString
    val scratch = new ReferencePipeline(spark, scratchBase)
    scratch.run(ev9, ord9)
    val overlapBase = Files.createTempDirectory("graft_refpipe_o").toString
    val overlap = new ReferencePipeline(spark, overlapBase, sliver = false)
    overlap.run(ev6, ord6); overlap.run(ev9, ord9)
    for (m <- Seq("stg_clickstream_events", "stg_clickstream_sessions",
        "stg_orders", "stg_order_items", "fact_events", "fact_orders",
        "fact_order_items", "fact_sessions", "metrics_daily_kpis")) {
      def rowsOf(q: ReferencePipeline) =
        TestSpark.rows(q.table(m).select(
          p.table(m).columns.sorted.map(col): _*))
      assert(rowsOf(p) == rowsOf(scratch),
        s"$m: sliver-incremental != scratch rebuild")
      assert(rowsOf(p) == rowsOf(overlap),
        s"$m: sliver-incremental != full-overlap incremental")
    }
  }

  test("change-gated dims/metrics: a no-new-data (day-3) run leaves " +
      "every table-materialized model's files byte-untouched " +
      "(mtime-pinned) with the full corpus still green; new data " +
      "rebuilds them") {
    val base = Files.createTempDirectory("graft_refpipe_gate").toString
    val p = new ReferencePipeline(spark, base)
    val (ev6, ord6) = ReferenceFixtures.bronze(spark, 6)
    p.run(ev6, ord6)

    val tableModels = Seq("dim_session_context", "dim_users",
      "dim_products", "dim_date", "metrics_daily_kpis",
      "metrics_daily_funnel", "metrics_user_lifecycle",
      "metrics_product_performance_daily")
    def mtimes(model: String): Map[String, Long] = {
      val dir = java.nio.file.Paths.get(p.modelPaths(model))
      val s = Files.walk(dir)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(f => Files.isRegularFile(f))
        .map(f => f.toString ->
          Files.getLastModifiedTime(f).toMillis).toMap
      finally s.close()
    }
    val before = tableModels.map(m => m -> mtimes(m)).toMap

    // day-3: nothing new arrived — staging/fact upserts detect no-op,
    // the gate propagates, and no dim/metric file is even rewritten
    val day3 = p.run(ev6, ord6)
    assert(day3.forall(_.passed), "corpus must stay green on the gated run")
    tableModels.foreach { m =>
      assert(mtimes(m) == before(m),
        s"$m was rewritten on a provably-unchanged run")
    }

    // new upstream data flips the gate: every dim/metric rebuilds (their
    // row-correctness after rebuild is pinned by the main DAG test)
    val (ev9, ord9) = ReferenceFixtures.bronze(spark, 9)
    val res9 = p.run(ev9, ord9)
    assert(res9.forall(_.passed))
    tableModels.foreach { m =>
      assert(mtimes(m) != before(m),
        s"$m was not rebuilt after its upstreams changed")
    }
  }

  test("change-gate crash recovery: a fact change committed by a run " +
      "that died BEFORE dims/metrics rebuilds them on the next run, " +
      "even though that run's own upserts are content-equal no-ops") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_refpipe_crash").toString
    val p = new ReferencePipeline(spark, base)
    val (ev6, ord6) = ReferenceFixtures.bronze(spark, 6)
    p.run(ev6, ord6)

    // the crashed run: its fact_orders upsert COMMITTED (simulated as
    // an out-of-band keyed upsert bumping one order's amount through
    // the same materializer), then the process died before any
    // dim/metric rebuilt — the exact round-9 ADVICE window
    val victim = p.table("fact_orders")
      .orderBy(col("order_id")).limit(1).localCheckpoint()
    val orderId = victim.select("order_id").as[String](
      org.apache.spark.sql.Encoders.STRING).head()
    val userId = victim.select("user_id").as[String](
      org.apache.spark.sql.Encoders.STRING).head()
    val oldRev = p.table("dim_users")
      .filter(col("user_id") === userId)
      .select("lifetime_revenue").as[Double](
        org.apache.spark.sql.Encoders.scalaDouble).head()
    val inc = new graft.operators.Incremental(spark)
    inc.upsert(p.modelPaths("fact_orders"),
      victim.withColumn("order_total_amount",
        col("order_total_amount") + lit(1000.0)),
      Seq("order_id"))
    assert(p.table("fact_orders").filter(col("order_id") === orderId)
      .select("order_total_amount").as[Double](
        org.apache.spark.sql.Encoders.scalaDouble).head() > 1000.0 - 1,
      "the simulated crashed run's fact change must be committed")

    // next run, SAME bronze: every staging/fact upsert is a no-op (the
    // sliver sidecars are current), so the in-memory changed-set stays
    // empty — the durable .__deps fingerprint is what must notice the
    // fact_orders dir swap and force the rebuild
    val res = p.run(ev6, ord6)
    assert(res.forall(_.passed))
    val newRev = p.table("dim_users")
      .filter(col("user_id") === userId)
      .select("lifetime_revenue").as[Double](
        org.apache.spark.sql.Encoders.scalaDouble).head()
    assert(math.abs(newRev - (oldRev + 1000.0)) < 1e-6,
      s"dim_users stayed stale after crash recovery: $oldRev -> $newRev")

    // and the gate still closes: one more identical run leaves every
    // table model untouched (no rebuild-always regression)
    def mtimes(model: String): Map[String, Long] = {
      val dir = java.nio.file.Paths.get(p.modelPaths(model))
      val s = Files.walk(dir)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(f => Files.isRegularFile(f))
        .map(f => f.toString ->
          Files.getLastModifiedTime(f).toMillis).toMap
      finally s.close()
    }
    val before = mtimes("dim_users")
    p.run(ev6, ord6)
    assert(mtimes("dim_users") == before,
      "dim_users rebuilt on a provably-unchanged run after recovery")
  }
}
