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
    // deterministic prefix) flow through the same run path; corpus stays
    // green and the tables grow
    val evCount6 = p.table("fact_events").count()
    val (ev9, ord9) = ReferenceFixtures.bronze(spark, 9)
    val results9 = p.run(ev9, ord9)
    assert(results9.forall(_.passed))
    assert(p.table("fact_events").count() > evCount6)
    assert(p.table("fact_events").count() ==
      p.table("stg_clickstream_events").count())
  }
}
