package graft

import graft.pipeline.MedallionPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end medallion pipeline over generated raw JSON with the
  * reference's pathologies injected: duplicate events (5%-batch style) and
  * late arrivals (SURVEY §2.9 ST5/ST6). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def writeBatch(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
  }

  def ev(id: String, typ: String, user: String, t: String, v: Double) =
    s"""{"event_id":"$id","event_type":"$typ","user_id":"$user","event_time":"$t","value":$v}"""

  test("full pipeline: ingest -> bronze -> silver -> gold, with dups and " +
      "late data, idempotent under re-run") {
    val base = Files.createTempDirectory("graft_pipe").toString
    val p = new MedallionPipeline(spark, base)

    // batch 1: 3 events, one duplicated inside the batch
    writeBatch(p.rawDir, "b1.json", Seq(
      ev("e1", "view", "u1", "2024-03-01T10:00:00Z", 1.0),
      ev("e2", "click", "u1", "2024-03-01T10:05:00Z", 2.0),
      ev("e2", "click", "u1", "2024-03-01T10:05:00Z", 2.0), // dup
      ev("e3", "purchase", "u2", "2024-03-02T09:00:00Z", 30.0)))
    p.runAll()

    assert(p.silver.count() == 3) // dup collapsed
    val day1 = p.gold.filter(col("event_date") === "2024-03-01")
      .select("n_events", "dau", "total_value").collect().head
    assert(day1.getLong(0) == 2 && day1.getLong(1) == 1
      && day1.getDouble(2) == 3.0)

    // batch 2: a LATE event for day 1 (arrives after day 2 processed) and
    // a cross-batch duplicate of e3
    writeBatch(p.rawDir, "b2.json", Seq(
      ev("e4", "view", "u3", "2024-03-01T23:59:00Z", 5.0), // late for day 1
      ev("e3", "purchase", "u2", "2024-03-02T09:00:00Z", 30.0))) // dup
    p.runAll()

    assert(p.silver.count() == 4)
    val day1b = p.gold.filter(col("event_date") === "2024-03-01")
      .select("n_events", "dau", "total_value").collect().head
    assert(day1b.getLong(0) == 3 && day1b.getLong(1) == 2
      && day1b.getDouble(2) == 8.0)

    // full re-run with no new data: everything idempotent
    val silverBefore = TestSpark.rows(p.silver)
    val goldBefore = TestSpark.rows(p.gold)
    p.runAll()
    assert(TestSpark.rows(p.silver) == silverBefore)
    assert(TestSpark.rows(p.gold) == goldBefore)
  }

  test("schema evolution v1 -> v2: a new event column flows end-to-end," +
      " old rows read as null (append_new_columns)") {
    import org.apache.spark.sql.types.{StringType, StructField}
    import spark.implicits._
    val base = Files.createTempDirectory("graft_pipe_v2").toString
    val v1 = new MedallionPipeline(spark, base)
    writeBatch(v1.rawDir, "b1.json", Seq(
      ev("e1", "view", "u1", "2024-03-01T10:00:00Z", 1.0)))
    v1.runAll()
    assert(!v1.silver.columns.contains("session_id"))

    // v2 producers add session_id (reference generator's v1->v2 bump);
    // the pipeline is reconstructed with the evolved schema — already-
    // landed v1 files are NOT rewritten, they read the column as null
    val v2 = new MedallionPipeline(spark, base,
      Seq(StructField("session_id", StringType)))
    writeBatch(v2.rawDir, "b2.json", Seq(
      """{"event_id":"e2","event_type":"click","user_id":"u1",""" +
        """"event_time":"2024-03-01T11:00:00Z","value":2.0,""" +
        """"session_id":"s1"}"""))
    v2.runAll()
    val rows = v2.silver.select("event_id", "session_id")
      .as[(String, Option[String])].collect().toMap
    assert(rows == Map("e1" -> None, "e2" -> Some("s1")))
    // gold still aggregates both generations
    val day = v2.gold.filter(col("event_date") === "2024-03-01")
      .select("n_events", "dau").collect().head
    assert(day.getLong(0) == 2 && day.getLong(1) == 1)
  }
}
