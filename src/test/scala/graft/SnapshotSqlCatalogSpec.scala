package graft

import graft.operators.{PartitionedSnapshots => PS, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The DSv2 catalog plugin: snapshot tables addressable from plain SQL
  * with native VERSION AS OF / TIMESTAMP AS OF time travel, scans
  * staying native parquet (pushdown visible in the plan), both snapshot
  * formats resolved, and mutations refused (writes belong to the
  * operator APIs that carry the commit protocol). */
class SnapshotSqlCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft_sqlcat").toString
    spark.conf.set("spark.sql.catalog.snap",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.snap.root", r)
    r
  }

  test("current read, VERSION AS OF, TIMESTAMP AS OF, native scans") {
    val t = s"$root/sales"
    PS.write(spark, t, Seq((1L, "A", "a1"), (2L, "B", "b1"))
      .toDF("k", "d", "v"), "d")
    val ts1 = PS.commitTimeMs(t, 1L).get
    Thread.sleep(5)
    PS.upsert(spark, t, Seq((2L, "B", "b2"), (3L, "B", "b3"))
      .toDF("k", "d", "v"), Seq("k"), "d")

    def rows(sql: String) =
      spark.sql(sql).select("k", "v").as[(Long, String)].collect().toSet
    assert(rows("SELECT * FROM snap.sales") ==
      Set((1L, "a1"), (2L, "b2"), (3L, "b3")))
    assert(rows("SELECT * FROM snap.sales VERSION AS OF 1") ==
      Set((1L, "a1"), (2L, "b1")))
    val tsLit = new java.sql.Timestamp(ts1).toString
    assert(rows(s"SELECT * FROM snap.sales TIMESTAMP AS OF '$tsLit'") ==
      Set((1L, "a1"), (2L, "b1")))
    // native parquet scan with the filter pushed
    val plan = spark.sql("SELECT k FROM snap.sales WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan parquet") || plan.contains("BatchScan"),
      s"not a native parquet scan:\n$plan")
    assert("PushedFilters: \\[[^\\]]*k".r.findFirstIn(plan).isDefined,
      s"filter not pushed:\n$plan")
  }

  test("full-copy Snapshots tables resolve through the same catalog") {
    val t = s"$root/dim"
    Snapshots.write(spark, t, Seq((10L, "x")).toDF("id", "name"))
    Snapshots.upsert(spark, t, Seq((10L, "x2"), (11L, "y"))
      .toDF("id", "name"), Seq("id"))
    assert(spark.sql("SELECT * FROM snap.dim").count() == 2)
    assert(spark.sql("SELECT name FROM snap.dim VERSION AS OF 1")
      .as[String].collect().toSeq == Seq("x"))
  }

  test("VERSION AS OF refuses staged-but-unpublished (WAP) versions" +
      " above the commit pointer") {
    val t = s"$root/wap"
    PS.write(spark, t, Seq((1L, "A", "v1")).toDF("k", "d", "v"), "d")
    // stage v2 WITHOUT publishing: the pointer still says v1, so SQL
    // time travel must not expose the un-audited data
    val staged = PS.stageUpsert(spark, t,
      Seq((2L, "A", "unaudited")).toDF("k", "d", "v"), Seq("k"), "d")
    assert(staged == 2L)
    assert(spark.sql("SELECT * FROM snap.wap").count() == 1)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM snap.wap VERSION AS OF 2").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    // after publish the same version resolves
    PS.publish(t, staged)
    assert(spark.sql("SELECT * FROM snap.wap VERSION AS OF 2")
      .count() == 2)
  }

  test("listTables sees committed tables; mutations are refused") {
    spark.sql("SELECT 1").collect() // force catalog init via root
    val names = spark.sql("SHOW TABLES IN snap").select("tableName")
      .as[String].collect().toSet
    assert(names.contains("sales") && names.contains("dim"), s"$names")
    val e = intercept[Exception] {
      spark.sql("DROP TABLE snap.sales")
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }
}
