package graft

import graft.operators.{PartitionedSnapshots => PS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-16: stats-at-write BY DEFAULT. An UNDECLARED table is no
  * longer stat-less — every commit records per-file min/max/null-count
  * for the first `stats_num_cols` (default 32) stat-typed top-level
  * columns of the owner's schema (Delta's `dataSkippingNumIndexedCols`
  * shape), so fresh tables data-column-skip out of the box; `none`
  * is the explicit opt-out, `auto` reverts an explicit declaration.
  * Plus the coverage observability that pairs with it: `file_stats`
  * and `detail` report how many live files carry stats, so an admin
  * sees the deficit `backfill_stats` would close without running it. */
class StatsDefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString

  private val store = graft.operators.CommitStore.local

  private def grouped(frames: DataFrame*): DataFrame =
    frames.map(df =>
      spark.createDataFrame(df.rdd.coalesce(1), df.schema))
      .reduce(_ union _)

  private def v1Files(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one V1 scan, got ${scans.size}")
    scans.head.metrics("numFiles").value
  }

  test("a table with NO declaration stats its columns by default: " +
      "fresh commits carry tokens, a data-column point query prunes " +
      "through both doors, and `none` opts out") {
    val root = tmp("sdef_auto")
    spark.conf.set("spark.sql.catalog.sdef",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.sdef.root", root)
    val t = s"$root/t"
    // NO setStatsColumns, no TBLPROPERTIES — the auto default
    val df = grouped(
      (1L to 10L).map(k => (k, "p", s"v$k")).toDF("k", "d", "v"),
      (11L to 20L).map(k => (k, "p", s"v$k")).toDF("k", "d", "v"),
      (21L to 30L).map(k => (k, "p", s"v$k")).toDF("k", "d", "v"),
      (31L to 40L).map(k => (k, "p", s"v$k")).toDF("k", "d", "v"))
    PS.write(spark, t, df, "d", store)
    val refs = PS.fileManifest(t, 1L, store).get
    assert(refs.nonEmpty && refs.forall(_.stats.isDefined),
      s"auto default must stat every fresh file: $refs")
    // V1 operator door prunes on the auto-statted data column
    val all = v1Files(PS.read(spark, t, store))
    assert(all >= 4)
    val q1 = PS.read(spark, t, store).filter(col("k") <= 5L)
    assert(v1Files(q1) < all, "auto stats must prune (V1)")
    assert(q1.select("k").as[Long].collect().toSet == (1L to 5L).toSet)
    // SQL door prunes too
    val q2 = spark.sql("SELECT k FROM sdef.t WHERE k <= 5")
    assert(q2.as[Long].collect().toSet == (1L to 5L).toSet)
    // explicit OPT-OUT: later commits record row counts only
    PS.setStatsColumns(t, Nil, store)
    PS.upsert(spark, t,
      Seq((100L, "q", "x")).toDF("k", "d", "v"), Seq("k"), "d", store = store)
    val v2 = PS.currentVersion(t, store).get
    val fresh = PS.fileManifest(t, v2, store).get.filter(_.owner == v2)
    assert(fresh.nonEmpty && fresh.forall(_.stats.isEmpty),
      s"opt-out commits must not stat: $fresh")
    assert(fresh.forall(_.rows.isDefined), "row counts always recorded")
    // `auto` reverts: the next commit stats again
    PS.setStatsColumns(t, Seq("auto"), store)
    PS.upsert(spark, t,
      Seq((200L, "r", "y")).toDF("k", "d", "v"), Seq("k"), "d", store = store)
    val v3 = PS.currentVersion(t, store).get
    val fresh3 = PS.fileManifest(t, v3, store).get.filter(_.owner == v3)
    assert(fresh3.nonEmpty && fresh3.forall(_.stats.isDefined),
      s"`auto` must revert to the default: $fresh3")
  }

  test("stats_num_cols bounds the auto default: limit 1 stats only " +
      "the first stat-typed column") {
    val root = tmp("sdef_limit")
    val t = s"$root/t"
    PS.setStatsAutoLimit(t, 1, store)
    PS.write(spark, t,
      Seq((1L, "a", "x", 2.5), (2L, "a", "y", 3.5))
        .toDF("k", "d", "v", "w"), "d", store)
    val refs = PS.fileManifest(t, 1L, store).get
    assert(refs.forall(_.stats.isDefined))
    refs.foreach { r =>
      val cols = graft.operators.FileStats.parse(r.stats.get).map(_._1)
      assert(cols == Seq("k"),
        s"limit 1 must stat exactly the first column, got $cols")
    }
  }

  test("file_stats reports files_with_stats and detail reports the " +
      "coverage + regime; an opted-out table shows the deficit that " +
      "backfill_stats then closes") {
    val root = tmp("sdef_cov")
    spark.conf.set("spark.sql.catalog.scov",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.scov.root", root)
    val t = s"$root/t"
    // opt out FIRST, then write: files carry row counts but no stats
    store.mkdirs(t)
    PS.setStatsColumns(t, Nil, store)
    PS.write(spark, t, (1L to 20L).map(k => (k, s"p${k % 2}"))
      .toDF("k", "d"), "d", store)
    val rows0 = spark.sql(
      "CALL scov.system.file_stats(table => 't')").collect()
    assert(rows0.nonEmpty)
    assert(rows0.map(_.getAs[Int]("files_with_stats")).sum == 0,
      "opted-out files must report zero stats coverage")
    val det0 = spark.sql(
      "CALL scov.system.detail(table => 't')").collect().head
    assert(det0.getAs[Int]("num_files_with_stats") == 0)
    assert(det0.getAs[String]("stats_columns") == "none")
    // declare, backfill: the deficit closes and detail shows it
    PS.setStatsColumns(t, Seq("k"), store)
    val enriched = PS.backfillStats(spark, t, store)
    assert(enriched > 0, "backfill must enrich the stat-less files")
    val rows1 = spark.sql(
      "CALL scov.system.file_stats(table => 't')").collect()
    assert(rows1.map(r => (r.getAs[Int]("files"),
        r.getAs[Int]("files_with_stats")))
      .forall { case (f, s) => f == s },
      "backfill must close the whole deficit")
    val det1 = spark.sql(
      "CALL scov.system.detail(table => 't')").collect().head
    assert(det1.getAs[Int]("num_files_with_stats") ==
      det1.getAs[Int]("num_files"))
    assert(det1.getAs[String]("stats_columns") == "k")
    // a fresh UNDECLARED table reports the auto regime
    PS.write(spark, s"$root/u", Seq((1L, "a")).toDF("k", "d"), "d",
      store)
    val det2 = spark.sql(
      "CALL scov.system.detail(table => 'u')").collect().head
    assert(det2.getAs[String]("stats_columns").startsWith("auto("))
    assert(det2.getAs[Int]("num_files_with_stats") ==
      det2.getAs[Int]("num_files"))
  }

  test("backfillStats counts only files it actually enriched and " +
      "converges to 0 — a declared column that can never yield stats " +
      "does not report progress forever") {
    val root = tmp("sdef_conv")
    val t = s"$root/t"
    store.mkdirs(t)
    PS.setStatsColumns(t, Nil, store)
    // NaN-only floats: footer min/max are unusable by the harvest's
    // NaN exclusion, so these files can never gain a stats token
    PS.write(spark, t,
      Seq((Float.NaN, "a"), (Float.NaN, "a")).toDF("f", "d"), "d",
      store)
    PS.setStatsColumns(t, Seq("f"), store)
    val first = PS.backfillStats(spark, t, store)
    // whatever the first call reports, the SECOND must be 0 — the
    // documented 0-means-nothing-left-enrichable contract
    val second = PS.backfillStats(spark, t, store)
    assert(second == 0,
      s"backfill must converge on un-enrichable files " +
        s"(first=$first, second=$second)")
  }
}
