package graft

import graft.operators.{PartitionedSnapshots => PS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-14 headline: predicate FILE-SKIPPING through the plan-from-
  * metadata index. A pushed predicate over the partition column prunes
  * the planned file list exactly (from the `__p=` path values the
  * manifest records); range/equality predicates over zone-mapped or
  * bloom-indexed data columns prune to the sidecars' survivors — on
  * BOTH read paths (operator readVersion → V1 scan, SQL catalog →
  * DSv2 scan), with results always byte-equal to the unpruned scan
  * (pruning is an optimization, never a semantic). */
class FileSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString

  private val store = graft.operators.CommitStore.local

  /** Files the executed V1 scan actually planned (the numFiles metric
    * FileSourceScanExec fills when its file listing resolves). */
  private def v1Files(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one V1 scan, got ${scans.size}")
    scans.head.metrics("numFiles").value
  }

  /** Files the DSv2 scan plans: re-ask the scan's own index with the
    * exact filters the builder pushed. */
  private def v2Files(df: DataFrame): (Int, GraftFilesProbe) = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s.scan
    }.collect { case p: ParquetScan => p }
    assert(scans.size == 1, s"expected one ParquetScan, got $scans")
    val p = scans.head
    assert(p.fileIndex.isInstanceOf[graft.plans.GraftFileIndex],
      "scan must plan from the metadata index")
    val n = p.fileIndex.listFiles(p.partitionFilters, p.dataFilters)
      .map(_.files.size).sum
    (n, GraftFilesProbe(p.fileIndex.allFiles().size))
  }
  case class GraftFilesProbe(total: Int)

  test("V1 path: a partition-column predicate plans only the matching " +
      "partitions' files — equality, IN, range, and an EXPRESSION over " +
      "the partition column all prune; results match the full filter") {
    val t = s"${tmp("fs_part")}/t"
    val df = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (4L, "d", "w")).toDF("k", "d", "v")
    PS.write(spark, t, df, "d", store)
    val all = PS.read(spark, t, store)
    val totalFiles = v1Files(all)
    assert(totalFiles == 4, s"one file per partition, got $totalFiles")

    def check(where: org.apache.spark.sql.Column,
        wantFiles: Long, wantKeys: Set[Long]): Unit = {
      val q = PS.read(spark, t, store).filter(where)
      assert(v1Files(q) == wantFiles, s"files for $where")
      assert(q.select("k").as[Long].collect().toSet == wantKeys,
        s"rows for $where")
    }
    check(col("d") === "b", 1, Set(2L))
    check(col("d").isin("a", "c"), 2, Set(1L, 3L))
    check(col("d") >= "c", 2, Set(3L, 4L))
    // arbitrary deterministic expression over the partition column
    check(upper(col("d")) === "A", 1, Set(1L))
    // a predicate on a NON-partition column prunes through the
    // AUTO stats-at-write default (round 16: every commit records
    // min/max for the leading stat-typed columns with no
    // declaration, no sidecar build) — k>2 rejects the k=1 and k=2
    // files on their recorded ranges, results stay exact
    check(col("k") > 2L, 2, Set(3L, 4L))
    // contradiction prunes everything (zero-file scan, zero rows)
    check(col("d") === "zzz", 0, Set.empty)
  }

  test("null partition: IS NULL keeps only the default-partition " +
      "files; equality prunes them (a comparison never matches NULL)") {
    val t = s"${tmp("fs_null")}/t"
    PS.write(spark, t, Seq((1L, Some("a"), "x"), (2L, None, "y"),
      (3L, Some("b"), "z")).toDF("k", "d", "v"), "d", store)
    val isNull = PS.read(spark, t, store).filter(col("d").isNull)
    assert(v1Files(isNull) == 1)
    assert(isNull.select("k").as[Long].collect().toSet == Set(2L))
    val eq = PS.read(spark, t, store).filter(col("d") === "a")
    assert(v1Files(eq) == 1)
    assert(eq.select("k").as[Long].collect().toSet == Set(1L))
  }

  test("typed partition column: a DATE partition prunes on date " +
      "literals and range predicates (value parsed back from the " +
      "path rendering)") {
    val t = s"${tmp("fs_date")}/t"
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-02-01")).toDF("k", "ds")
      .withColumn("d", to_date(col("ds"))).drop("ds")
    PS.write(spark, t, df, "d", store)
    val q = PS.read(spark, t, store)
      .filter(col("d") === lit("2024-01-02").cast("date"))
    assert(v1Files(q) == 1)
    assert(q.select("k").as[Long].collect().toSet == Set(2L))
    val r = PS.read(spark, t, store)
      .filter(col("d") < lit("2024-02-01").cast("date"))
    assert(v1Files(r) == 2)
    assert(r.select("k").as[Long].collect().toSet == Set(1L, 2L))
    // month() over the partition column — expression pruning on a
    // typed value
    val m = PS.read(spark, t, store).filter(month(col("d")) === 2)
    assert(v1Files(m) == 1)
    assert(m.select("k").as[Long].collect().toSet == Set(3L))
  }

  test("SQL catalog (DSv2): WHERE partCol = x plans exactly the " +
      "matching partition's files from the metadata index") {
    val root = tmp("fs_sql")
    spark.conf.set("spark.sql.catalog.fskip",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.fskip.root", root)
    PS.write(spark, s"$root/t", Seq((1L, "a", "x"), (2L, "b", "y"),
      (3L, "c", "z")).toDF("k", "d", "v"), "d", store)
    val q = spark.sql("SELECT k, v FROM fskip.t WHERE d = 'b'")
    val (planned, probe) = v2Files(q)
    assert(probe.total == 3 && planned == 1,
      s"planned $planned of ${probe.total}")
    assert(q.as[(Long, String)].collect().toSet == Set((2L, "y")))
    // and the unfiltered scan still plans everything
    val full = spark.sql("SELECT k FROM fskip.t")
    assert(v2Files(full)._1 == 3)
    assert(full.as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("zone map through plain SQL: a range predicate on a zone-" +
      "mapped data column plans only stats survivors — parity with " +
      "the operator API's readWhere") {
    val root = tmp("fs_zone")
    spark.conf.set("spark.sql.catalog.fzone",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.fzone.root", root)
    val t = s"$root/t"
    // one partition, several files, disjoint k ranges per file: zone
    // stats prune where partition values cannot
    val df = (1L to 40L).map(k => (k, "p", s"v$k")).toDF("k", "d", "v")
      .repartition(4, col("k") < 10L, col("k") < 20L, col("k") < 30L)
    PS.write(spark, t, df, "d", store)
    PS.buildZoneMap(spark, t, Seq("k"), store = store)
    val q = spark.sql("SELECT k FROM fzone.t WHERE k <= 5")
    val (planned, probe) = v2Files(q)
    assert(probe.total >= 2, s"need a multi-file table, got $probe")
    assert(planned < probe.total,
      s"zone map should prune: $planned of ${probe.total}")
    assert(q.as[Long].collect().toSet == (1L to 5L).toSet)
    // parity with the operator path
    val viaReadWhere = PS.readWhere(spark, t,
      ranges = Seq(("k", 0L, 5L)), store = store)
      .select("k").as[Long].collect().toSet
    assert(viaReadWhere == (1L to 5L).toSet)
    // IS NOT NULL / IS NULL shapes stay correct (never lose rows)
    val nn = spark.sql("SELECT count(*) FROM fzone.t WHERE k IS NOT NULL")
    assert(nn.as[Long].head() == 40L)
  }

  test("LIKE 'prefix%' prunes through a zone-mapped string column " +
      "(StartsWith -> half-open range on the stats); non-ASCII " +
      "prefixes skip pruning but stay correct") {
    val root = tmp("fs_like")
    spark.conf.set("spark.sql.catalog.flike",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.flike.root", root)
    val t = s"$root/t"
    // three files with disjoint v prefixes: aa*, mm*, zz*
    val df = ((1L to 10L).map(k => (k, "p", f"aa-$k%03d")) ++
      (11L to 20L).map(k => (k, "p", f"mm-$k%03d")) ++
      (21L to 30L).map(k => (k, "p", f"zz-$k%03d")))
      .toDF("k", "d", "v")
      .repartition(3, col("v") < "m", col("v") < "y")
    PS.write(spark, t, df, "d", store)
    PS.buildZoneMap(spark, t, Seq("v"), store = store)
    val q = spark.sql("SELECT k FROM flike.t WHERE v LIKE 'mm-%'")
    val (planned, probe) = v2Files(q)
    assert(probe.total >= 2, s"$probe")
    assert(planned < probe.total, s"LIKE should prune: " +
      s"$planned of ${probe.total}")
    assert(q.as[Long].collect().toSet == (11L to 20L).toSet)
    // non-ASCII prefix: no pruning claim, full correctness
    val u = spark.sql("SELECT k FROM flike.t WHERE v LIKE 'ümm%'")
    assert(u.count() == 0L)
  }

  test("bloom index through plain SQL: an equality probe plans only " +
      "bloom survivors; a value present in one file reads one file") {
    val root = tmp("fs_bloom")
    spark.conf.set("spark.sql.catalog.fbloom",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.fbloom.root", root)
    val t = s"$root/t"
    val df = (1L to 400L).map(k => (k, "p", s"id-$k")).toDF("k", "d", "v")
      .repartition(4, col("k"))
    PS.write(spark, t, df, "d", store)
    PS.buildBloomIndex(spark, t, Seq("v"),
      expectedItemsPerFile = 1000L, store = store)
    val q = spark.sql("SELECT k FROM fbloom.t WHERE v = 'id-137'")
    val (planned, probe) = v2Files(q)
    assert(probe.total == 4, s"$probe")
    assert(planned < 4, s"bloom should prune: $planned of 4")
    assert(q.as[Long].collect().toSet == Set(137L))
    // an absent value prunes everything and returns empty, not error
    val none = spark.sql("SELECT k FROM fbloom.t WHERE v = 'absent'")
    assert(none.count() == 0)
  }

  test("STALE sidecars stay sound and useful: after a commit beyond " +
      "the zone-map/bloom build, the SQL scan still prunes files the " +
      "index knows and KEEPS the newer files it does not — skipping " +
      "degrades, correctness never") {
    val root = tmp("fs_stale")
    spark.conf.set("spark.sql.catalog.fstale",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.fstale.root", root)
    val t = s"$root/t"
    val df = (1L to 40L).map(k => (k, "p", s"id-$k")).toDF("k", "d", "v")
      .repartition(4, col("k") < 10L, col("k") < 20L, col("k") < 30L)
    PS.write(spark, t, df, "d", store)
    PS.buildZoneMap(spark, t, Seq("k"), store = store)
    PS.buildBloomIndex(spark, t, Seq("v"),
      expectedItemsPerFile = 1000L, store = store)
    // the props record the maintained indexes (the staleness search
    // only runs for tables that ever built one)
    assert(PS.tableProps(t).get("zonemap").contains("k"))
    assert(PS.tableProps(t).get("bloomidx").contains("v"))
    // v2: a NEW partition the v1 sidecars know nothing about
    PS.upsert(spark, t, Seq((100L, "q", "id-100")).toDF("k", "d", "v"),
      Seq("k"), "d", store = store)
    val all = v2Files(spark.sql("SELECT k FROM fstale.t"))._1
    // range query: old files prune through the stale zone map; the
    // new partition's file is unknown to it → kept
    val zq = spark.sql("SELECT k FROM fstale.t WHERE k <= 5")
    val (zPlanned, _) = v2Files(zq)
    assert(zPlanned < all, s"stale zone map must still prune: " +
      s"$zPlanned of $all")
    assert(zq.as[Long].collect().toSet == (1L to 5L).toSet)
    // a value in the NEW (unindexed) file is never lost
    val nq = spark.sql("SELECT k FROM fstale.t WHERE v = 'id-100'")
    val (nPlanned, _) = v2Files(nq)
    assert(nPlanned >= 1)
    assert(nq.as[Long].collect().toSet == Set(100L))
    // a value in an OLD file still bloom-prunes
    val bq = spark.sql("SELECT k FROM fstale.t WHERE v = 'id-7'")
    assert(v2Files(bq)._1 < all, "stale bloom must still prune")
    assert(bq.as[Long].collect().toSet == Set(7L))
  }

  test("pruning composes: partition predicate AND zone-mapped range " +
      "intersect their survivor sets") {
    val t = s"${tmp("fs_both")}/t"
    val df = (1L to 40L).map(k => (k, if (k <= 20) "a" else "b"))
      .toDF("k", "d")
      .repartition(2, col("k") % 2 === 0)
    PS.write(spark, t, df, "d", store)
    PS.buildZoneMap(spark, t, Seq("k"), store = store)
    val all = v1Files(PS.read(spark, t, store))
    val q = PS.read(spark, t, store)
      .filter(col("d") === "a" && col("k") <= 20L)
    val planned = v1Files(q)
    assert(planned <= all / 2,
      s"composed pruning: $planned of $all")
    assert(q.select("k").as[Long].collect().toSet == (1L to 20L).toSet)
  }
}
