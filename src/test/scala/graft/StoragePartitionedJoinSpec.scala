package graft

import graft.operators.{PartitionedSnapshots => PS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-15: STORAGE-PARTITIONED JOINS (Spark SPJ, SPARK-37375). The
  * manifest records every file's partition value, so the DSv2 scan
  * reports `KeyGroupedPartitioning` over the partition column (under
  * the standard `spark.sql.sources.v2.bucketing.enabled` opt-in) and a
  * join between two snapshot tables co-partitioned on that column
  * drops BOTH ShuffleExchanges — the single largest avoidable exchange
  * for fact-fact joins at 100 TB. Correctness is pinned against the
  * shuffled plan. */
class StoragePartitionedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString

  private val store = graft.operators.CommitStore.local

  /** Shuffle count that sees through AQE: QueryStageExec nodes hide
    * their exchange in a non-child `plan` field, so a naive collect
    * over the adaptive plan reports zero exchanges for every query. */
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private val Preserve =
    graft.plans.StatParquetScan.PreserveGroupingKey

  private def withSpj[A](body: => A): A = {
    val prevB = spark.conf.get("spark.sql.sources.v2.bucketing.enabled")
    val prevP = spark.conf.get(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Spark's switch defaults TRUE in Spark 4; graft's
      // preserve-data-grouping (Iceberg's split) is the explicit
      // session opt-in — grouping trades scan split-packing for key
      // alignment, a per-workload call
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set(Preserve, "true")
      // force the non-broadcast path: this test is about eliminating
      // the shuffle, not hiding it behind a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prevB)
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", prevP)
      spark.conf.unset(Preserve)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
    }
  }

  test("a join of two co-partitioned snap tables on the partition " +
      "column runs with ZERO shuffles under SPJ; identical results " +
      "to the shuffled plan; the opt-in off keeps the old plan") {
    val root = tmp("spj_basic")
    spark.conf.set("spark.sql.catalog.spj",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.spj.root", root)
    PS.write(spark, s"$root/t1", (1L to 300L).map(k =>
      (k, s"p${k % 5}", s"a$k")).toDF("k", "d", "v"), "d", store)
    PS.write(spark, s"$root/t2", (1L to 200L).map(k =>
      (k, s"p${k % 5}", s"b$k")).toDF("k", "d", "w"), "d", store)
    val q = "SELECT a.d, count(*) AS n FROM spj.t1 a JOIN spj.t2 b " +
      "ON a.d = b.d GROUP BY a.d"
    // multi-split scans: tiny test files otherwise pack into ONE task
    // per side, and a single-partition SMJ needs no exchange — which
    // would make the gate comparison below vacuous
    val prevMpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val (spjShuffles, spjRows) = withSpj {
      val df = spark.sql(q)
      (shuffles(df), df.as[(String, Long)].collect().toSet)
    }
    assert(spjShuffles == 0,
      s"SPJ must eliminate every exchange, got $spjShuffles")
    // preserve-data-grouping OFF (the default): the shuffled plan —
    // the conf gates the scan's report
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (offShuffles, offRows) = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(q)
      (shuffles(df), df.as[(String, Long)].collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMpb)
    }
    assert(offShuffles > 0,
      "grouping must stay off without the session opt-in")
    assert(spjRows == offRows, "SPJ is a plan change, not a semantic")
    assert(spjRows ==
      (0 to 4).map(i => (s"p$i", 60L * 40L)).toSet)
  }

  test("mismatched partition-value sets still join correctly under " +
      "SPJ (pushPartValues aligns the sides); a date-partitioned " +
      "pair works too") {
    val root = tmp("spj_mixed")
    spark.conf.set("spark.sql.catalog.spjm",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.spjm.root", root)
    PS.write(spark, s"$root/l", Seq(("a", 1L), ("b", 2L), ("c", 3L))
      .toDF("d", "x"), "d", store)
    PS.write(spark, s"$root/r", Seq(("b", 20L), ("c", 30L), ("e", 50L))
      .toDF("d", "y"), "d", store)
    withSpj {
      val j = spark.sql("SELECT l.d, l.x, r.y FROM spjm.l l JOIN " +
        "spjm.r r ON l.d = r.d")
      assert(shuffles(j) == 0, "mismatched value sets must still SPJ")
      assert(j.as[(String, Long, Long)].collect().toSet ==
        Set(("b", 2L, 20L), ("c", 3L, 30L)))
    }
    // date-typed partition column
    val mk = (off: Long, tag: String) => (1L to 6L).map(k =>
      (k + off, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, (k % 3 + 1).toInt)), s"$tag$k"))
      .toDF("k", "dt", "v")
    PS.write(spark, s"$root/dl", mk(0L, "l"), "dt", store)
    PS.write(spark, s"$root/dr", mk(100L, "r"), "dt", store)
    withSpj {
      val j = spark.sql("SELECT l.k, r.k FROM spjm.dl l JOIN " +
        "spjm.dr r ON l.dt = r.dt")
      assert(shuffles(j) == 0, "date partitions must SPJ")
      assert(j.count() == 12L) // 3 dates × 2 × 2
    }
  }

  test("a GROUP BY on the partition column aggregates without an " +
      "exchange under SPJ (the reported clustering satisfies the " +
      "distribution)") {
    val root = tmp("spj_agg")
    spark.conf.set("spark.sql.catalog.spja",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.spja.root", root)
    PS.write(spark, s"$root/t", (1L to 90L).map(k =>
      (k, s"p${k % 3}")).toDF("k", "d"), "d", store)
    withSpj {
      val a = spark.sql(
        "SELECT d, count(*) AS n, sum(k) AS s FROM spja.t GROUP BY d")
      assert(shuffles(a) == 0, "co-clustered aggregate must not shuffle")
      assert(a.as[(String, Long, Long)].collect().toSet.map(
        (x: (String, Long, Long)) => x._1 -> x._2) ==
        Set("p0" -> 30L, "p1" -> 30L, "p2" -> 30L))
    }
  }

  test("round 16: the OPERATOR door SPJs too — with " +
      "preserveDataGrouping set, PS.read plans the DSv2 indexed " +
      "table and a co-partitioned operator-API join drops both " +
      "exchanges; without it the long-pinned V1 path is unchanged") {
    val root = tmp("spj_op")
    PS.write(spark, s"$root/t1", (1L to 300L).map(k =>
      (k, s"p${k % 5}", s"a$k")).toDF("k", "d", "v"), "d", store)
    PS.write(spark, s"$root/t2", (1L to 200L).map(k =>
      (k, s"p${k % 5}", s"b$k")).toDF("k", "d", "w"), "d", store)
    def q() = PS.read(spark, s"$root/t1", store).as("a")
      .join(PS.read(spark, s"$root/t2", store).as("b"), "d")
      .groupBy("d").count()
    val prevMpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val (spjShuffles, spjRows) = withSpj {
      val df = q()
      (shuffles(df), df.as[(String, Long)].collect().toSet)
    }
    // default path (no opt-in): V1 HadoopFsRelation, shuffled plan
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (offShuffles, offRows) = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = q()
      assert(df.queryExecution.executedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution
          .FileSourceScanExec] == true) ||
        df.queryExecution.sparkPlan.toString.contains("FileScan"),
        "the default operator read must keep the V1 plan")
      (shuffles(df), df.as[(String, Long)].collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMpb)
    }
    assert(spjShuffles == 0,
      s"operator-door SPJ must drop both exchanges, got $spjShuffles")
    assert(offShuffles > 0, "no opt-in → the V1 shuffled plan")
    assert(spjRows == offRows && spjRows ==
      (0 to 4).map(i => (s"p$i", 60L * 40L)).toSet)
  }

  test("SPJ never fires where it would be wrong or useless: opt-in " +
      "off, partition column pruned from the output, or a " +
      "non-partition join key — plans stay correct") {
    val root = tmp("spj_gate")
    spark.conf.set("spark.sql.catalog.spjg",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.spjg.root", root)
    PS.write(spark, s"$root/t1", (1L to 60L).map(k =>
      (k, s"p${k % 3}", s"a$k")).toDF("k", "d", "v"), "d", store)
    PS.write(spark, s"$root/t2", (1L to 60L).map(k =>
      (k, s"p${k % 3}", s"b$k")).toDF("k", "d", "w"), "d", store)
    withSpj {
      // join on a NON-partition key: shuffles as usual, correct rows
      val j = spark.sql("SELECT a.k FROM spjg.t1 a JOIN spjg.t2 b " +
        "ON a.k = b.k")
      assert(shuffles(j) > 0)
      assert(j.as[Long].collect().toSet == (1L to 60L).toSet)
      // partition column absent from the read: no grouping claimed,
      // query correct
      val p = spark.sql("SELECT count(*) FROM spjg.t1")
      assert(p.as[Long].head() == 60L)
    }
  }
}
