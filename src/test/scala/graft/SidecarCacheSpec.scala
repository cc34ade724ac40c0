package graft

import graft.operators.{PartitionedSnapshots => PS}
import graft.plans.SidecarCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-15: the per-plan sidecar read amortizes. A published
  * zone-map/bloom sidecar is immutable per (dir, _SUCCESS mtime), so
  * [[SidecarCache]] serves the second and every later plan of the
  * same (table, version) from driver-cached rows — zero sidecar
  * parquet reads — while a REBUILD (new mtime) misses by key, so a
  * stale entry can never decide a file list. */
class SidecarCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString

  private def v1Files(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one V1 scan, got ${scans.size}")
    scans.head.metrics("numFiles").value
  }

  test("second identical plan is served from the cache: zero sidecar " +
      "loads, identical file list and rows") {
    val t = s"${tmp("scc_hit")}/t"
    // 3 partitions, disjoint k ranges → the zone map can isolate one
    PS.write(spark, t,
      Seq.tabulate(30)(i => (i.toLong, s"P${i / 10}", s"v$i"))
        .toDF("k", "d", "v"), "d")
    PS.buildZoneMap(spark, t, Seq("k"))
    def q() = PS.read(spark, t).filter(col("k") === 15L)
    val l0 = SidecarCache.loads.get
    val first = q()
    val f1 = v1Files(first)
    val r1 = first.as[(Long, String, String)].collect().toSet
    val l1 = SidecarCache.loads.get
    assert(l1 > l0, "first plan must load the sidecar")
    val h1 = SidecarCache.hits.get
    val second = q()
    val f2 = v1Files(second)
    val r2 = second.as[(Long, String, String)].collect().toSet
    assert(SidecarCache.loads.get == l1,
      "second identical plan must perform ZERO sidecar loads")
    assert(SidecarCache.hits.get > h1,
      "second identical plan must hit the cache")
    assert(f1 == f2 && f1 == 1L,
      s"both plans prune to the one matching file, got $f1/$f2")
    assert(r1 == r2 && r1 == Set((15L, "P1", "v15")))
  }

  test("a rebuild at the same version misses by mtime — cached rows " +
      "never serve a rewritten sidecar") {
    val t = s"${tmp("scc_mtime")}/t"
    PS.write(spark, t,
      Seq.tabulate(20)(i => (i.toLong, s"P${i / 10}", s"v$i"))
        .toDF("k", "d", "v"), "d")
    PS.buildZoneMap(spark, t, Seq("k"))
    def q() = PS.read(spark, t).filter(col("k") === 5L)
    assert(v1Files(q()) == 1L) // populate the cache
    val l0 = SidecarCache.loads.get
    assert(v1Files(q()) == 1L)
    assert(SidecarCache.loads.get == l0, "warm plan must not load")
    // rewrite the sidecar IN PLACE at the same version (same dir):
    // the _SUCCESS mtime moves, so the next plan must re-load
    Thread.sleep(5)
    PS.buildZoneMap(spark, t, Seq("k"))
    assert(v1Files(q()) == 1L, "rebuilt sidecar still prunes")
    assert(SidecarCache.loads.get > l0,
      "a rebuilt (new-mtime) sidecar must MISS the cache")
  }

  test("bloom sidecar probes run over cached rows too, with " +
      "unchanged pruning") {
    val t = s"${tmp("scc_bloom")}/t"
    PS.write(spark, t,
      Seq.tabulate(30)(i => (i.toLong, s"P${i / 10}", s"u$i"))
        .toDF("k", "d", "v"), "d")
    PS.buildBloomIndex(spark, t, Seq("v"))
    def q() = PS.read(spark, t).filter(col("v") === "u7")
    val first = q()
    val f1 = v1Files(first)
    assert(f1 == 1L, s"bloom prunes to the holding file, got $f1")
    val l1 = SidecarCache.loads.get
    val second = q()
    assert(v1Files(second) == 1L)
    assert(SidecarCache.loads.get == l1,
      "second bloom-pruned plan must perform zero sidecar loads")
    assert(second.select("k").as[Long].collect().toSet == Set(7L))
  }
}
