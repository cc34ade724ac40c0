package graft.streaming

import graft.operators.{ChangeFeed => CF, PartitionedSnapshots => PS}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Native Trigger.AvailableNow on the CDC source
  * (SupportsTriggerAvailableNow): without it the engine WARNS and
  * falls back to single-batch execution with a documented
  * no-guarantee caveat; with it, prepare() pins the commit pointer at
  * query start and the run drains exactly the pinned backlog. */
class ChangeFeedAvailableNowSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft_cfs_an").toString + "/t"

  test("prepare pins the commit pointer; latestOffset caps at the pin " +
      "while reportLatestOffset keeps tracking the live table") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d") // v1
    val src = new ChangeFeedSource(spark, Map("path" -> t))
    src.prepareForTriggerAvailableNow() // pin at v1
    PS.upsert(spark, t, Seq((2L, "B", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d")                                                  // v2
    def v(o: org.apache.spark.sql.connector.read.streaming.Offset) =
      o.asInstanceOf[LongOffset].offset
    assert(v(src.latestOffset(null, src.getDefaultReadLimit)) == 1L,
      "admitted offsets must cap at the pinned pointer")
    assert(v(src.reportLatestOffset()) == 2L,
      "the progress-reporting offset tracks the live table")
    // an un-prepared source (regular triggers) admits the live pointer
    val live = new ChangeFeedSource(spark, Map("path" -> t))
    assert(v(live.latestOffset(null, live.getDefaultReadLimit)) == 2L)
  }

  test("e2e: a commit landing MID-RUN does not drain in the pinned " +
      "run; the next AvailableNow run delivers exactly it") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_an_cp").toString
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val seen = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def drain(inject: Boolean): Set[Long] = {
      seen.clear()
      val q = CF.readStream(spark, t)
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val ks = b.select(col("k")).as[Long].collect().toSet
          seen.synchronized { seen += ks }
          if (inject && injected.compareAndSet(false, true))
            PS.upsert(spark, t, Seq((2L, "B", "b1"))
              .toDF("k", "d", "v"), Seq("k"), "d")
          ()
        })
        .start()
      assert(q.awaitTermination(120000), "AvailableNow run must stop " +
        "once the pinned pointer is drained")
      seen.synchronized(seen.flatten.toSet)
    }
    assert(drain(inject = true) == Set(1L),
      "the mid-run commit must wait for the next run")
    assert(drain(inject = false) == Set(2L),
      "the next run delivers exactly the mid-run commit")
    assert(drain(inject = false) == Set.empty, "then caught up")
  }

  test("refuseDrift names case-ambiguous columns with WHERE the " +
      "ambiguity lives and the remedy that heals it: current-table " +
      "ambiguity -> restart re-pins; span-version ambiguity -> " +
      "re-bootstrap (a restart replays the same historical span)") {
    import org.apache.spark.sql.types._
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val src = new ChangeFeedSource(spark, Map("path" -> t))
    val pinned = Array(StructField("k", LongType),
      StructField("vx", StringType))
    // two case variants of vx, neither matching the pinned casing
    val drifted = StructType(Seq(StructField("k", LongType),
      StructField("VX", StringType), StructField("Vx", IntegerType)))
    val current = intercept[IllegalStateException] {
      src.refuseDrift(drifted, pinned)
    }
    assert(current.getMessage.contains("case-ambiguous columns: vx") &&
      current.getMessage.contains("table variants:"), current.getMessage)
    assert(current.getMessage.contains("Restart the stream"),
      "current-table ambiguity heals on restart (the re-pin adopts " +
        s"the actual names): ${current.getMessage}")
    val span = intercept[IllegalStateException] {
      src.refuseDrift(drifted, pinned, spanFromVersion = Some(3L))
    }
    assert(span.getMessage.contains("v3 variants:"), span.getMessage)
    assert(span.getMessage.contains("re-bootstrap") &&
      !span.getMessage.contains("Restart the stream"),
      "span ambiguity re-wedges every restart — the remedy is " +
        s"discarding the checkpoint: ${span.getMessage}")
    // a clean schema with an exact-cased match plus extra variants is
    // NOT ambiguous (the variants are ordinary added columns)
    src.refuseDrift(StructType(Seq(StructField("k", LongType),
      StructField("vx", StringType), StructField("VX", StringType))),
      pinned)
  }

  test("maxVersionsPerBatch paces over COMMITTED versions: a bare " +
      "data-owner dir in the number sequence (what an optimistic " +
      "commit leaves when its number fell behind the pointer) is " +
      "never logged as an end offset — the paced stream steps over " +
      "the gap instead of wedging on a manifest-less version") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_gap").toString
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    def drain(): Seq[Set[Long]] = {
      val seen = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
      val q = CF.readStream(spark, t, maxVersionsPerBatch = Some(1L))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val ks = b.select(col("k")).as[Long].collect().toSet
          seen.synchronized { if (ks.nonEmpty) seen += ks }
          ()
        })
        .start()
      assert(q.awaitTermination(120000))
      seen.synchronized(seen.toVector)
    }
    assert(drain() == Seq(Set(1L))) // bootstrap at v1
    // manufacture the gap: v2 is a bare reserved dir (a preparer's
    // claim whose commit landed under a later number), v3 and v4 are
    // real commits
    val bare = java.nio.file.Paths.get(s"$t/_snapshots/v00002")
    Files.createDirectories(bare)
    Files.write(bare.resolve(".reserved"), Array.emptyByteArray)
    PS.upsert(spark, t, Seq((3L, "A", "c1")).toDF("k", "d", "v"),
      Seq("k"), "d") // v3
    PS.upsert(spark, t, Seq((4L, "A", "d1")).toDF("k", "d", "v"),
      Seq("k"), "d") // v4
    // the paced drain must deliver both commits, one per batch, with
    // NO batch ever ending at the bare v2
    assert(drain() == Seq(Set(3L), Set(4L)),
      "pacing must step over the bare version number")
    assert(drain() == Seq.empty, "caught up")
  }

  test("maxVersionsPerBatch paces a backlog into per-version " +
      "micro-batches (Delta's maxFilesPerTrigger analogue); the " +
      "bootstrap batch is not paced; bad values refuse") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_pace").toString
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    def drain(): Seq[Set[Long]] = {
      val seen = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
      val q = CF.readStream(spark, t, maxVersionsPerBatch = Some(1L))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val ks = b.select(col("k")).as[Long].collect().toSet
          seen.synchronized { if (ks.nonEmpty) seen += ks }
          ()
        })
        .start()
      assert(q.awaitTermination(120000))
      seen.synchronized(seen.toVector)
    }
    assert(drain() == Seq(Set(1L)), "bootstrap: the snapshot, unpaced")
    // a 3-version backlog accumulates while the stream is down…
    (2 to 4).foreach(i => PS.upsert(spark, t,
      Seq((i.toLong, "A", s"v$i")).toDF("k", "d", "v"), Seq("k"), "d"))
    // …and drains as THREE one-version batches, in commit order,
    // exactly-once across the batch boundaries
    assert(drain() == Seq(Set(2L), Set(3L), Set(4L)),
      "the backlog must pace at one version per micro-batch")
    assert(drain() == Seq.empty, "caught up")
    val e = intercept[Exception] {
      CF.readStream(spark, t, maxVersionsPerBatch = Some(0L))
        .writeStream.option("checkpointLocation",
          Files.createTempDirectory("graft_cfs_pace0").toString)
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start().processAllAvailable()
    }
    assert(e.getMessage.contains("maxVersionsPerBatch") ||
      Option(e.getCause).exists(_.getMessage != null &&
        e.getCause.getMessage.contains("maxVersionsPerBatch")),
      e.getMessage)
  }
}
