package graft.streaming

import graft.operators.{ChangeFeed => CF, PartitionedSnapshots => PS}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Paced BOOTSTRAP of the CDC source (round-12 ask #2): with
  * `maxFilesPerBatch` the initial snapshot drains as file slices over
  * the pinned version's deterministic file list instead of one batch
  * bounded by table size. [[BootstrapOffset]] carries version + file
  * cursor + pinned total, so a restart mid-bootstrap resumes at the
  * cursor, exactly-once. */
class ChangeFeedBootstrapPaceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft_cfs_boot").toString + "/t"

  /** One row per partition, coalesced to one task → exactly one file
    * per partition dir, so file counts are deterministic. */
  private def seed(t: String, n: Int): Unit =
    PS.write(spark, t,
      (1 to n).map(i => (i.toLong, f"P$i%02d", s"v$i")).toDF("k", "d", "v")
        .coalesce(1), "d")

  test("BootstrapOffset json round-trips (what the checkpoint stores) " +
      "and plain version offsets still parse as bare numbers") {
    val b = BootstrapOffset(7L, 128L, 1000L)
    assert(BootstrapOffset.parse(b.json).contains(b))
    assert(BootstrapOffset.parse(LongOffset(7L).json).isEmpty)
    assert(BootstrapOffset.parse(" {\"bootstrap_v\":1,\"files\":0," +
      "\"of\":0} ").contains(BootstrapOffset(1L, 0L, 0L)))
  }

  test("unit: a 5-file bootstrap with maxFilesPerBatch=2 drains as " +
      "2+2+1 slices, pairwise disjoint, union = the snapshot; a " +
      "RESTART mid-bootstrap (offset json round-trip into a fresh " +
      "source) resumes at the file cursor; after the bootstrap the " +
      "stream switches to plain version CDC offsets") {
    val t = tmp()
    seed(t, 5)
    val src = new ChangeFeedSource(spark, Map("path" -> t,
      "maxFilesPerBatch" -> "2"))
    def lo(s: ChangeFeedSource,
        prev: org.apache.spark.sql.connector.read.streaming.Offset) =
      s.latestOffset(prev, s.getDefaultReadLimit)
    def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("k")).as[Long].collect().toSet

    val o1 = lo(src, null).asInstanceOf[BootstrapOffset]
    assert(o1 == BootstrapOffset(1L, 2L, 5L), s"got $o1")
    val b1 = ks(src.batchFor(None, o1))
    assert(b1 == Set(1L, 2L), s"sorted file order: $b1")

    val o2 = lo(src, o1).asInstanceOf[BootstrapOffset]
    assert(o2 == BootstrapOffset(1L, 4L, 5L))
    val b2 = ks(src.batchFor(Some(o1), o2))
    assert(b2 == Set(3L, 4L))

    // restart: a FRESH source resumes from the checkpointed json
    val src2 = new ChangeFeedSource(spark, Map("path" -> t,
      "maxFilesPerBatch" -> "2"))
    val o2r = BootstrapOffset.parse(o2.json).get
    val o3 = lo(src2, o2r).asInstanceOf[BootstrapOffset]
    assert(o3 == BootstrapOffset(1L, 5L, 5L))
    val b3 = ks(src2.batchFor(Some(o2r), o3))
    assert(b3 == Set(5L), "restart must resume at the file cursor")
    assert((b1 ++ b2 ++ b3) == (1L to 5L).toSet &&
      b1.intersect(b2).isEmpty && b2.intersect(b3).isEmpty,
      "slices must be exactly-once")

    // bootstrap complete + no new commits → the offset settles on the
    // plain version (one empty transition batch is fine; then stable)
    val o4 = lo(src2, o3)
    assert(o4.asInstanceOf[LongOffset].offset == 1L)
    assert(ks(src2.batchFor(Some(o3), o4.asInstanceOf[LongOffset]))
      .isEmpty)
    assert(lo(src2, o4) == o4, "caught up: offset must be stable")

    // a new commit: CDC from the bootstrap version, plain offsets
    PS.upsert(spark, t, Seq((9L, "P09", "new")).toDF("k", "d", "v"),
      Seq("k"), "d")
    val o5 = lo(src2, o4)
    assert(o5.asInstanceOf[LongOffset].offset == 2L)
    assert(ks(src2.batchFor(Some(o4.asInstanceOf[LongOffset]),
      o5.asInstanceOf[LongOffset])) == Set(9L))
  }

  test("a restart mid-bootstrap WITHOUT the option drains the " +
      "remainder as one slice (the cursor semantics hold either way); " +
      "a rewritten/vacuumed bootstrap version refuses naming the " +
      "remedy") {
    val t = tmp()
    seed(t, 4)
    val paced = new ChangeFeedSource(spark, Map("path" -> t,
      "maxFilesPerBatch" -> "1"))
    val o1 = paced.latestOffset(null, paced.getDefaultReadLimit)
      .asInstanceOf[BootstrapOffset]
    assert(o1 == BootstrapOffset(1L, 1L, 4L))
    // restart with the option removed
    val plain = new ChangeFeedSource(spark, Map("path" -> t))
    val o2 = plain.latestOffset(o1, plain.getDefaultReadLimit)
      .asInstanceOf[BootstrapOffset]
    assert(o2 == BootstrapOffset(1L, 4L, 4L),
      "the remainder drains as one slice")
    assert(plain.batchFor(Some(o1), o2)
      .select(col("k")).as[Long].collect().toSet == Set(2L, 3L, 4L))
    // checkpointed total no longer matching the version's files —
    // the bootstrap snapshot was vacuumed/rewritten mid-drain
    val e = intercept[IllegalStateException] {
      plain.batchFor(Some(o1), BootstrapOffset(1L, 3L, 9L))
    }
    assert(e.getMessage.contains("pinned 9") &&
      e.getMessage.contains("re-bootstrap"), e.getMessage)
  }

  test("e2e: AvailableNow + checkpoint drains a 4-file bootstrap as " +
      "four 1-file micro-batches; a commit landing MID-BOOTSTRAP " +
      "waits for the next run (the pin holds); the next run delivers " +
      "exactly the CDC rows; the consumer cursor pins the bootstrap " +
      "version from the first slice (safeVacuum protection for long " +
      "paced bootstraps)") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_boot_cp").toString
    seed(t, 4)
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def drain(inject: Boolean): Seq[Set[Long]] = {
      val seen = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
      val q = CF.readStream(spark, t, maxFilesPerBatch = Some(1L),
          consumerId = Some("boot-consumer"))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val ks = b.select(col("k")).as[Long].collect().toSet
          seen.synchronized { if (ks.nonEmpty) seen += ks }
          if (inject && injected.compareAndSet(false, true))
            PS.upsert(spark, t, Seq((9L, "P09", "mid"))
              .toDF("k", "d", "v"), Seq("k"), "d")
          ()
        })
        .start()
      assert(q.awaitTermination(120000), "run must stop when drained")
      seen.synchronized(seen.toVector)
    }
    // four singleton slices in sorted file order, the mid-run commit
    // NOT delivered (AvailableNow pinned the pointer at v1)
    assert(drain(inject = true) ==
      Seq(Set(1L), Set(2L), Set(3L), Set(4L)))
    // the cursor sits at the bootstrap version — committed from the
    // FIRST slice on, which is what makes safeVacuum retain the
    // pinned snapshot for the whole (possibly hours-long) bootstrap
    assert(CF.cursor(t, "boot-consumer").contains(1L))
    assert(drain(inject = false) == Seq(Set(9L)),
      "next run delivers exactly the mid-bootstrap commit")
    // v1 Source.commit fires at the NEXT batch's start, so the cursor
    // is a one-batch-lagging retention floor (lagging retains MORE —
    // always safe). A further batch advances it past the bootstrap run.
    PS.upsert(spark, t, Seq((10L, "P10", "later")).toDF("k", "d", "v"),
      Seq("k"), "d")
    assert(drain(inject = false) == Seq(Set(10L)))
    assert(CF.cursor(t, "boot-consumer").contains(2L),
      "the delivered v2 batch must be cursor-committed by the v3 batch")
    assert(drain(inject = false) == Seq.empty, "caught up")
  }
}
