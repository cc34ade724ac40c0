package graft.streaming

import graft.operators.{ChangeFeed => CF, PartitionedSnapshots => PS}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** File-paced NON-bootstrap CDC batches (round-13 ask #2): with
  * `maxFilesPerBatch`, a version span whose changed partitions exceed
  * the file budget drains as changed-PARTITION slices
  * ([[SpanSliceOffset]]) — one INSERT OVERWRITE / wide compaction /
  * GDPR sweep no longer arrives as a single batch sized by the
  * rewrite. The partition is the exact slicing unit (keys never
  * migrate partitions), restarts resume the cursor exactly-once, and
  * plain offsets stay back-compatible. */
class ChangeFeedSpanPaceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft_cfs_span").toString + "/t"

  /** One row per partition, one file per partition dir. */
  private def writeAll(t: String, n: Int, tag: String): Unit =
    PS.write(spark, t,
      (1 to n).map(i => (i.toLong, f"P$i%02d", s"$tag$i"))
        .toDF("k", "d", "v").coalesce(1), "d")

  test("SpanSliceOffset json round-trips and neither plain nor " +
      "bootstrap offsets parse as spans") {
    val s = SpanSliceOffset(3L, 9L, 4L, 12L)
    assert(SpanSliceOffset.parse(s.json).contains(s))
    assert(SpanSliceOffset.parse(LongOffset(7L).json).isEmpty)
    assert(SpanSliceOffset.parse(BootstrapOffset(1L, 2L, 3L).json).isEmpty)
    assert(BootstrapOffset.parse(s.json).isEmpty)
  }

  test("FLOOR contract: a changed partition whose files alone exceed " +
      "maxFilesPerBatch still arrives as ONE slice — the partition is " +
      "the format's atomic diff unit, so the cursor advances by at " +
      "least one partition per batch and the stream never stalls") {
    val t = tmp()
    writeAll(t, 3, "x")           // v1
    writeAll(t, 3, "y")           // v2: every partition rewritten,
                                  // weight 2 (before+after file) each
    val src = new ChangeFeedSource(spark, Map("path" -> t,
      "keys" -> "k", "maxFilesPerBatch" -> "1"))
    def lo(prev: org.apache.spark.sql.connector.read.streaming.Offset) =
      src.latestOffset(prev, src.getDefaultReadLimit)
    def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("k")).as[Long].collect().toSet
    // budget 1 < every partition's weight 2: each slice carries
    // exactly one over-budget partition, max(budget, largest
    // partition) bounded — never zero progress, never a stall
    val start = LongOffset(1L)
    val o1 = lo(start).asInstanceOf[SpanSliceOffset]
    assert(o1 == SpanSliceOffset(1L, 2L, 1L, 3L), s"got $o1")
    assert(ks(src.batchFor(Some(start), o1)) == Set(1L))
    val o2 = lo(o1).asInstanceOf[SpanSliceOffset]
    assert(o2 == SpanSliceOffset(1L, 2L, 2L, 3L))
    assert(ks(src.batchFor(Some(o1), o2)) == Set(2L))
    val o3 = lo(o2).asInstanceOf[SpanSliceOffset]
    assert(o3 == SpanSliceOffset(1L, 2L, 3L, 3L))
    assert(ks(src.batchFor(Some(o2), o3)) == Set(3L))
    val o4 = lo(o3)
    assert(o4.asInstanceOf[LongOffset].offset == 2L)
  }

  test("unit: a full rewrite of 6 partitions with maxFilesPerBatch=4 " +
      "drains as 2+2+2 partition slices (weight 2 each: before+after " +
      "file), pairwise disjoint, union = the span's full CDC; a " +
      "restart mid-span resumes the cursor; afterwards plain offsets") {
    val t = tmp()
    writeAll(t, 6, "x")           // v1
    writeAll(t, 6, "y")           // v2: every partition rewritten
    val src = new ChangeFeedSource(spark, Map("path" -> t,
      "keys" -> "k", "maxFilesPerBatch" -> "4"))
    def lo(s: ChangeFeedSource,
        prev: org.apache.spark.sql.connector.read.streaming.Offset) =
      s.latestOffset(prev, s.getDefaultReadLimit)
    def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("k")).as[Long].collect().toSet

    val start = LongOffset(1L)
    val o1 = lo(src, start).asInstanceOf[SpanSliceOffset]
    assert(o1 == SpanSliceOffset(1L, 2L, 2L, 6L), s"got $o1")
    val b1 = src.batchFor(Some(start), o1)
    assert(b1.select(col("change_type")).distinct()
      .as[String].collect().toSet == Set("update"))
    assert(ks(b1) == Set(1L, 2L), "sorted partition order")

    val o2 = lo(src, o1).asInstanceOf[SpanSliceOffset]
    assert(o2 == SpanSliceOffset(1L, 2L, 4L, 6L))
    assert(ks(src.batchFor(Some(o1), o2)) == Set(3L, 4L))

    // restart: a FRESH source resumes from the checkpointed json
    val src2 = new ChangeFeedSource(spark, Map("path" -> t,
      "keys" -> "k", "maxFilesPerBatch" -> "4"))
    val o2r = SpanSliceOffset.parse(o2.json).get
    val o3 = lo(src2, o2r).asInstanceOf[SpanSliceOffset]
    assert(o3 == SpanSliceOffset(1L, 2L, 6L, 6L))
    assert(ks(src2.batchFor(Some(o2r), o3)) == Set(5L, 6L))

    // span complete + no new commits → settles on the plain version
    val o4 = lo(src2, o3)
    assert(o4.asInstanceOf[LongOffset].offset == 2L)
    assert(ks(src2.batchFor(Some(o3), o4.asInstanceOf[LongOffset]))
      .isEmpty)
    assert(lo(src2, o4) == o4, "caught up: offset must be stable")

    // a small follow-up commit stays a PLAIN offset (within budget)
    PS.upsert(spark, t, Seq((9L, "P09", "new")).toDF("k", "d", "v"),
      Seq("k"), "d")
    val o5 = lo(src2, o4)
    assert(o5.isInstanceOf[LongOffset] &&
      o5.asInstanceOf[LongOffset].offset == 3L,
      "a within-budget span must not pay the slice machinery")
    assert(ks(src2.batchFor(Some(o4.asInstanceOf[LongOffset]),
      o5.asInstanceOf[LongOffset])) == Set(9L))
  }

  test("a restart mid-span WITHOUT the option drains the remainder " +
      "as one slice; a vacuumed span endpoint refuses naming the " +
      "remedy") {
    val t = tmp()
    writeAll(t, 4, "x")
    writeAll(t, 4, "y")
    val paced = new ChangeFeedSource(spark, Map("path" -> t,
      "keys" -> "k", "maxFilesPerBatch" -> "2"))
    val o1 = paced.latestOffset(LongOffset(1L),
      paced.getDefaultReadLimit).asInstanceOf[SpanSliceOffset]
    assert(o1 == SpanSliceOffset(1L, 2L, 1L, 4L))
    val plain = new ChangeFeedSource(spark,
      Map("path" -> t, "keys" -> "k"))
    val o2 = plain.latestOffset(o1, plain.getDefaultReadLimit)
      .asInstanceOf[SpanSliceOffset]
    assert(o2 == SpanSliceOffset(1L, 2L, 4L, 4L),
      "the remainder drains as one slice")
    assert(plain.batchFor(Some(o1), o2)
      .select(col("k")).as[Long].collect().toSet == Set(2L, 3L, 4L))
    // checkpointed changed-partition count no longer matching the
    // span's — an endpoint was vacuumed/rewritten mid-drain
    val e = intercept[IllegalStateException] {
      plain.batchFor(Some(o1), SpanSliceOffset(1L, 2L, 3L, 9L))
    }
    assert(e.getMessage.contains("pinned 9") &&
      e.getMessage.contains("re-bootstrap"), e.getMessage)
  }

  test("e2e: AvailableNow + checkpoint — an INSERT OVERWRITE version " +
      "drains as four 1-partition micro-batches under a 2-file " +
      "budget; a commit landing mid-run waits (the pin holds); the " +
      "next run delivers it; exactly-once across restarts") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_span_cp").toString
    writeAll(t, 4, "x")           // v1: the bootstrap snapshot
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def drain(inject: Boolean): Seq[Set[Long]] = {
      val seen = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
      val q = CF.readStream(spark, t, keys = Seq("k"),
          maxFilesPerBatch = Some(2L))
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
    // bootstrap: 4 files paced 2 per batch
    assert(drain(inject = false) == Seq(Set(1L, 2L), Set(3L, 4L)))
    // the overwrite: every partition rewritten with new values
    writeAll(t, 4, "y")           // v2
    // span v1→v2: 4 changed partitions, weight 2 each, budget 2 →
    // one partition per micro-batch; the mid-run commit waits
    assert(drain(inject = true) ==
      Seq(Set(1L), Set(2L), Set(3L), Set(4L)))
    assert(drain(inject = false) == Seq(Set(9L)),
      "next run delivers exactly the mid-span commit")
    assert(drain(inject = false) == Seq.empty, "caught up")
  }

  test("a CDC span — and its file-paced slices — confined to " +
      "partitions that PREDATE a column evolution serves the pinned " +
      "column as NULL, never a false drift refusal: the version-" +
      "schema gates decide drift on full schemas, the batch frame " +
      "only reads the changed dirs") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a"), (2L, "B", "b"),
      (3L, "C", "c")).toDF("k", "d", "v").coalesce(1), "d")    // v1
    // the evolution lands in partition B only — A and C keep their
    // pre-evolution footers
    PS.upsert(spark, t, Seq((2L, "B", "b2", 7))
      .toDF("k", "d", "v", "y"), Seq("k"), "d")                // v2
    val cp = Files.createTempDirectory("graft_cfs_evnull").toString
    def drain(): Vector[Set[(Long, Option[Int])]] = {
      val seen =
        new scala.collection.mutable.ArrayBuffer[Set[(Long, Option[Int])]]()
      val q = CF.readStream(spark, t, keys = Seq("k"),
          maxFilesPerBatch = Some(2L))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val rows = b.select(col("k"), col("y"))
            .as[(Long, Option[Int])].collect().toSet
          seen.synchronized { if (rows.nonEmpty) seen += rows }
          ()
        })
        .start()
      assert(q.awaitTermination(120000), "run must stop when drained")
      seen.synchronized(seen.toVector)
    }
    // bootstrap at v2: pre-evolution rows read y as null
    assert(drain().flatten.toSet == Set((1L, None), (2L, Some(7)),
      (3L, None)))
    // v3 rewrites ONLY the two pre-evolution partitions: no changed
    // dir of the span carries y, and the file budget (weight 2 per
    // partition) slices the span one partition per micro-batch
    PS.upsert(spark, t, Seq((1L, "A", "a3"), (3L, "C", "c3"))
      .toDF("k", "d", "v"), Seq("k"), "d")                     // v3
    val got = drain()
    assert(got == Vector(Set((1L, None: Option[Int])),
      Set((3L, None: Option[Int]))),
      s"pre-evolution slices must serve y as null, got $got")
  }

  test("a span endpoint vacuumed mid-drain surfaces the guided " +
      "refusal in latestOffset on restart — never a silent stall or " +
      "a wrong recomputed span") {
    val t = tmp()
    writeAll(t, 6, "x")           // v1
    writeAll(t, 6, "y")           // v2 (full rewrite)
    writeAll(t, 6, "z")           // v3 (full rewrite — v1, v2 now
                                  // unreferenced by any retained
                                  // manifest)
    PS.vacuum(t, keep = 1)        // drops v1 and v2
    val src = new ChangeFeedSource(spark, Map("path" -> t,
      "keys" -> "k", "maxFilesPerBatch" -> "4"))
    // a checkpoint pinned mid-span over the vacuumed (1, 2] span:
    // the recomputed changed-partition list can no longer match the
    // pinned total — latestOffset must raise the guided error, not
    // emit a non-advancing (or wrong) offset that getBatch never sees
    val prev = SpanSliceOffset(1L, 2L, 2L, 6L)
    val e = intercept[IllegalStateException] {
      src.latestOffset(prev, src.getDefaultReadLimit)
    }
    assert(e.getMessage.contains("pinned 6") &&
      e.getMessage.contains("discard the checkpoint"), e.getMessage)
  }
}
