package graft.streaming

import graft.operators.{ChangeFeed => CF, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `schemaTrackingLocation` (round-12 stretch): the pinned schema
  * persists at a configured location, and a drift refusal RECORDS the
  * re-pin decision — so a retype's re-bootstrap remedy executes by
  * plain RESTART instead of checkpoint surgery: the restarted stream
  * serves the current snapshot as one insert-batch (keyed sinks
  * dedupe) and continues on plain CDC offsets. */
class ChangeFeedSchemaTrackingSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp(n: String) =
    Files.createTempDirectory(s"graft_cfs_$n").toString

  private def causes(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("retype with schemaTrackingLocation: the refusal records the " +
      "re-pin, the RESTARTED stream re-bootstraps ITSELF from the " +
      "current snapshot exactly once, and later commits flow as plain " +
      "CDC — no checkpoint surgery") {
    val t = s"${tmp("trk")}/t"
    val loc = tmp("trk_loc")
    val cp = tmp("trk_cp")
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v")) // v1
    val seen = new scala.collection.mutable.ArrayBuffer[
      Set[(Long, String, String)]]()
    def drain(): Unit = {
      val q = CF.readStream(spark, t, keys = Seq("k"),
          schemaTrackingLocation = Some(loc))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val rows = b.select(col("k"), col("v").cast("string"),
            col("change_type")).as[(Long, String, String)]
            .collect().toSet
          seen.synchronized { if (rows.nonEmpty) seen += rows }
          ()
        })
        .start()
      assert(q.awaitTermination(120000))
    }
    drain() // bootstrap on the tracked pin (v: string)
    assert(seen.synchronized(seen.toVector) ==
      Vector(Set((1L, "a", "insert"))))
    // the pin persisted at the tracking location
    assert(Files.exists(java.nio.file.Paths.get(loc, "schema")))

    // RETYPE: full-copy overwrite flips v from string to int (v2)
    Snapshots.write(spark, t, Seq((1L, 5), (2L, 7)).toDF("k", "v"))
    // the drifted run refuses ONCE — but with tracking the message
    // promises a restart executes the remedy, and the decision lands
    // on disk (new pin + re-bootstrap floor)
    val e = intercept[Throwable] { drain() }
    assert(causes(e).contains("retyped columns: v") &&
      causes(e).contains("RESTART the stream") &&
      causes(e).contains("re-bootstrap itself") &&
      !causes(e).contains("discard"), causes(e))
    assert(Files.exists(java.nio.file.Paths.get(loc, "rebootstrap")))

    // the plain restart: the stream re-pins from the tracking store
    // (v: int now) and serves the CURRENT snapshot as inserts —
    // exactly the manual re-bootstrap, executed by config
    seen.synchronized(seen.clear())
    drain()
    assert(seen.synchronized(seen.toVector) ==
      Vector(Set((1L, "5", "insert"), (2L, "7", "insert"))),
      s"re-bootstrap batch wrong: ${seen.synchronized(seen.toVector)}")

    // later commits flow as PLAIN CDC — the re-bootstrap fired once
    Snapshots.write(spark, t,
      Seq((1L, 5), (2L, 7), (3L, 9)).toDF("k", "v")) // v3
    seen.synchronized(seen.clear())
    drain()
    assert(seen.synchronized(seen.toVector) ==
      Vector(Set((3L, "9", "insert"))),
      "after the floor the stream must be ordinary CDC: " +
        s"${seen.synchronized(seen.toVector)}")
    // and an idle restart replays nothing
    seen.synchronized(seen.clear())
    drain()
    assert(seen.synchronized(seen.isEmpty))
  }

  test("PACED re-bootstrap: maxFilesPerBatch + a recorded floor " +
      "together — the restarted stream drains the re-bootstrap " +
      "snapshot as file slices from cursor 0 (a completed PREVIOUS " +
      "bootstrap's cursor must not carry into the new version) and " +
      "no row of the re-bootstrap is skipped") {
    import graft.operators.{PartitionedSnapshots => PS}
    val t = s"${tmp("trkp")}/t"
    val loc = tmp("trkp_loc")
    val cp = tmp("trkp_cp")
    // 3 partitions, one file each (coalesce(1)) → a 3-file bootstrap
    PS.write(spark, t,
      Seq((1L, "A", "a"), (2L, "B", "b"), (3L, "C", "c"))
        .toDF("k", "d", "v").coalesce(1), "d")
    val seen = new scala.collection.mutable.ArrayBuffer[
      Set[(Long, String)]]()
    def drain(): Unit = {
      val q = CF.readStream(spark, t, keys = Seq("k"),
          maxFilesPerBatch = Some(1L),
          schemaTrackingLocation = Some(loc))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          val rows = b.select(col("k"), col("v").cast("string"))
            .as[(Long, String)].collect().toSet
          seen.synchronized { if (rows.nonEmpty) seen += rows }
          ()
        })
        .start()
      assert(q.awaitTermination(120000))
    }
    drain() // paced bootstrap: three 1-file slices
    assert(seen.synchronized(seen.toVector) ==
      Vector(Set((1L, "a")), Set((2L, "b")), Set((3L, "c"))))

    // RETYPE v from string to int via a partitioned rewrite: the
    // partitioned format refuses retypes, so simulate with a fresh
    // full-table write carrying the new type (write() rebuilds all
    // partitions)
    PS.write(spark, t,
      Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30), (4L, "D", 40))
        .toDF("k", "d", "v").coalesce(1), "d") // v2, 4 files
    val e = intercept[Throwable] { drain() }
    assert(causes(e).contains("retyped columns: v") &&
      causes(e).contains("re-bootstrap itself"), causes(e))

    // restart: the re-bootstrap must run as PACED slices of the NEW
    // version starting at file 0 — all four rows delivered exactly
    // once, none skipped by a stale cursor
    seen.synchronized(seen.clear())
    drain()
    val slices = seen.synchronized(seen.toVector)
    assert(slices.flatten.toSet ==
      Set((1L, "10"), (2L, "20"), (3L, "30"), (4L, "40")),
      s"re-bootstrap lost rows: $slices")
    assert(slices.size == 4 && slices.forall(_.size == 1),
      s"re-bootstrap must pace as 1-file slices: $slices")
    // and the stream continues as plain CDC afterwards
    PS.upsert(spark, t, Seq((5L, "E", 50)).toDF("k", "d", "v"),
      Seq("k"), "d")
    seen.synchronized(seen.clear())
    drain()
    assert(seen.synchronized(seen.toVector) == Vector(Set((5L, "50"))))
  }

  test("the tracked pin is STABLE across restarts: a widen does not " +
      "shift the output schema mid-lifecycle (columns added to the " +
      "table stay projected away even after restart, until a drift " +
      "refusal re-pins)") {
    import graft.operators.{PartitionedSnapshots => PS}
    val t = s"${tmp("trkw")}/t"
    val loc = tmp("trkw_loc")
    val cp = tmp("trkw_cp")
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val cols = new scala.collection.mutable.ArrayBuffer[Seq[String]]()
    def drain(): Unit = {
      val q = CF.readStream(spark, t,
          schemaTrackingLocation = Some(loc))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          if (b.count() > 0)
            cols.synchronized { cols += b.columns.toSeq }
          ()
        })
        .start()
      assert(q.awaitTermination(120000))
    }
    drain() // bootstrap, pins (k, d, v, change_type)
    // widen the table mid-lifecycle
    PS.upsert(spark, t, Seq((2L, "B", "b1", "w2"))
      .toDF("k", "d", "v", "w"), Seq("k"), "d")
    drain() // restart — WITHOUT tracking this would re-pin and emit w
    assert(cols.synchronized(cols.toVector).nonEmpty &&
      cols.synchronized(cols.toVector).forall(
        _ == Seq("k", "d", "v", "change_type")),
      s"tracked pin must stay stable: ${cols.synchronized(cols.toVector)}")
  }
}
