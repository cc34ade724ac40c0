package graft

import graft.operators.{ChangeFeed => CF, PartitionedSnapshots => PS, Snapshots}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pull-based change-feed consumption: snapshot bootstrap, incremental
  * drains, exactly-once re-delivery on crash (poll without commit),
  * forward-only cursors, multi-consumer independence, Latest start, the
  * full-copy format, and the retention-horizon failure mode. */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("graft_cf").toString + "/t"

  private def drain(t: String, cid: String): Seq[(Long, String, String)] = {
    val b = CF.poll(spark, t, cid).get
    val rows = b.df.select(col("k"), col("v"), col("change_type"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    CF.commit(t, cid, b.toVersion)
    rows
  }

  test("snapshot bootstrap, then incremental drains; caught-up poll " +
      "is None; commit is per-consumer") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1"), (2L, "B", "b1"))
      .toDF("k", "d", "v"), "d")
    PS.upsert(spark, t, Seq((2L, "B", "b2"), (3L, "A", "c1"))
      .toDF("k", "d", "v"), Seq("k"), "d")

    // bootstrap sees the CURRENT state as inserts (v2), not history
    assert(drain(t, "c1") ==
      Seq((1L, "a1", "insert"), (2L, "b2", "insert"), (3L, "c1", "insert")))
    assert(CF.poll(spark, t, "c1").isEmpty, "caught up -> None")

    // new commits drain incrementally
    PS.delete(spark, t, col("k") === 1L, "d")
    PS.upsert(spark, t, Seq((3L, "A", "c2")).toDF("k", "d", "v"),
      Seq("k"), "d")
    assert(drain(t, "c1") ==
      Seq((1L, "a1", "delete"), (3L, "c2", "update")))
    assert(CF.poll(spark, t, "c1").isEmpty)

    // a second consumer starting now bootstraps from the current state
    assert(drain(t, "c2") ==
      Seq((2L, "b2", "insert"), (3L, "c2", "insert")))
    assert(CF.consumers(t) == Map("c1" -> 4L, "c2" -> 4L))
  }

  test("preImages poll: updates split into Delta-CDF " +
      "update_preimage/update_postimage pairs; inserts and deletes " +
      "keep one row; a value->null update carries null in the " +
      "postimage, not the resurrected old value") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", Some("a1")), (2L, "A", Some("b1")),
      (3L, "B", Some("c1"))).toDF("k", "d", "v"), "d")         // v1
    PS.upsert(spark, t, Seq((2L, "A", Some("b2")), (3L, "B", None),
      (4L, "B", Some("d1"))).toDF("k", "d", "v"), Seq("k"), "d") // v2
    PS.delete(spark, t, col("k") === 1L, "d")                  // v3
    val b = CF.poll(spark, t, "pi", startFrom = CF.FromVersion(1L),
      preImages = true).get
    val rows = b.df.select(col("k"), col("v"), col("change_type"))
      .as[(Long, Option[String], String)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    assert(rows == Seq(
      (1L, Some("a1"), "delete"),
      (2L, Some("b2"), "update_postimage"),
      (2L, Some("b1"), "update_preimage"),
      (3L, None, "update_postimage"),       // nulling an update column
      (3L, Some("c1"), "update_preimage"),  // …pre-image keeps the value
      (4L, Some("d1"), "insert")), s"$rows")
    // default poll (what mirror consumes) is unchanged: one row per key
    val plain = CF.poll(spark, t, "pi", startFrom = CF.FromVersion(1L))
      .get.df.select(col("k"), col("change_type"))
      .as[(Long, String)].collect().toSet
    assert(plain == Set((1L, "delete"), (2L, "update"), (3L, "update"),
      (4L, "insert")))
  }

  test("at-least-once re-delivery: poll without commit returns the " +
      "same batch again; commit is forward-only and pointer-bounded") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val b1 = CF.poll(spark, t, "c").get
    CF.commit(t, "c", b1.toVersion)
    PS.upsert(spark, t, Seq((1L, "A", "a2")).toDF("k", "d", "v"),
      Seq("k"), "d")

    val p1 = CF.poll(spark, t, "c").get
    val p2 = CF.poll(spark, t, "c").get // crash-before-commit replay
    assert(p1.fromVersion == p2.fromVersion && p1.toVersion == p2.toVersion)
    assert(TestSpark.rows(p1.df) == TestSpark.rows(p2.df))
    CF.commit(t, "c", p2.toVersion)

    intercept[IllegalArgumentException] {
      CF.commit(t, "c", p2.toVersion - 1) // backwards
    }
    intercept[IllegalArgumentException] {
      CF.commit(t, "c", p2.toVersion + 10) // beyond the pointer
    }
  }

  test("Latest start: first poll is an empty batch pinned at current; " +
      "only future changes flow") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val b = CF.poll(spark, t, "tail", startFrom = CF.Latest).get
    assert(b.df.isEmpty && b.fromVersion == b.toVersion)
    CF.commit(t, "tail", b.toVersion)
    PS.upsert(spark, t, Seq((2L, "B", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d")
    assert(drain(t, "tail") == Seq((2L, "b1", "insert")))
  }

  test("Latest start converges even when the consumer never commits " +
      "the empty bootstrap batch (pin committed inside poll)") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val b = CF.poll(spark, t, "lazy", startFrom = CF.Latest).get
    assert(b.df.isEmpty)
    // consumer skips committing empty batches — the second poll must be
    // None (caught up), not the bootstrap batch again, forever
    assert(CF.poll(spark, t, "lazy", startFrom = CF.Latest).isEmpty)
    PS.upsert(spark, t, Seq((2L, "B", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d")
    assert(drain(t, "lazy") == Seq((2L, "b1", "insert")))
  }

  test("full-copy Snapshots tables feed through the same API with " +
      "explicit keys") {
    val t = tmp()
    Snapshots.write(spark, t, Seq((10L, "x")).toDF("k", "v"))
    val b = CF.poll(spark, t, "c", keys = Seq("k")).get
    assert(b.df.count() == 1)
    CF.commit(t, "c", b.toVersion)
    Snapshots.upsert(spark, t, Seq((10L, "x2"), (11L, "y"))
      .toDF("k", "v"), Seq("k"))
    val b2 = CF.poll(spark, t, "c", keys = Seq("k")).get
    assert(b2.df.select(col("k"), col("change_type"))
      .as[(Long, String)].collect().toSet ==
      Set((10L, "update"), (11L, "insert")))
  }

  test("keys come from the recorded layout when omitted; a keyless " +
      "table refuses with instructions") {
    val t = tmp()
    Snapshots.write(spark, t, Seq((10L, "x")).toDF("k", "v"))
    CF.commit(t, "c", 1L)
    Snapshots.upsert(spark, t, Seq((11L, "y")).toDF("k", "v"), Seq("k"))
    val e = intercept[UnsupportedOperationException] {
      CF.poll(spark, t, "c")
    }
    assert(e.getMessage.contains("no key columns"), e.getMessage)
  }

  test("safeVacuum widens retention to the slowest consumer's cursor; " +
      "after it catches up, reclamation proceeds") {
    val t = tmp()
    // single partition value → every upsert rewrites it, so superseded
    // versions own nothing and are reclaimable the moment retention
    // allows
    PS.write(spark, t, Seq((1L, "A", "v1")).toDF("k", "d", "v"), "d")
    CF.commit(t, "slow", 1L)
    (2 to 5).foreach(i => PS.upsert(spark, t,
      Seq((1L, "A", s"v$i")).toDF("k", "d", "v"), Seq("k"), "d"))

    assert(CF.safeVacuum(t, keep = 1).isEmpty,
      "nothing reclaimable while the slow consumer still needs v1")
    val b = CF.poll(spark, t, "slow").get // still drains fine
    assert(b.fromVersion == 1L && b.toVersion == 5L)
    assert(b.df.select(col("v")).as[String].collect().toSeq == Seq("v5"))
    CF.commit(t, "slow", b.toVersion)

    val dropped = CF.safeVacuum(t, keep = 1)
    assert(dropped.nonEmpty && dropped.forall(_ < 5L),
      s"caught-up consumer unblocks reclamation: $dropped")
  }

  test("streaming ingest to consumer e2e: streamCommit micro-batches " +
      "become drainable change batches") {
    val base = Files.createTempDirectory("graft_cf_sc").toString
    val t = s"$base/t"; val in = s"$base/in"; val cp = s"$base/cp"
    Seq((1L, "p1", "a")).toDF("k", "d", "v").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    def drainStream(): Unit = {
      val q = PS.streamCommit(spark,
        spark.readStream.schema(schema).parquet(in), t, Seq("k"), "d", cp)
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    drainStream()
    assert(drain(t, "idx") == Seq((1L, "a", "insert"))) // bootstrap
    Seq((1L, "p1", "a2"), (2L, "p2", "b")).toDF("k", "d", "v")
      .write.mode("append").parquet(in)
    drainStream()
    assert(drain(t, "idx") ==
      Seq((1L, "a2", "update"), (2L, "b", "insert")))
    assert(CF.poll(spark, t, "idx").isEmpty, "caught up with the stream")
  }

  test("streaming replication chain: streamCommit micro-batches flow " +
      "through mirror into a replica table") {
    val base = Files.createTempDirectory("graft_cf_chain").toString
    val src = s"$base/src"; val rep = s"$base/rep"
    val in = s"$base/in"; val cp = s"$base/cp"
    Seq((1L, "p1", "a")).toDF("k", "d", "v").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    def ingestAndMirror(): Unit = {
      val q = PS.streamCommit(spark,
        spark.readStream.schema(schema).parquet(in), src,
        Seq("k"), "d", cp)
      assert(q.awaitTermination(120000))
      CF.mirror(spark, src, "rep", rep, partCol = Some("d"),
        keys = Seq("k"))
      ()
    }
    ingestAndMirror()
    Seq((1L, "p1", "a2"), (2L, "p2", "b")).toDF("k", "d", "v")
      .write.mode("append").parquet(in)
    ingestAndMirror()
    assert(PS.read(spark, rep).select(col("k"), col("v"))
      .as[(Long, String)].collect().toSet == Set((1L, "a2"), (2L, "b")))
    assert(TestSpark.rows(PS.read(spark, rep)) ==
      TestSpark.rows(PS.read(spark, src)), "replica == source")
  }

  test("mirror: downstream snapshot table tracks the source across " +
      "insert/update/delete; crash before cursor commit re-applies " +
      "idempotently") {
    val base = Files.createTempDirectory("graft_cf_mir").toString
    val src = s"$base/src"; val dst = s"$base/dst"
    def dstRows() = PS.read(spark, dst).select(col("k"), col("v"))
      .as[(Long, String)].collect().toSet

    PS.write(spark, src, Seq((1L, "A", "a1"), (2L, "B", "b1"))
      .toDF("k", "d", "v"), "d")
    // bootstrap
    assert(CF.mirror(spark, src, "rep", dst,
      partCol = Some("d"), keys = Seq("k")).isDefined)
    assert(dstRows() == Set((1L, "a1"), (2L, "b1")))
    assert(CF.mirror(spark, src, "rep", dst,
      partCol = Some("d"), keys = Seq("k")).isEmpty, "caught up")

    // update + insert + delete propagate in ONE merge
    PS.upsert(spark, src, Seq((2L, "B", "b2"), (3L, "A", "c1"))
      .toDF("k", "d", "v"), Seq("k"), "d")
    PS.delete(spark, src, col("k") === 1L, "d")
    assert(CF.mirror(spark, src, "rep", dst,
      partCol = Some("d"), keys = Seq("k")).isDefined)
    assert(dstRows() == Set((2L, "b2"), (3L, "c1")))

    // crash replay: poll+apply WITHOUT commit, then mirror again — the
    // keyed merge makes the re-apply content-idempotent
    PS.upsert(spark, src, Seq((3L, "A", "c2")).toDF("k", "d", "v"),
      Seq("k"), "d")
    val b = CF.poll(spark, src, "rep").get // simulate: drained but…
    assert(b.df.count() == 1)              // …crashed before commit
    assert(CF.mirror(spark, src, "rep", dst,
      partCol = Some("d"), keys = Seq("k")).isDefined)      // re-delivers + applies
    assert(dstRows() == Set((2L, "b2"), (3L, "c2")))
    assert(CF.mirror(spark, src, "rep", dst,
      partCol = Some("d"), keys = Seq("k")).isEmpty)
  }

  test("property: over a random upsert/delete sequence, the mirrored " +
      "replica equals the source at every drain point") {
    val rnd = new scala.util.Random(42L)
    val base = Files.createTempDirectory("graft_cf_prop").toString
    val src = s"$base/src"; val rep = s"$base/rep"
    val parts = Seq("A", "B", "C")
    // partition key derived from the row key — stable per key, the
    // documented upsert contract (cross-partition key moves are
    // refused by merge/updateWhere and out of upsert's contract)
    def randRows(n: Int) = (1 to n).map { _ =>
      val k = rnd.nextInt(20).toLong
      (k, parts((k % 3).toInt), s"v${rnd.nextInt(1000)}")
    }.toDF("k", "d", "v")

    PS.write(spark, src, randRows(6), "d")
    (1 to 12).foreach { i =>
      if (rnd.nextInt(4) == 0)
        PS.delete(spark, src, col("k") === rnd.nextInt(20).toLong, "d")
      else
        PS.upsert(spark, src, randRows(1 + rnd.nextInt(4)), Seq("k"), "d")
      if (i % 3 == 0) { // drain every few ops — batches span versions
        CF.mirror(spark, src, "rep", rep, partCol = Some("d"),
          keys = Seq("k"))
        assert(TestSpark.rows(PS.read(spark, rep)) ==
          TestSpark.rows(PS.read(spark, src)),
          s"replica diverged after op $i")
      }
    }
    CF.mirror(spark, src, "rep", rep, partCol = Some("d"),
      keys = Seq("k"))
    assert(TestSpark.rows(PS.read(spark, rep)) ==
      TestSpark.rows(PS.read(spark, src)))
  }

  test("streaming CDC source: readStream bootstraps the snapshot as " +
      "inserts, tails commits across restarts exactly-once, and " +
      "startingVersion=latest skips the backlog") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_cp").toString
    PS.write(spark, t, Seq((1L, "A", "a1"), (2L, "B", "b1"))
      .toDF("k", "d", "v"), "d")                              // v1
    def drainStream(): Seq[(Long, Option[String], String)] = {
      val sink = new scala.collection.mutable.ArrayBuffer[
        Seq[(Long, Option[String], String)]]()
      val q = CF.readStream(spark, t)
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          sink += b.select(col("k"), col("v"), col("change_type"))
            .as[(Long, Option[String], String)].collect().toSeq
          ()
        })
        .start()
      q.awaitTermination()
      sink.toSeq.flatten.sortBy(_._1)
    }
    // first run: snapshot bootstrap as inserts
    assert(drainStream() == Seq((1L, Some("a1"), "insert"),
      (2L, Some("b1"), "insert")))
    // caught up: a re-run delivers nothing
    assert(drainStream().isEmpty)
    // two commits land; the next run (restart across the checkpoint)
    // drains exactly their CDC rows, once
    PS.upsert(spark, t, Seq((2L, "B", "b2"), (3L, "A", "c1"))
      .toDF("k", "d", "v"), Seq("k"), "d")                    // v2
    PS.delete(spark, t, col("k") === 1L, "d")                 // v3
    assert(drainStream() == Seq((1L, Some("a1"), "delete"),
      (2L, Some("b2"), "update"), (3L, Some("c1"), "insert")))
    assert(drainStream().isEmpty)

    // startingVersion=latest: a FRESH stream (new checkpoint) skips
    // the whole backlog and tails only post-start commits
    val cp2 = Files.createTempDirectory("graft_cfs_cp2").toString
    def drainLatest(): Seq[(Long, String)] = {
      val sink = new scala.collection.mutable.ArrayBuffer[
        Seq[(Long, String)]]()
      val q = CF.readStream(spark, t, latestOnly = true)
        .writeStream
        .option("checkpointLocation", cp2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          sink += b.select(col("k"), col("change_type"))
            .as[(Long, String)].collect().toSeq
          ()
        })
        .start()
      q.awaitTermination()
      sink.toSeq.flatten.sortBy(_._1)
    }
    assert(drainLatest().isEmpty, "latest start must skip the backlog")
    PS.upsert(spark, t, Seq((4L, "B", "d1")).toDF("k", "d", "v"),
      Seq("k"), "d")                                          // v4
    assert(drainLatest() == Seq((4L, "insert")))
  }

  test("streaming retention handshake: consumerId mirrors committed " +
      "offsets into a registered cursor (lagging at most one completed " +
      "batch), so consumer-aware vacuum retains what the stream still " +
      "needs") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_ret").toString
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    def drainOnce(): Unit = {
      val q = CF.readStream(spark, t, consumerId = Some("stream-1"))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.count(); ()
        })
        .start()
      q.awaitTermination()
    }
    drainOnce() // bootstrap: the engine commits a source's offset when
                // the NEXT batch starts, so the cursor may lag one run
    PS.upsert(spark, t, Seq((2L, "A", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d")
    PS.upsert(spark, t, Seq((3L, "A", "c1")).toDF("k", "d", "v"),
      Seq("k"), "d")
    drainOnce()
    val cur = CF.cursor(t, "stream-1")
    assert(cur.exists(_ >= 1L),
      s"stream offset not mirrored into the consumer cursor: $cur")
    assert(cur.exists(_ <= 3L), s"cursor ran AHEAD of processing: $cur")
    // the registered cursor makes safeVacuum retain the stream's
    // resume point; the stream picks up cleanly afterwards
    CF.safeVacuum(t, keep = 1)
    PS.upsert(spark, t, Seq((4L, "A", "d1")).toDF("k", "d", "v"),
      Seq("k"), "d")
    drainOnce()
    assert(CF.cursor(t, "stream-1").exists(_ >= 3L),
      s"cursor must advance as batches complete: ${CF.cursor(t, "stream-1")}")
  }

  test("streaming CDC source survives an EMPTY-PRIMED first version: " +
      "bootstrap at the empty commit, then tail the first data commit " +
      "as inserts (pre-fix the batch threw 'no snapshot' and a pull " +
      "consumer was told to reset)") {
    val t = tmp()
    PS.initTable(t, "d", spark.range(0).select(col("id").as("k"),
      lit("").as("d"), lit("").as("v")).schema.json)
    // v1: committed, manifest present and EMPTY
    PS.upsert(spark, t, spark.range(0).select(col("id").as("k"),
      lit("x").as("d"), lit("y").as("v")), Seq("k"), "d")
    assert(PS.hasManifest(t, 1L) && PS.manifest(t, 1L).isEmpty)
    val cp = Files.createTempDirectory("graft_cfs_empty").toString
    def drain(): Seq[(Long, String)] = {
      val sink = new scala.collection.mutable.ArrayBuffer[
        Seq[(Long, String)]]()
      val q = CF.readStream(spark, t, keys = Seq("k"))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          sink += b.select(col("k"), col("change_type"))
            .as[(Long, String)].collect().toSeq
          ()
        })
        .start()
      q.awaitTermination()
      sink.toSeq.flatten.sortBy(_._1)
    }
    assert(drain().isEmpty, "bootstrap of the empty version is empty")
    PS.upsert(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"),
      Seq("k"), "d") // v2: first data
    assert(drain() == Seq((1L, "insert")),
      "the empty→data CDC batch must deliver, not die as 'no snapshot'")
  }

  test("streaming CDC source tails a table on a NON-LOCAL CommitStore" +
      " binding via .option(store); missing/unknown bindings refuse " +
      "loudly naming the cause") {
    import graft.operators.CommitStore
    // the non-local binding a snapshot TABLE can fully live on is one
    // whose namespace Spark's parquet data plane shares — the Hadoop
    // FileSystem binding (an object binding hosts control files in its
    // own keyspace, so it can't serve a table's data-dir listings);
    // register a CONFIGURED instance under a name, the way a real
    // deployment would bind an authenticated client
    val had = CommitStore.hadoop()
    CommitStore.register("cfs-test-hdfs", had)
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d",
      had)
    val cp = Files.createTempDirectory("graft_cfs_store").toString
    def drain(): Seq[(Long, String)] = {
      val sink = new scala.collection.mutable.ArrayBuffer[
        Seq[(Long, String)]]()
      val q = CF.readStream(spark, t, keys = Seq("k"),
        storeName = Some("cfs-test-hdfs"))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          sink += b.select(col("k"), col("change_type"))
            .as[(Long, String)].collect().toSeq
          ()
        })
        .start()
      q.awaitTermination()
      sink.toSeq.flatten.sortBy(_._1)
    }
    assert(drain() == Seq((1L, "insert")),
      "bootstrap through the registered hadoop binding")
    PS.upsert(spark, t, Seq((2L, "B", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d", store = had)
    assert(drain() == Seq((2L, "insert")),
      "tail a commit made on the hadoop binding")

    // selecting a binding where the table does NOT exist refuses with
    // the binding named — not a bare "no committed snapshot"
    val obj = CommitStore.inMemoryObject()
    CommitStore.register("cfs-test-object", obj)
    val e = intercept[Exception] {
      CF.readStream(spark, t, keys = Seq("k"),
        storeName = Some("cfs-test-object"))
    }
    assert(e.getMessage.contains("store binding 'cfs-test-object'"),
      e.getMessage)
    // an unregistered name refuses at stream CREATION with valid specs
    val e2 = intercept[Exception] {
      CF.readStream(spark, t, keys = Seq("k"),
        storeName = Some("no-such-binding"))
    }
    assert(e2.getMessage.contains("unknown CommitStore binding"),
      e2.getMessage)
    // the built-in specs resolve without registration
    assert(CommitStore.resolve("local") eq CommitStore.local)
    assert(CommitStore.resolve("hadoop") != null)
  }

  test("schema-drift gate: a table WIDENED mid-stream keeps streaming " +
      "on the pinned projection (no anonymous schema-mismatch); a " +
      "restart re-pins and delivers the new column") {
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_drift").toString
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    val seen = new scala.collection.mutable.ArrayBuffer[
      (Seq[String], Set[(Long, String)])]()
    val q = CF.readStream(spark, t)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        val rows = b.select(col("k"), col("change_type"))
          .as[(Long, String)].collect().toSet
        seen.synchronized { seen += ((b.columns.toSeq, rows)) }
        ()
      })
      .start()
    q.processAllAvailable() // bootstrap on the pinned (k,d,v) schema
    // the batch upsert's append_new_columns contract widens the table
    // UNDER the running stream — exactly what the round-10 sink gate
    // made the default for streaming writers too
    PS.upsert(spark, t, Seq((2L, "B", "b1", "w1"))
      .toDF("k", "d", "v", "w"), Seq("k"), "d")
    q.processAllAvailable()
    q.stop()
    val batches = seen.synchronized(seen.toVector)
    assert(batches.exists(_._2.contains((2L, "insert"))),
      s"the widened commit must still deliver: $batches")
    assert(batches.forall(!_._1.contains("w")),
      s"mid-stream batches must stay on the pinned projection: " +
        batches.map(_._1))

    // restart (same checkpoint): the source re-pins from the WIDENED
    // table, so new commits deliver the new column with its value
    PS.upsert(spark, t, Seq((3L, "A", "c1", "w3"))
      .toDF("k", "d", "v", "w"), Seq("k"), "d")
    val seen2 = new scala.collection.mutable.ArrayBuffer[
      (Seq[String], Set[(Long, Option[String], String)])]()
    val q2 = CF.readStream(spark, t)
      .writeStream.option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        val rows = b.select(col("k"), col("w"), col("change_type"))
          .as[(Long, Option[String], String)].collect().toSet
        seen2.synchronized { seen2 += ((b.columns.toSeq, rows)) }
        ()
      })
      .start()
    q2.awaitTermination()
    val after = seen2.synchronized(seen2.toVector)
    assert(after.flatMap(_._2).contains((3L, Some("w3"), "insert")),
      s"restart must adopt the widened schema: $after")
  }

  test("schema-drift gate: a pinned column RETYPED or DROPPED " +
      "mid-stream refuses naming the drifted column, never an " +
      "anonymous analysis error") {
    def causes(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // retype: full-copy overwrite flips v from string to int
    val t = tmp()
    val cp = Files.createTempDirectory("graft_cfs_retype").toString
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v"))
    val q = CF.readStream(spark, t, keys = Seq("k"))
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.count(); ()
      })
      .start()
    q.processAllAvailable()
    Snapshots.write(spark, t, Seq((1L, 5)).toDF("k", "v"))
    val e = intercept[Throwable] { q.processAllAvailable() }
    assert(causes(e).contains("drifted") &&
      causes(e).contains("retyped columns: v"), causes(e))
    // the remedy must be RE-BOOTSTRAP, not restart: a restart re-pins
    // v:int but its first batch still SPANS the retype, so the span
    // gate refuses again with the same instruction instead of wedging
    // on an inverted type-conflict message
    assert(causes(e).contains("re-bootstrap"), causes(e))
    val qr = CF.readStream(spark, t, keys = Seq("k"))
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.count(); ()
      })
      .start()
    val er = intercept[Throwable] { qr.processAllAvailable() }
    assert(causes(er).contains("re-bootstrap") &&
      causes(er).contains("retyped columns: v"), causes(er))
    // following the instruction heals: a FRESH checkpoint bootstraps
    // from the current (retyped) snapshot
    val cpFresh = Files.createTempDirectory("graft_cfs_fresh").toString
    val n = new java.util.concurrent.atomic.AtomicLong
    val qf = CF.readStream(spark, t, keys = Seq("k"))
      .writeStream.option("checkpointLocation", cpFresh)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        n.addAndGet(b.count()); ()
      })
      .start()
    qf.awaitTermination()
    assert(n.get() == 1L, "fresh checkpoint must re-bootstrap cleanly")

    // drop: the overwritten version no longer carries v at all
    val t2 = tmp()
    val cp2 = Files.createTempDirectory("graft_cfs_dropcol").toString
    Snapshots.write(spark, t2, Seq((1L, "a")).toDF("k", "v"))
    val qd = CF.readStream(spark, t2, keys = Seq("k"))
      .writeStream.option("checkpointLocation", cp2)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        b.count(); ()
      })
      .start()
    qd.processAllAvailable()
    Snapshots.write(spark, t2, Seq(Tuple1(1L)).toDF("k"))
    val e2 = intercept[Throwable] { qd.processAllAvailable() }
    assert(causes(e2).contains("drifted") &&
      causes(e2).contains("dropped columns: v"), causes(e2))
  }

  test("checkpointed restart on a REGISTERED store binding without " +
      "re-registering fails at load with the re-register instruction; " +
      "re-registering heals the restart") {
    import graft.operators.CommitStore
    val had = CommitStore.hadoop()
    CommitStore.register("cfs-restart-store", had)
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d",
      had)
    val cp = Files.createTempDirectory("graft_cfs_rr").toString
    def drainOnce(): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong
      val q = CF.readStream(spark, t, keys = Seq("k"),
        storeName = Some("cfs-restart-store"))
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          n.addAndGet(b.count()); ()
        })
        .start()
      q.awaitTermination()
      n.get()
    }
    assert(drainOnce() == 1L) // bootstrap through the binding
    // a fresh driver process: the process-local registry is empty
    assert(CommitStore.unregister("cfs-restart-store"))
    val e = intercept[Exception] { drainOnce() }
    assert(e.getMessage.contains(
      "unknown CommitStore binding 'cfs-restart-store'") &&
      e.getMessage.contains("re-register"), e.getMessage)
    // the instructive message names the fix; applying it heals
    CommitStore.register("cfs-restart-store", had)
    PS.upsert(spark, t, Seq((2L, "B", "b1")).toDF("k", "d", "v"),
      Seq("k"), "d", store = had)
    assert(drainOnce() == 1L, "re-registered restart must resume the tail")
    CommitStore.unregister("cfs-restart-store")
    ()
  }

  test("a consumer behind the retention horizon fails loudly with " +
      "re-bootstrap instructions; reset re-bootstraps") {
    val t = tmp()
    PS.write(spark, t, Seq((1L, "A", "a1")).toDF("k", "d", "v"), "d")
    CF.commit(t, "lagger", 1L)
    (2 to 4).foreach(i => PS.upsert(spark, t,
      Seq((i.toLong, "A", s"v$i")).toDF("k", "d", "v"), Seq("k"), "d"))
    PS.vacuum(t, keep = 1)
    val e = intercept[IllegalStateException] {
      CF.poll(spark, t, "lagger")
    }
    assert(e.getMessage.contains("retention horizon"), e.getMessage)
    CF.reset(t, "lagger")
    val b = CF.poll(spark, t, "lagger").get // snapshot re-bootstrap
    assert(b.df.count() == 4)
    assert(b.df.filter(col("change_type") =!= "insert").isEmpty)
  }
}
