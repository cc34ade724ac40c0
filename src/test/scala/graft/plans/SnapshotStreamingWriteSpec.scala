package graft.plans

import graft.operators.{CommitStore, PartitionedSnapshots => PS}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The crash window a bare foreachBatch sink leaves open: the epoch's
  * data commits, the crash lands BEFORE the checkpoint commits, and the
  * restarted query re-delivers the epoch. The snapshot streaming sink
  * closes it with the txn marker (`txn=<queryId>/<epochId>` in the
  * version's commit meta): a replayed epoch at or below the recorded
  * high-water mark is skipped without touching data — exactly-once even
  * for KEYLESS append tables, where a re-apply would duplicate rows. */
class SnapshotStreamingWriteSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("epoch replay after a crash between data-commit and " +
      "checkpoint-commit applies ONCE: the txn marker skips the " +
      "re-delivered epoch; later epochs still apply") {
    val root = Files.createTempDirectory("graft_ssw").toString
    val t = s"$root/t"
    PS.write(spark, t,
      Seq((1L, "A", "x")).toDF("k", "d", "v"), "d")      // v1
    val schema = PS.read(spark, t).schema
    val w = new SnapshotStreamingWrite(t, schema, "q-test",
      Some("d"), Nil, truncate = false, CommitStore.local)

    // stage a file the way an executor task would (same parquet bytes)
    def staged(rows: Seq[(Long, String, String)], name: String): String = {
      val dir = s"$root/$name"
      rows.toDF("k", "d", "v").coalesce(1).write.parquet(dir)
      Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }

    val f7 = staged(Seq((2L, "A", "y")), "e7")
    w.commit(7L, Array(StagedEpochFiles(f7, 1L)))
    assert(PS.read(spark, t).count() == 2)
    val vAfter7 = PS.currentVersion(t).get
    assert(PS.commitTxn(t, vAfter7).contains("q-test/7"))
    assert(PS.lastCommittedEpoch(t, "q-test").contains(7L))

    // crash-replay: the SAME epoch arrives again (this table is
    // KEYLESS — an un-skipped re-apply would append a duplicate row)
    val f7b = staged(Seq((2L, "A", "y")), "e7b")
    w.commit(7L, Array(StagedEpochFiles(f7b, 1L)))
    assert(PS.read(spark, t).count() == 2, "replayed epoch duplicated rows")
    assert(PS.currentVersion(t).get == vAfter7,
      "replayed epoch burned a version")

    // a LATER epoch still applies, and the marker advances
    val f8 = staged(Seq((3L, "B", "z")), "e8")
    w.commit(8L, Array(StagedEpochFiles(f8, 1L)))
    assert(PS.read(spark, t).count() == 3)
    assert(PS.lastCommittedEpoch(t, "q-test").contains(8L))

    // an aborted epoch leaves no trace
    w.abort(9L, Array.empty)
    assert(PS.lastCommittedEpoch(t, "q-test").contains(8L))
    assert(PS.read(spark, t).count() == 3)
  }

  test("the txn marker is VACUUM-DURABLE: foreign commits age the " +
      "sink's txn-bearing version past keep, vacuum reclaims it, the " +
      "query crashes before its checkpoint — the restarted epoch is " +
      "still skipped (keyless append does not duplicate)") {
    import graft.operators.Txns
    val root = Files.createTempDirectory("graft_ssw_vac").toString
    val t = s"$root/t"
    PS.write(spark, t, Seq((1L, "A", "x")).toDF("k", "d", "v"), "d") // v1
    val schema = PS.read(spark, t).schema
    val w = new SnapshotStreamingWrite(t, schema, "q-vac",
      Some("d"), Nil, truncate = false, CommitStore.local)
    def staged(rows: Seq[(Long, String, String)], name: String): String = {
      val dir = s"$root/$name"
      rows.toDF("k", "d", "v").coalesce(1).write.parquet(dir)
      Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }

    // the sink commits epoch 3, then goes idle (query down, its
    // checkpoint never recorded the epoch)
    w.commit(3L, Array(StagedEpochFiles(
      staged(Seq((2L, "A", "y")), "e3"), 1L)))
    val txnVersion = PS.currentVersion(t).get
    assert(PS.commitTxn(t, txnVersion).contains("q-vac/3"))

    // foreign writers land more commits; every partition rewrites so
    // ownership cannot save the txn-bearing version from recency GC
    PS.upsert(spark, t, Seq((1L, "A", "x2"), (2L, "A", "y2"))
      .toDF("k", "d", "v"), Seq("k"), "d")
    PS.upsert(spark, t, Seq((1L, "A", "x3"), (2L, "A", "y3"))
      .toDF("k", "d", "v"), Seq("k"), "d")
    val dropped = PS.vacuum(t, keep = 1)
    assert(dropped.contains(txnVersion),
      s"vacuum must reclaim the txn-bearing v$txnVersion, dropped $dropped")
    assert(!CommitStore.local.exists(
      f"$t/_snapshots/v$txnVersion%05d"), "meta dir gone")
    // the high-water mark survived in the sidecar and through the API
    assert(Txns.get(t, "q-vac").contains(3L))
    assert(PS.lastCommittedEpoch(t, "q-vac").contains(3L))

    // restart replays epoch 3 (crash was before the checkpoint):
    // KEYLESS table — an un-skipped re-apply would append a duplicate
    val before = PS.read(spark, t).count()
    w.commit(3L, Array(StagedEpochFiles(
      staged(Seq((2L, "A", "y")), "e3b"), 1L)))
    assert(PS.read(spark, t).count() == before,
      "vacuum lost the marker: replayed epoch duplicated rows")

    // epoch 4 applies and ADVANCES past the sidecar mark
    w.commit(4L, Array(StagedEpochFiles(
      staged(Seq((3L, "B", "z")), "e4"), 1L)))
    assert(PS.lastCommittedEpoch(t, "q-vac").contains(4L))
  }

  test("orphans do NOT poison the sidecar: a crashed epoch commit " +
      "(meta written, pointer never flipped) is vacuumed WITHOUT " +
      "preserving its marker, so the restarted epoch re-applies") {
    import graft.operators.{Snapshots, Txns}
    val root = Files.createTempDirectory("graft_ssw_orph").toString
    val t = s"$root/t"
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v")) // v1
    // hand-craft a crashed streaming commit: full-copy v2 dir + meta
    // carrying the txn, but the pointer still at v1
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$t/_snapshots/v00002")
    CommitStore.local.write(s"$t/_snapshots/v00002/_commit_meta",
      s"ts=${System.currentTimeMillis}\ntxn=q-orph/5".getBytes("UTF-8"))
    assert(Snapshots.currentVersion(t).contains(1L))
    // the orphan's marker must already be invisible (above the pointer)
    assert(Snapshots.lastCommittedEpoch(t, "q-orph").isEmpty)
    val dropped = Snapshots.vacuum(t, keep = 1)
    assert(dropped == Seq(2L))
    assert(Txns.get(t, "q-orph").isEmpty,
      "vacuum preserved an orphan's txn marker — a restarted query " +
        "would wrongly skip the never-applied epoch")
    assert(Snapshots.lastCommittedEpoch(t, "q-orph").isEmpty)
  }

  test("txn appIds containing '/' survive the whole lifecycle: one " +
      "parse rule (last '/'), percent-encoded sidecar names, vacuum " +
      "never crashes on them") {
    import graft.operators.{Snapshots, Txns}
    val root = Files.createTempDirectory("graft_ssw_slash").toString
    val t = s"$root/t"
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v"),
      txn = Some("team/app/42"))
    Snapshots.write(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(Snapshots.lastCommittedEpoch(t, "team/app").contains(42L))
    // a PREFIX of the real appId is a different app: None, never a
    // NumberFormatException from parsing 'app/42' as the epoch
    assert(Snapshots.lastCommittedEpoch(t, "team").isEmpty)
    Snapshots.write(spark, t, Seq((3L, "c")).toDF("k", "v"))
    // vacuum preserves the mark without crashing on the '/' appId
    assert(Snapshots.vacuum(t, keep = 1) == Seq(1L, 2L))
    assert(Txns.get(t, "team/app").contains(42L))
    assert(Txns.list(t) == Map("team/app" -> 42L))
    assert(Snapshots.lastCommittedEpoch(t, "team/app").contains(42L))

    // pathological appIds ('..' would be a path traversal bare) and a
    // legacy un-encoded sidecar name both survive the lifecycle
    val t2 = s"$root/t2"
    Snapshots.write(spark, t2, Seq((1L, "a")).toDF("k", "v"),
      txn = Some("../5"))
    Snapshots.write(spark, t2, Seq((2L, "b")).toDF("k", "v"))
    Snapshots.write(spark, t2, Seq((3L, "c")).toDF("k", "v"))
    assert(Snapshots.vacuum(t2, keep = 1) == Seq(1L, 2L),
      "vacuum must not crash preserving a dotted appId")
    assert(Txns.get(t2, "..").contains(5L))
    assert(Txns.list(t2) == Map(".." -> 5L))
    assert(CommitStore.local.exists(s"$t2/_txns/%2E%2E"),
      "dotted appId must be encoded inside the table's _txns dir")
    // a hand-dropped legacy (raw, undecodeable) name lists raw instead
    // of crashing the inspection view
    CommitStore.local.mkdirs(s"$t2/_txns")
    CommitStore.local.write(s"$t2/_txns/job%1", "9".getBytes("UTF-8"))
    assert(Txns.list(t2).get("job%1").contains(9L))
  }

  test("_txns lifecycle: a dropped mark forces replay on restart (the " +
      "documented txn-retention contract); the age sweep reclaims idle " +
      "marks but never one the same vacuum just preserved") {
    import graft.operators.{Snapshots, Txns}
    val root = Files.createTempDirectory("graft_ssw_life").toString
    val t = s"$root/t"
    def staged(rows: Seq[(Long, String)], name: String): String = {
      val dir = s"$root/$name"
      rows.toDF("k", "v").coalesce(1).write.parquet(dir)
      Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
    }
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v"),
      txn = Some("q-life/11"))
    Snapshots.write(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Snapshots.write(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    // same-call preserve + sweep: the mark this vacuum just preserved
    // is mtime-fresh, so even an aggressive retention keeps it
    assert(Snapshots.vacuum(t, keep = 1,
      txnRetainMs = Some(60L * 1000)) == Seq(1L, 2L))
    assert(Txns.get(t, "q-life").contains(11L),
      "the sweep must never eat a mark the same vacuum preserved")
    assert(Snapshots.lastCommittedEpoch(t, "q-life").contains(11L))

    // retire the mark: the operator knows q-life will never write again
    assert(Txns.drop(t, "q-life"))
    assert(!Txns.drop(t, "q-life"), "second drop: nothing left")
    assert(Snapshots.lastCommittedEpoch(t, "q-life").isEmpty)
    // ...so a crash-before-checkpoint restart REPLAYS epoch 11, and on
    // this keyless table the replay applies (duplicates) — exactly the
    // documented consequence the retired mark trades away
    val w = new SnapshotStreamingWrite(t, Snapshots.read(spark, t).schema,
      "q-life", None, Nil, truncate = false, CommitStore.local)
    val before = Snapshots.read(spark, t).count()
    w.commit(11L, Array(StagedEpochFiles(
      staged(Seq((1L, "a")), "e11"), 1L)))
    assert(Snapshots.read(spark, t).count() == before + 1,
      "a dropped mark must force the replayed epoch to apply")

    // age-based sweep: a mark idle past txn_retain_ms is reclaimed
    val t2 = s"$root/t2"
    Snapshots.write(spark, t2, Seq((1L, "a")).toDF("k", "v"),
      txn = Some("q-idle/4"))
    Snapshots.write(spark, t2, Seq((2L, "b")).toDF("k", "v"))
    Snapshots.write(spark, t2, Seq((3L, "c")).toDF("k", "v"))
    assert(Snapshots.vacuum(t2, keep = 1) == Seq(1L, 2L))
    assert(Txns.get(t2, "q-idle").contains(4L))
    // age the sidecar on disk (a year of idleness in one syscall)
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$t2/_txns/q-idle"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 100L * 60 * 1000))
    Snapshots.write(spark, t2, Seq((4L, "d")).toDF("k", "v"))
    assert(Snapshots.vacuum(t2, keep = 1,
      txnRetainMs = Some(60L * 1000)).nonEmpty)
    assert(Txns.get(t2, "q-idle").isEmpty,
      "a mark idle past txn_retain_ms must sweep")
    assert(Snapshots.lastCommittedEpoch(t2, "q-idle").isEmpty,
      "after the sweep the replay check must force a replay")
  }

  test("schema-gate nullability is ONE-directional: a stream field " +
      "with stricter nested nullability writes into a nullable table " +
      "field, but a nullable stream field into a declared non-null " +
      "table field refuses as a named conflict (files must never " +
      "carry nulls the declared schema promises cannot exist)") {
    import org.apache.spark.sql.types._
    def s(nestedNullable: Boolean) = StructType(Seq(StructField("s",
      StructType(Seq(StructField("a", IntegerType, nestedNullable))))))
    // stream stricter (non-null) → nullable table field: compatible
    SnapshotStreamingWrite.validateSchema("t",
      tableSchema = s(true), writeSchema = s(false), evolveSchema = true)
    // identical nested nullability: compatible
    SnapshotStreamingWrite.validateSchema("t",
      tableSchema = s(false), writeSchema = s(false), evolveSchema = true)
    // stream nullable → table non-null: refuse, naming the column
    val e = intercept[IllegalArgumentException] {
      SnapshotStreamingWrite.validateSchema("t",
        tableSchema = s(false), writeSchema = s(true),
        evolveSchema = true)
    }
    assert(e.getMessage.contains("s (stream") &&
      e.getMessage.contains("conflict"), e.getMessage)

    // the SAME one-directional rule at the TOP-LEVEL StructField flag
    // (writeCompatible on dataTypes alone never sees it): a nullable
    // top-level stream column into a declared non-null table column is
    // exactly the impossible-nulls case and must refuse
    def top(nullable: Boolean) = StructType(Seq(
      StructField("k", LongType, nullable)))
    SnapshotStreamingWrite.validateSchema("t",
      tableSchema = top(true), writeSchema = top(false),
      evolveSchema = true)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStreamingWrite.validateSchema("t",
        tableSchema = top(false), writeSchema = top(true),
        evolveSchema = true)
    }
    assert(e2.getMessage.contains("k (stream") &&
      e2.getMessage.contains("NOT NULL"), e2.getMessage)
  }

  test("lastCommittedEpoch resolves per-app EXACT maxima through the " +
      "incremental-scan cache: interleaved apps, marker-less commits " +
      "and even NON-monotone manual txn markers resolve to the max " +
      "(never just the newest marker), repeated calls stay correct " +
      "as versions land, and drop_txn invalidates cached knowledge") {
    import graft.operators.{PartitionedSnapshots => PS, Txns}
    val root = Files.createTempDirectory("graft_ssw_desc").toString
    val t = s"$root/t"
    def up(k: Long, txn: Option[String]): Unit =
      if (PS.currentVersion(t).isEmpty)
        PS.write(spark, t, Seq((k, "A", s"r$k")).toDF("k", "d", "v"),
          "d", txn = txn)
      else
        PS.upsert(spark, t, Seq((k, "A", s"r$k")).toDF("k", "d", "v"),
          Seq("k"), "d", txn = txn)
    up(1L, Some("appA/3"))
    up(2L, None) // maintenance commit, no marker
    up(3L, Some("appB/9"))
    up(4L, Some("appA/7"))
    up(5L, None)
    assert(PS.lastCommittedEpoch(t, "appA").contains(7L))
    assert(PS.lastCommittedEpoch(t, "appB").contains(9L))
    assert(PS.lastCommittedEpoch(t, "appC").isEmpty)
    // a manual caller commits an OUT-OF-ORDER marker: the newest
    // marker is NOT the max — the replay check must keep resolving 7
    // (the cache scans incrementally but keeps exact max semantics)
    up(6L, Some("appA/5"))
    assert(PS.lastCommittedEpoch(t, "appA").contains(7L),
      "max semantics, not newest-marker semantics")
    // ...and a later higher epoch advances it
    up(7L, Some("appA/8"))
    assert(PS.lastCommittedEpoch(t, "appA").contains(8L))
    // vacuum preserves dropped markers to the sidecar — resolution
    // must survive version reclamation (knowledge is monotone)
    assert(PS.vacuum(t, keep = 1).nonEmpty)
    assert(PS.lastCommittedEpoch(t, "appA").contains(8L))
    assert(PS.lastCommittedEpoch(t, "appB").contains(9L))
    // drop_txn retires the sidecar AND the cached knowledge; only
    // what retained metas still carry resolves afterwards
    Txns.drop(t, "appA")
    val remaining = PS.lastCommittedEpoch(t, "appA")
    assert(remaining.isEmpty || remaining.exists(_ <= 8L))
  }

  test("full-copy format: vacuum preserves committed txn marks in the" +
      " sidecar too") {
    import graft.operators.{Snapshots, Txns}
    val root = Files.createTempDirectory("graft_ssw_fc").toString
    val t = s"$root/t"
    Snapshots.write(spark, t, Seq((1L, "a")).toDF("k", "v"),
      txn = Some("q-fc/11"))
    Snapshots.write(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    Snapshots.write(spark, t, Seq((1L, "a"), (3L, "c")).toDF("k", "v"))
    assert(Snapshots.lastCommittedEpoch(t, "q-fc").contains(11L))
    assert(Snapshots.vacuum(t, keep = 1) == Seq(1L, 2L))
    assert(Txns.get(t, "q-fc").contains(11L))
    assert(Snapshots.lastCommittedEpoch(t, "q-fc").contains(11L))
  }
}
