package graft.plans

import graft.operators.{CommitStore, SchemaEvents,
  PartitionedSnapshots => PS}
import org.apache.spark.sql.types.{IntegerType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-13 stretch: sink-side schema-tracking symmetry. The CDC
  * source records its schema pins; the WRITE side now records its
  * widenings — who added which columns, when, with which commit — in
  * `_schema_history`, surfaced via `CALL <cat>.system.schema_history`. */
class SchemaHistorySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def staged(root: String, df: org.apache.spark.sql.DataFrame,
      name: String): String = {
    val dir = s"$root/$name"
    df.coalesce(1).write.parquet(dir)
    Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
  }

  test("a streaming run that lands new columns records ONE widening " +
      "event — actor, query id, committed version, added columns — " +
      "with its first applied epoch, not per epoch, and not at all " +
      "when the run declares no new columns") {
    val root = Files.createTempDirectory("graft_schemahist").toString
    val t = s"$root/t"
    PS.write(spark, t, Seq((1L, "A", "x")).toDF("k", "d", "v"), "d")
    val widened = PS.read(spark, t)
      .withColumn("extra", org.apache.spark.sql.functions.lit(1)).schema
    val w = new SnapshotStreamingWrite(t, widened, "q-evolve",
      Some("d"), Nil, truncate = false, CommitStore.local,
      evolvedCols = Seq(StructField("extra", IntegerType)))
    w.commit(1L, Array(StagedEpochFiles(staged(root,
      Seq((2L, "A", "y", 7)).toDF("k", "d", "v", "extra"), "e1"), 1L)))
    val v1 = PS.currentVersion(t).get
    w.commit(2L, Array(StagedEpochFiles(staged(root,
      Seq((3L, "B", "z", 8)).toDF("k", "d", "v", "extra"), "e2"), 1L)))

    val evts = SchemaEvents.all(t)
    assert(evts.size == 1, s"one event per run, got $evts")
    val e = evts.head
    assert(e.actor == "stream" && e.source == "q-evolve")
    assert(e.version.contains(v1),
      s"event must carry the FIRST landed epoch's version: $e")
    assert(e.added.map(_.name) == Seq("extra"))
    assert(e.added.head.dataType == IntegerType)

    // a second run with NO new columns records nothing
    val w2 = new SnapshotStreamingWrite(t, widened, "q-steady",
      Some("d"), Nil, truncate = false, CommitStore.local)
    w2.commit(1L, Array(StagedEpochFiles(staged(root,
      Seq((4L, "B", "w", 9)).toDF("k", "d", "v", "extra"), "e3"), 1L)))
    assert(SchemaEvents.all(t).size == 1)
  }

  test("a run whose epochs never land claims no widening: replayed " +
      "epochs (already committed under the marker) skip the record") {
    val root = Files.createTempDirectory("graft_schemahist_replay")
      .toString
    val t = s"$root/t"
    PS.write(spark, t, Seq((1L, "A", "x")).toDF("k", "d", "v"), "d")
    // epoch 5 commits under this query id BEFORE the evolving restart
    // (the txn marker is what makes the re-delivery a replay)
    val w0 = new SnapshotStreamingWrite(t,
      PS.read(spark, t).schema, "q-replay", Some("d"), Nil,
      truncate = false, CommitStore.local)
    w0.commit(5L, Array(StagedEpochFiles(staged(root,
      Seq((9L, "A", "pre")).toDF("k", "d", "v"), "e0"), 1L)))
    val widened = PS.read(spark, t)
      .withColumn("extra", org.apache.spark.sql.functions.lit(1)).schema
    val w = new SnapshotStreamingWrite(t, widened, "q-replay",
      Some("d"), Nil, truncate = false, CommitStore.local,
      evolvedCols = Seq(StructField("extra", IntegerType)))
    w.commit(5L, Array(StagedEpochFiles(staged(root,
      Seq((2L, "A", "y", 7)).toDF("k", "d", "v", "extra"), "e1"), 1L)))
    assert(SchemaEvents.all(t).isEmpty,
      "a skipped replay must not claim a widening")
  }

  test("the two-phase record survives the crash windows: a staged " +
      "event (crash before the epoch committed) is preserved and " +
      "idempotent under replay; fillVersion patches the version in; " +
      "a crash after the commit loses only the version, never the " +
      "entry") {
    val t = Files.createTempDirectory("graft_schemahist_2p").toString
    // phase 1 (pre-commit): entry exists, version unknown
    SchemaEvents.stage(t, "stream-q-x-abc", "stream", "q-x",
      Seq(StructField("extra", IntegerType)))
    val staged = SchemaEvents.all(t)
    assert(staged.size == 1 && staged.head.version.isEmpty)
    val ts0 = staged.head.tsMs
    // a replayed phase 1 (restart re-running the epoch) no-ops — the
    // original timestamp survives, no duplicate entry
    SchemaEvents.stage(t, "stream-q-x-abc", "stream", "q-x",
      Seq(StructField("extra", IntegerType)))
    assert(SchemaEvents.all(t) == staged)
    // phase 2: the committed version lands on the SAME entry
    SchemaEvents.fillVersion(t, "stream-q-x-abc", 7L)
    val filled = SchemaEvents.all(t)
    assert(filled.size == 1 && filled.head.version.contains(7L) &&
      filled.head.tsMs == ts0, s"$filled")
    // fillVersion on a missing entry (crash before phase 1 — the
    // widening didn't land either) is a no-op, not an error
    SchemaEvents.fillVersion(t, "never-staged", 9L)
    assert(SchemaEvents.all(t).size == 1)
    // an atomicWrite staging file left by a crash between its write
    // and rename must NOT parse as a duplicate event
    val body = CommitStore.local.read(s"$t/_schema_history/stream-q-x-abc").get
    CommitStore.local.write(
      s"$t/_schema_history/stream-q-x-abc.__tmp-deadbeef", body)
    assert(SchemaEvents.all(t).size == 1,
      "a leftover .__tmp- staging file duplicated the event")
    // a FILLED entry is immutable: a later fillVersion must not
    // falsify its recorded version
    SchemaEvents.fillVersion(t, "stream-q-x-abc", 99L)
    assert(SchemaEvents.all(t).head.version.contains(7L),
      "a completed audit entry was rewritten")
    // the same query re-widening the same columns later (deterministic
    // name now FILLED) records a NEW entry under a derived name...
    val name2 = SchemaEvents.stage(t, "stream-q-x-abc", "stream",
      "q-x", Seq(StructField("extra", IntegerType)))
    assert(name2 != "stream-q-x-abc")
    assert(SchemaEvents.all(t).size == 2)
    // ...and a crash/replay of that re-widening REUSES the staged
    // derived entry instead of minting one ghost per attempt
    val name3 = SchemaEvents.stage(t, "stream-q-x-abc", "stream",
      "q-x", Seq(StructField("extra", IntegerType)))
    assert(name3 == name2, s"replay must reuse $name2, got $name3")
    assert(SchemaEvents.all(t).size == 2)
    // ...and a permanently-refused widening discards its staged claim
    // (filled entries are never touched)
    SchemaEvents.discardStaged(t, name2)
    SchemaEvents.discardStaged(t, "stream-q-x-abc")
    val left = SchemaEvents.all(t)
    assert(left.size == 1 && left.head.version.contains(7L),
      s"discard must remove only the unfilled claim: $left")
  }

  test("ALTER TABLE ADD COLUMN records an alter event, and CALL " +
      "system.schema_history surfaces the full log in order") {
    val root = Files.createTempDirectory("graft_schemahist_sql").toString
    spark.conf.set("spark.sql.catalog.snapsh",
      "graft.plans.SnapshotSqlCatalog")
    spark.conf.set("spark.sql.catalog.snapsh.root", root)
    val t = s"$root/aud"
    PS.write(spark, t, Seq((1L, "A", "x")).toDF("k", "d", "v"), "d")
    spark.sql("ALTER TABLE snapsh.aud ADD COLUMN note STRING")
    val got = spark.sql(
      "CALL snapsh.system.schema_history(table => 'aud')")
      .select("actor", "version", "added")
      .as[(String, Option[Long], String)].collect().toSeq
    assert(got == Seq(("alter", None, "note string")), s"$got")
  }

  test("record() lands atomically: the event dir never holds a " +
      "partially-written entry the reader could mis-skip, and " +
      "atomicWrite's staging leftovers are invisible to all()") {
    val root = Files.createTempDirectory("graft_schemahist_atom").toString
    val t = s"$root/t"
    SchemaEvents.record(t, "alter", "ALTER TABLE ADD COLUMN", None,
      Seq(StructField("c1", IntegerType)))
    // the write staged through a .__tmp- rename — nothing but the
    // final event file remains, and it parses
    val entries = CommitStore.local.list(s"$t/_schema_history")
    assert(entries.size == 1 && !entries.head.contains(".__tmp-"),
      s"$entries")
    assert(SchemaEvents.all(t).map(_.added.map(_.name)) ==
      Seq(Seq("c1")))
    // a crashed staging leftover beside it is filtered, not surfaced
    // as a duplicate event
    CommitStore.local.write(
      s"$t/_schema_history/${entries.head}.__tmp-dead",
      CommitStore.local.read(s"$t/_schema_history/${entries.head}").get)
    assert(SchemaEvents.all(t).size == 1)
  }

  test("roll-up: crossing the threshold compacts complete events " +
      "into one segment — all() preserves order/content, an UNFILLED " +
      "claim stays loose (fillVersion still patches it), the " +
      "crash-between-segment-and-deletes window dedupes, and a " +
      "re-roll-up of the same set is idempotent") {
    val root = Files.createTempDirectory("graft_schemahist_roll").toString
    val t = s"$root/t"
    val store = CommitStore.local
    def dir = s"$t/_schema_history"
    (1 to 6).foreach { i =>
      SchemaEvents.record(t, "alter", s"src$i", None,
        Seq(StructField(s"c$i", IntegerType)))
      Thread.sleep(2) // distinct timestamps pin the order assertion
    }
    // one in-flight staged claim — must survive every roll-up loose
    SchemaEvents.stage(t, "stream-q1-claim", "stream", "q1",
      Seq(StructField("pending", IntegerType)))
    val before = SchemaEvents.all(t)
    assert(before.size == 7)
    assert(SchemaEvents.rollUp(t, threshold = 5))
    val loose = store.list(dir).filterNot(_.startsWith("_segment-"))
    val segs = store.list(dir).filter(_.startsWith("_segment-"))
    assert(segs.size == 1, s"one segment, got $segs")
    assert(loose == Seq("stream-q1-claim"),
      s"only the unfilled claim stays loose: $loose")
    assert(SchemaEvents.all(t).map(_.source) == before.map(_.source),
      "order and content preserved across the roll-up")
    // idempotent: nothing left above the threshold
    assert(!SchemaEvents.rollUp(t, threshold = 5))
    // crash window: resurrect one original beside the segment — a
    // reader must dedupe by original name, never double-report
    val segBody = new String(store.read(s"$dir/${segs.head}").get,
      "UTF-8")
    val chunk = segBody.split("(?m)^=== ")(1)
    val nl = chunk.indexOf('\n')
    store.write(s"$dir/${chunk.take(nl).trim}",
      chunk.drop(nl + 1).trim.getBytes("UTF-8"))
    assert(SchemaEvents.all(t).size == 7, "duplicate must dedupe")
    // the staged claim still fills normally after roll-ups
    SchemaEvents.fillVersion(t, "stream-q1-claim", 42L)
    assert(SchemaEvents.all(t).exists(_.version.contains(42L)))
    // and once FILLED it becomes compactable: with the resurrected
    // original + the filled claim the tail crosses a threshold of 2
    assert(SchemaEvents.rollUp(t, threshold = 2))
    assert(store.list(dir).count(_.startsWith("_segment-")) == 2)
    assert(SchemaEvents.all(t).size == 7)
  }
}
