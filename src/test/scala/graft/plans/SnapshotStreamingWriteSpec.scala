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
}
