package graft.plans

import graft.operators.{CommitStore, PartitionedSnapshots => PS}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

/** Round-13: streaming-sink epoch commits ride the OPTIMISTIC commit
  * protocol — two streams writing DISJOINT partitions of one table
  * interleave their epoch data writes instead of serializing on the
  * single-writer table lock, with per-queryId txn markers keeping
  * exactly-once intact. */
class OptimisticSinkSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Delegates to the local store; when armed, every listing of a
    * version's fresh `…/data` dir (the lock-free prepare's post-write
    * listing) parks on a 2-party barrier. Both sink commits can only
    * proceed if BOTH are inside their lock-free prepare at once — if
    * epochs still serialized on the table lock, the first would wait
    * at the barrier HOLDING the lock and the second could never reach
    * it (the barrier would time out and the test fail). */
  private final class GatedStore extends CommitStore {
    @volatile var armed = false
    val bothPreparing = new CyclicBarrier(2)
    private val d = CommitStore.local
    override def listEntries(dir: String): Seq[CommitStore.DirEntry] = {
      if (armed && dir.endsWith("/data"))
        bothPreparing.await(60, TimeUnit.SECONDS)
      d.listEntries(dir)
    }
    override def createNew(p: String, c: Array[Byte]) = d.createNew(p, c)
    override def read(p: String) = d.read(p)
    override def write(p: String, c: Array[Byte]) = d.write(p, c)
    override def rename(s: String, t: String, r: Boolean) =
      d.rename(s, t, r)
    override def delete(p: String) = d.delete(p)
    override def deleteRecursively(p: String) = d.deleteRecursively(p)
    override def exists(p: String) = d.exists(p)
    override def modifiedMs(p: String) = d.modifiedMs(p)
    override def list(p: String) = d.list(p)
    override def mkdirs(p: String) = d.mkdirs(p)
    override def touch(p: String) = d.touch(p)
  }

  private def staged(root: String, rows: Seq[(Long, String, String)],
      name: String): String = {
    val dir = s"$root/$name"
    rows.toDF("k", "d", "v").coalesce(1).write.parquet(dir)
    Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
  }

  test("two streams' epoch commits on DISJOINT partitions run their " +
      "data writes concurrently (barrier inside both lock-free " +
      "prepares) and both land with per-query txn markers") {
    val root = Files.createTempDirectory("graft_osink").toString
    val t = s"$root/t"
    val store = new GatedStore
    PS.write(spark, t, Seq((1L, "A", "seed")).toDF("k", "d", "v"), "d",
      store = store)
    val schema = PS.read(spark, t).schema
    val wa = new SnapshotStreamingWrite(t, schema, "q-alpha",
      Some("d"), Seq("k"), truncate = false, store)
    val wb = new SnapshotStreamingWrite(t, schema, "q-beta",
      Some("d"), Seq("k"), truncate = false, store)
    val fa = staged(root, Seq((2L, "B", "from-alpha")), "ea")
    val fb = staged(root, Seq((3L, "C", "from-beta")), "eb")
    store.armed = true
    val pool = Executors.newFixedThreadPool(2)
    val ja = pool.submit(new Runnable {
      def run(): Unit = wa.commit(5L, Array(StagedEpochFiles(fa, 1L)))
    })
    val jb = pool.submit(new Runnable {
      def run(): Unit = wb.commit(9L, Array(StagedEpochFiles(fb, 1L)))
    })
    ja.get(120, TimeUnit.SECONDS)
    jb.get(120, TimeUnit.SECONDS)
    store.armed = false
    pool.shutdown()
    assert(PS.read(spark, t, store).as[(Long, String, String)]
      .collect().toSet == Set((1L, "A", "seed"), (2L, "B", "from-alpha"),
        (3L, "C", "from-beta")))
    // exactly-once bookkeeping: each query's marker advanced
    assert(PS.lastCommittedEpoch(t, "q-alpha", store).contains(5L))
    assert(PS.lastCommittedEpoch(t, "q-beta", store).contains(9L))
    // and a replayed epoch (crash before checkpoint) is still skipped
    val before = PS.currentVersion(t, store).get
    wa.commit(5L, Array(StagedEpochFiles(
      staged(root, Seq((2L, "B", "from-alpha")), "ea2"), 1L)))
    assert(PS.currentVersion(t, store).get == before,
      "replayed epoch must not commit")
  }

  test("serializedRetry (the post-exhaustion fallback's lock-queue): " +
      "transient contention retries until the body commits; past the " +
      "deadline the refusal surfaces") {
    var calls = 0
    val got = SnapshotStreamingWrite.serializedRetry {
      calls += 1
      if (calls < 3) throw new graft.operators.Incremental
        .ConcurrentWriteException("lock busy")
      42
    }
    assert(got == 42 && calls == 3,
      "transient contention must queue, not fail the stream")
  }

  test("two streams' epochs on the SAME partition converge by the " +
      "bounded retry — both epochs land, no lost update") {
    val root = Files.createTempDirectory("graft_osink_ovl").toString
    val t = s"$root/t"
    PS.write(spark, t, Seq((1L, "P", "seed")).toDF("k", "d", "v"), "d")
    val schema = PS.read(spark, t).schema
    val wa = new SnapshotStreamingWrite(t, schema, "q-one",
      Some("d"), Seq("k"), truncate = false, CommitStore.local)
    val wb = new SnapshotStreamingWrite(t, schema, "q-two",
      Some("d"), Seq("k"), truncate = false, CommitStore.local)
    val fa = staged(root, Seq((2L, "P", "one")), "ea")
    val fb = staged(root, Seq((3L, "P", "two")), "eb")
    val pool = Executors.newFixedThreadPool(2)
    val ja = pool.submit(new Runnable {
      def run(): Unit = wa.commit(1L, Array(StagedEpochFiles(fa, 1L)))
    })
    val jb = pool.submit(new Runnable {
      def run(): Unit = wb.commit(1L, Array(StagedEpochFiles(fb, 1L)))
    })
    ja.get(120, TimeUnit.SECONDS)
    jb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    assert(PS.read(spark, t).as[(Long, String, String)].collect().toSet
      == Set((1L, "P", "seed"), (2L, "P", "one"), (3L, "P", "two")),
      "an epoch was lost to the race")
    assert(PS.lastCommittedEpoch(t, "q-one").contains(1L))
    assert(PS.lastCommittedEpoch(t, "q-two").contains(1L))
  }
}
