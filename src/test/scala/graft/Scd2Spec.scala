package graft

import graft.operators.Scd2
import org.scalatest.funsuite.AnyFunSuite

/** SCD Type 2 contract: change closes-and-opens, delete closes, insert
  * opens, unchanged stays open; re-merging the same snapshot is a no-op;
  * asOf() reconstructs any past state. */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)
  val t1 = ts("2024-01-01 00:00:00")
  val t2 = ts("2024-02-01 00:00:00")

  def snap1 = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("id", "name", "size")
  def snap2 = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
    .toDF("id", "name", "size")

  test("merge closes changed/deleted versions and opens changed/new ones") {
    val h1 = Scd2.init(snap1, t1)
    val h2 = Scd2.merge(h1, snap2, Seq("id"), t2)
    val rows = h2
      .select("id", "name", "valid_from", "valid_to")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(rows == Set(
      (1L, "a", t1, None),          // unchanged: still open since t1
      (2L, "b", t1, Some(t2)),      // changed: old version closed at t2
      (2L, "B", t2, None),          //   ...new version open from t2
      (3L, "c", t1, Some(t2)),      // deleted: closed at t2
      (4L, "d", t2, None)))         // inserted: open from t2
  }

  test("re-merging the same snapshot is a no-op (idempotent)") {
    val h2 = Scd2.merge(Scd2.init(snap1, t1), snap2, Seq("id"), t2)
    val h3 = Scd2.merge(h2, snap2, Seq("id"), ts("2024-03-01 00:00:00"))
    val a = h2.select("id", "name", "size", "valid_from", "valid_to")
      .as[(Long, String, Int, java.sql.Timestamp,
        Option[java.sql.Timestamp])].collect().toSet
    val b = h3.select("id", "name", "size", "valid_from", "valid_to")
      .as[(Long, String, Int, java.sql.Timestamp,
        Option[java.sql.Timestamp])].collect().toSet
    assert(a == b)
  }

  test("property: random snapshot sequences keep ≤1 open version per" +
      " key, non-overlapping validity, and asOf == each source snapshot") {
    val rnd = new scala.util.Random(42)
    val times = (1 to 5).map(i => ts(f"2024-0$i-01 00:00:00"))
    // random dimension states over keys 0..9
    val snaps = times.map { _ =>
      (0L to 9L).filter(_ => rnd.nextDouble() < 0.7)
        .map(k => (k, s"v${rnd.nextInt(3)}", rnd.nextInt(3))).toSeq
    }
    var history = Scd2.init(
      snaps.head.toDF("id", "name", "size"), times.head)
    snaps.tail.zip(times.tail).foreach { case (snap, t) =>
      history = Scd2.merge(history, snap.toDF("id", "name", "size"),
        Seq("id"), t)
      history = history.localCheckpoint() // keep lineage flat over rounds
    }
    val rows = history
      .select("id", "name", "size", "valid_from", "valid_to")
      .as[(Long, String, Int, java.sql.Timestamp,
        Option[java.sql.Timestamp])].collect().toSeq
    // ≤1 open version per key
    val open = rows.filter(_._5.isEmpty)
    assert(open.map(_._1).distinct.size == open.size)
    // versions of one key never overlap in time
    rows.groupBy(_._1).values.foreach { vs =>
      val sorted = vs.sortBy(_._4.getTime)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.nonEmpty && a._5.get.getTime <= b._4.getTime,
            s"overlapping versions: $a vs $b")
        case _ =>
      }
    }
    // time travel reproduces every source snapshot exactly
    snaps.zip(times).foreach { case (snap, t) =>
      val at = Scd2.asOf(history, ts(
        new java.sql.Timestamp(t.getTime + 1000).toString))
        .select("id", "name", "size").as[(Long, String, Int)]
        .collect().toSet
      assert(at == snap.toSet, s"asOf($t) mismatch")
    }
  }

  test("asOf reconstructs the dimension at any past instant") {
    val h2 = Scd2.merge(Scd2.init(snap1, t1), snap2, Seq("id"), t2)
    val atT1 = Scd2.asOf(h2, ts("2024-01-15 00:00:00"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(atT1 == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val atT2 = Scd2.asOf(h2, ts("2024-02-15 00:00:00"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(atT2 == Set((1L, "a"), (2L, "B"), (4L, "d")))
  }
}
