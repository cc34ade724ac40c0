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
