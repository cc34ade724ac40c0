package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid-bucketed range join vs the naive non-equi join it replaces:
  * identical result sets (points×intervals and interval-overlap,
  * including boundary half-openness and multi-cell spans), exactly-once
  * emission for pairs sharing several grid cells, and an equi-join plan
  * (no nested-loop node) — the property that makes it shuffleable at
  * large×large scale. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def points = {
    val r = new scala.util.Random(7)
    (0 until 500).map(i => (i.toLong, r.nextDouble() * 100))
      .toDF("pid", "v")
  }
  def intervals = {
    val r = new scala.util.Random(11)
    (0 until 80).map { i =>
      val lo = r.nextDouble() * 95
      (i.toLong, lo, lo + r.nextDouble() * 20) // spans cross many cells
    }.toDF("iid", "lo", "hi")
  }

  test("pointInInterval == naive non-equi join; equi-join plan") {
    val got = RangeJoin.pointInInterval(points, intervals,
      col("v"), col("lo"), col("hi"), bucketWidth = 5.0)
      .select("pid", "iid")
    val want = points.join(intervals,
      col("lo") <= col("v") && col("v") < col("hi"))
      .select("pid", "iid")
    assert(TestSpark.rows(got) == TestSpark.rows(want))
    // exactly-once: no duplicate (pid, iid) pairs
    assert(got.count() == got.distinct().count())
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"bucketed join must be an equi-join:\n$plan")
  }

  test("pointInInterval with equiKeys == naive keyed non-equi join; " +
      "the key is IN the join, not a post-filter") {
    val kp = points.withColumn("k", col("pid") % 7)
    val ki = intervals.withColumn("k", col("iid") % 7)
    val got = RangeJoin.pointInInterval(kp, ki,
      col("v"), col("lo"), col("hi"), bucketWidth = 5.0,
      equiKeys = Seq("k"))
      .select("pid", "iid")
    val want = kp.join(ki.withColumnRenamed("k", "k2"),
      col("k") === col("k2") &&
        col("lo") <= col("v") && col("v") < col("hi"))
      .select("pid", "iid")
    assert(TestSpark.rows(got) == TestSpark.rows(want))
    assert(got.count() == got.distinct().count())
    // the equi key must be part of the hash-join key (cell, k) — the
    // join condition in the plan mentions k, and no NLJ/cartesian node
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"keyed bucketed join must stay an equi-join:\n$plan")
    assert("\\[__cell[^\\]]*, k".r.findFirstIn(plan).isDefined ||
      plan.contains("k#"), s"k not in join keys:\n$plan")
  }

  test("overlapJoin == naive overlap join, exactly once per pair") {
    val a = intervals.select(col("iid").as("aid"), col("lo").as("alo"),
      col("hi").as("ahi"))
    val b = intervals.select(col("iid").as("bid"), col("lo").as("blo"),
      col("hi").as("bhi"))
    val got = RangeJoin.overlapJoin(a, b, col("alo"), col("ahi"),
      col("blo"), col("bhi"), bucketWidth = 4.0)
      .select("aid", "bid")
    val want = a.join(b,
      col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid")
    assert(TestSpark.rows(got) == TestSpark.rows(want))
    assert(got.count() == want.count(), "one row per overlapping pair")
  }

  test("half-open boundary: pt == hi never matches, pt == lo does") {
    val p = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "v")
    val i = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, i, col("v"), col("lo"),
      col("hi"), 3.0).select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
