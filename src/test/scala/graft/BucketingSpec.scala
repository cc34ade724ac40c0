package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout's contract is a PHYSICAL-PLAN property: an
  * equi-join of two tables bucketed on the join key must not shuffle
  * either side. The spec asserts exactly that (plus result correctness
  * vs the plain join). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case _: ShuffleExchangeLike => Seq(p)
      case _ => Nil
    }
    val kids = p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    })
    self ++ kids.flatMap(shuffles)
  }

  test("bucketed equi-join plans with zero shuffle exchanges and matches" +
      " the unbucketed result") {
    val orders = Tables.orders(spark, sf)
    val custs = Tables.customer(spark, sf)
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_custkey", "custkey"), "b_orders",
      "custkey", 4)
    Bucketing.writeBucketed(
      custs.withColumnRenamed("c_custkey", "custkey"), "b_customer",
      "custkey", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join regime (the one bucketing exists for);
      // with broadcast on, the small side would hide the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cojoin(spark, "b_orders", "b_customer",
        "custkey")
      val n = joined.count()
      assert(n > 0)
      val exchanges = shuffles(joined.queryExecution.executedPlan)
      assert(exchanges.isEmpty,
        s"expected no shuffle on bucketed join, found:\n$exchanges")
      // same rows as the ordinary join of the raw tables
      val plain = orders.join(custs,
        orders("o_custkey") === custs("c_custkey")).count()
      assert(n == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("a NON-bucketed shuffle join of the same tables does shuffle" +
      " (the control)") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sf)
      val custs = Tables.customer(spark, sf)
      val joined = orders.join(custs,
        orders("o_custkey") === custs("c_custkey"))
      joined.count()
      assert(shuffles(joined.queryExecution.executedPlan).nonEmpty)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
