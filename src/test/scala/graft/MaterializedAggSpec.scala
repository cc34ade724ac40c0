package graft

import graft.operators.MaterializedAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental aggregate maintenance converges to the full recompute:
  * any sequence of batch refreshes yields exactly groupBy over the union
  * of the batches (exact decimal addition), and derived averages match. */
class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sequential refreshes == one-shot aggregate over all batches") {
    val base = Files.createTempDirectory("graft_magg").toString
    val tgt = s"$base/rollup"
    val batches = Seq(
      Seq(("a", 1.25), ("a", 2.50), ("b", 10.00)),
      Seq(("b", 0.75), ("c", 3.00)),
      Seq(("a", 4.00), ("c", 1.00), ("c", 2.00)))
    val magg = new MaterializedAgg(spark, tgt, Seq("k"), Seq("v"))
    batches.foreach(b => magg.refresh(b.toDF("k", "v")))

    val incremental = magg.read()
      .select(col("k"), col("n_rows"),
        col("sum_v").cast("double").as("sum_v"), col("avg_v"))
      .as[(String, Long, Double, Double)].collect().toSet
    val full = batches.flatten.toDF("k", "v")
      .groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(22,2)")).cast("double").as("sum_v"))
      .withColumn("avg_v", col("sum_v") / col("n_rows").cast("double"))
      .as[(String, Long, Double, Double)].collect().toSet
    assert(incremental == full)
    assert(incremental.map(_._1) == Set("a", "b", "c"))
  }

  test("stored sum schema is stable across refreshes (decimal(38,2)" +
      " on the first write AND after every merge)") {
    val base = Files.createTempDirectory("graft_magg3").toString
    val tgt = s"$base/rollup"
    val magg = new MaterializedAgg(spark, tgt, Seq("k"), Seq("v"))
    magg.refresh(Seq(("a", 1.00)).toDF("k", "v"))
    val first = spark.read.parquet(tgt).schema("sum_v").dataType
    magg.refresh(Seq(("a", 2.00)).toDF("k", "v"))
    val merged = spark.read.parquet(tgt).schema("sum_v").dataType
    assert(first == merged, s"schema flipped: $first -> $merged")
    assert(first == org.apache.spark.sql.types.DecimalType(38, 2))
  }

  test("a refresh only aggregates the batch — totals for untouched keys" +
      " are carried, not recomputed") {
    val base = Files.createTempDirectory("graft_magg2").toString
    val tgt = s"$base/rollup"
    val magg = new MaterializedAgg(spark, tgt, Seq("k"), Seq("v"))
    magg.refresh(Seq(("x", 5.00), ("y", 1.00)).toDF("k", "v"))
    magg.refresh(Seq(("y", 2.00)).toDF("k", "v")) // touches only y
    val out = magg.read().select(col("k"), col("n_rows"),
      col("sum_v").cast("double")).as[(String, Long, Double)]
      .collect().toSet
    assert(out == Set(("x", 1L, 5.0), ("y", 2L, 3.0)))
  }
}
