package graft

import graft.operators.CmsRollup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental count-min rollup: never undercounts, overcount inside
  * the εN bound, incremental folds equal the one-shot build, unseen
  * keys read as (near-)zero. */
class CmsRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_cms").resolve("t").toString

  // Zipf-ish: key k appears 1000/k times, k = 1..50 (N = ~4500)
  def corpus = spark.range(1, 51).select(col("id"))
    .withColumn("reps", (lit(1000) / col("id")).cast("int"))
    .select(explode(sequence(lit(1), col("reps"))).as("i"),
      concat(lit("k"), col("id")).as("key"))
    .select("key")

  test("no undercount; overcount within eps*N; incremental == one-shot") {
    val t1 = tmp()
    val r = new CmsRollup(spark, t1, "key", depth = 4, width = 2048)
    r.refresh(corpus)
    val truth = corpus.groupBy("key").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val est = r.probe(corpus.distinct(), col("key")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val n = r.totalCount()
    assert(n == truth.values.sum)
    val eps = math.E / 2048 // CMS eps for this width
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k undercounted: ${est(k)} < $c")
      assert(est(k) <= c + math.ceil(3 * eps * n).toLong,
        s"$k overcounted: ${est(k)} vs $c (N=$n)")
    }
    // incremental: two half-batches == one-shot counters
    val t2 = tmp()
    val r2 = new CmsRollup(spark, t2, "key", depth = 4, width = 2048)
    val withRow = corpus.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("key"))))
    r2.refresh(withRow.filter(col("rn") % 2 === 0).select("key"))
    r2.refresh(withRow.filter(col("rn") % 2 === 1).select("key"))
    val a = spark.read.parquet(t1).collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val b = spark.read.parquet(t2).collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(a == b, "incremental folds must equal the one-shot build")
    // unseen keys: min-over-depth stays within the same bound
    val unseen = r.probe(Seq("never1", "never2").toDF("key"), col("key"))
      .collect().map(_.getLong(1))
    assert(unseen.forall(_ <= math.ceil(3 * eps * n).toLong),
      s"unseen keys outside bound: ${unseen.toSeq}")
  }
}
