package graft

import graft.operators.{KmvRollup, KmvSketch, ShardWriter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental KMV rollup: batch-order-independent folds that equal the
  * sketch of the concatenated history, set algebra off the stored state
  * alone; plus ShardWriter.writeIncremental rewriting ONLY drifted
  * shards (untouched shard files stay byte-identical). */
class KmvRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_kmv").resolve("t").toString

  def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      when(col("id") % 2 === 0, "even").otherwise("odd").as("seg"),
      col("id"))

  test("rollup folds == one-shot sketch of the union; order-free") {
    val t1 = tmp()
    val r1 = new KmvRollup(spark, t1, "seg", "id", k = 32)
    r1.refresh(batch(0, 400)); r1.refresh(batch(400, 1000))
    val t2 = tmp()
    val r2 = new KmvRollup(spark, t2, "seg", "id", k = 32)
    r2.refresh(batch(400, 1000)); r2.refresh(batch(0, 400))
    def sk(t: KmvRollup) = t.read().select("seg", "sk").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sk(r1) == sk(r2), "refresh order must not matter")
    val direct = KmvSketch.sketch(batch(0, 1000), "seg", col("id"), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sk(r1) == direct, "rollup == sketch of concatenated history")
    // estimates within 3σ of truth (500 distinct per segment)
    r1.read().select("seg", "distinct_est").collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 500.0) <= 3.0 / math.sqrt(30) * 500,
        s"${r.getString(0)}: ${r.getDouble(1)}")
    }
    // set algebra off the stored state: even/odd are disjoint
    val ov = r1.overlaps().head()
    assert(ov.getAs[Double]("jaccard_est") == 0.0,
      "disjoint segments must show zero sketch overlap")
  }

  test("streaming refresh: foreachBatch folds micro-batches into the" +
      " sketch table; the result equals the batch rollup") {
    val in = java.nio.file.Files
      .createTempDirectory("graft_kmvstream").toString
    val data = s"$in/data"
    val t = tmp()
    batch(0, 300).write.parquet(data)
    val r = new KmvRollup(spark, t, "seg", "id", k = 32)
    val stream = spark.readStream
      .schema(batch(0, 1).schema).parquet(data)
    val q = stream.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) => r.refresh(b)
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$in/_cp").start()
    q.awaitTermination()
    batch(300, 700).write.mode("append").parquet(data)
    val q2 = stream.writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, _: Long) => r.refresh(b)
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$in/_cp").start()
    q2.awaitTermination()
    val streamed = r.read().select("seg", "sk").collect()
      .map(x => x.getString(0) -> x.getSeq[String](1)).toMap
    val direct = KmvSketch.sketch(batch(0, 700), "seg", col("id"), 32)
      .collect().map(x => x.getString(0) -> x.getSeq[String](1)).toMap
    assert(streamed == direct,
      "streamed folds must equal the batch rollup of the same rows")
  }

  test("writeIncremental rewrites only drifted shards; removed-row and" +
      " first-write paths work") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_incshard").toString
    val base = spark.range(0, 1000).select(col("id"),
      (col("id") % 31 + 1).as("n_tokens"))
    // first call: no manifest → full export
    val first = ShardWriter.writeIncremental(spark, base, col("id"),
      col("n_tokens"), dir, n = 6)
    assert(first == (0 until 6))
    assert(ShardWriter.verify(spark, dir, col("id"),
      col("n_tokens")).isEmpty)
    // no change → nothing rewritten, files untouched
    val before = fileTimes(dir)
    assert(ShardWriter.writeIncremental(spark, base, col("id"),
      col("n_tokens"), dir, 6).isEmpty)
    assert(fileTimes(dir) == before, "no-op must not touch shard files")
    // change ONE row → only its shard rewrites
    val changed = base.withColumn("n_tokens",
      when(col("id") === 77, lit(999L)).otherwise(col("n_tokens")))
    val rewritten = ShardWriter.writeIncremental(spark, changed,
      col("id"), col("n_tokens"), dir, 6)
    val shardOf77 = spark.range(77, 78)
      .select(ShardWriter.shardOf(col("id"), 6)).head().getInt(0)
    assert(rewritten == Seq(shardOf77), s"expected $shardOf77: $rewritten")
    assert(ShardWriter.verify(spark, dir, col("id"),
      col("n_tokens")).isEmpty)
    // untouched shards' files are byte-identical (same mtimes)
    val after = fileTimes(dir)
    val touchedPrefix = s"__shard=$shardOf77"
    assert(before.filter(!_._1.contains(touchedPrefix)) ==
      after.filter(!_._1.contains(touchedPrefix)),
      "untouched shard files must remain byte-identical")
    // rows removed → affected shards rewrite and verify stays green
    val shrunk = changed.filter(col("id") >= 10)
    val rewritten2 = ShardWriter.writeIncremental(spark, shrunk,
      col("id"), col("n_tokens"), dir, 6)
    assert(rewritten2.nonEmpty)
    assert(ShardWriter.verify(spark, dir, col("id"),
      col("n_tokens")).isEmpty)
    assert(spark.read.parquet(s"$dir/data").count() == 990)
  }

  private def fileTimes(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .toMap
  }
}
