package graft

import graft.operators.{Bpe, RangeJoin, ShardWriter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data export contracts: deterministic shard assignment and
  * within-shard order (re-export reproduces every manifest row),
  * ~balanced shards, manifest integrity (verify catches a mutated
  * shard), plus the Bpe token-id export form and RangeJoin.autoWidth. */
class ShardWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def corpus = spark.range(0, 2000).select(
    col("id"), (col("id") % 97 + 1).as("n_tokens"))

  test("export is deterministic, balanced, and self-verifying") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val m1 = ShardWriter.write(spark, corpus, col("id"),
      col("n_tokens"), dir, n = 8).collect()
    assert(m1.length == 8, "one manifest row per shard")
    // balance: no shard more than 2x the ideal 250
    val sizes = m1.map(_.getAs[Long]("rows"))
    assert(sizes.sum == 2000 && sizes.max <= 500,
      s"unbalanced: ${sizes.toSeq}")
    // token accounting is exact
    assert(m1.map(_.getAs[Long]("tokens")).sum ==
      corpus.select(sum("n_tokens")).as[Long].head())
    // determinism: a re-export from a differently-partitioned source
    // reproduces every manifest row
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_shards2").toString
    val m2 = ShardWriter.write(spark, corpus.repartition(13), col("id"),
      col("n_tokens"), dir2, n = 8).collect()
    assert(m1.map(_.toSeq).toSet == m2.map(_.toSeq).toSet)
    // stored manifest matches the written data
    assert(ShardWriter.verify(spark, dir, col("id"),
      col("n_tokens")).isEmpty)
    // readShard returns the shard's full row set in deterministic order
    val s0a = ShardWriter.readShard(spark, dir, 0, col("id"))
      .select("id").as[Long].collect().toSeq
    val s0b = ShardWriter.readShard(spark, dir2, 0, col("id"))
      .select("id").as[Long].collect().toSeq
    assert(s0a == s0b && s0a.nonEmpty)
    // tampering is detected: drop a row from one shard and re-verify
    val tampered = spark.read.parquet(s"$dir/data/__shard=3")
      .filter(col("id") =!= lit(s0FirstIdOf(dir, 3)))
    tampered.write.mode("overwrite")
      .parquet(s"$dir/data/__shard=3_tmp")
    // overwrite shard 3 with the tampered copy
    val fs = java.nio.file.Paths.get(dir, "data")
    deleteRec(fs.resolve("__shard=3"))
    java.nio.file.Files.move(fs.resolve("__shard=3_tmp"),
      fs.resolve("__shard=3"))
    assert(ShardWriter.verify(spark, dir, col("id"),
      col("n_tokens")) == Seq(3))
  }

  private def s0FirstIdOf(dir: String, shard: Int): Long =
    ShardWriter.readShard(spark, dir, shard, col("id"))
      .select("id").as[Long].head()

  private def deleteRec(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).iterator().asScala.toSeq
        .foreach(deleteRec)
    java.nio.file.Files.deleteIfExists(p)
  }

  test("Bpe token-id export: stable ids, UNK for unseen chars") {
    val wc = Bpe.wordCounts(Seq("low low lower").toDF("text"), col("text"))
    val merges = Bpe.fit(wc, 3, minCount = 1L)
    val vocab = Bpe.fullVocab(wc, merges)
    // base chars sorted, then marker, then merges in training order
    assert(vocab.take(5) == Seq("e", "l", "o", "r", "w"))
    assert(vocab(5) == "</w>")
    assert(vocab.drop(6) == merges.map(_.replace(" ", "")))
    val ids = Seq("low lox").toDF("text")
      .select(Bpe.encodeIds(col("text"), merges, vocab).as("ids"))
      .head().getSeq[Int](0)
    // every id valid or -1; the unseen char 'x' maps to -1 somewhere
    assert(ids.forall(i => i == -1 || (i >= 0 && i < vocab.size)))
    assert(ids.contains(-1), s"'x' was never in the vocab: $ids")
    // the known word round-trips through ids (no UNK in 'low')
    val lowIds = Seq("low").toDF("text")
      .select(Bpe.encodeIds(col("text"), merges, vocab).as("ids"))
      .head().getSeq[Int](0)
    assert(lowIds.forall(_ >= 0))
    assert(lowIds.map(vocab).mkString.replace("</w>", "") == "low")
  }

  test("RangeJoin.autoWidth tracks the span distribution") {
    val iv = Seq.tabulate(100)(i => (i.toDouble, i + 10.0))
      .toDF("lo", "hi")
    val w = RangeJoin.autoWidth(iv, col("lo"), col("hi"))
    assert(w == 10.0, s"uniform 10-wide spans → width 10, got $w")
  }
}
