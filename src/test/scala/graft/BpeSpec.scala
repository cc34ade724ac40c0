package graft

import graft.functions.BpeExprs
import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training against the hand-computable corpus from Sennrich et al.
  * 2016 (low/lower/newest/widest): the learned merge list, its
  * determinism under repartitioning, greedy left-to-right apply
  * semantics, and encode round-trip (concatenating a word's tokens minus
  * the marker reproduces the word). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the paper's weighted vocabulary
  def vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L)).toDF("word", "c")

  test("fit learns the textbook merge sequence, tie-broken (cnt, pair)") {
    val merges = Bpe.fit(vocab, numMerges = 5)
    // round 1: "e s"(9) ties "s t"(9) and "t </w>"(9) → pair ASC
    assert(merges == Seq("e s", "es t", "est </w>", "l o", "lo w"),
      s"got $merges")
    // determinism: a different partitioning learns the same merges
    assert(Bpe.fit(vocab.repartition(5), 5) == merges)
  }

  test("fit stops early when no pair reaches minCount") {
    val tiny = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "c")
    assert(Bpe.fit(tiny, 10, minCount = 2L).isEmpty)
    // with minCount=1 it keeps merging until single symbols per word
    val all = Bpe.fit(tiny, 100, minCount = 1L)
    assert(all.nonEmpty && all.size <= 6)
  }

  test("merge pass is greedy left-to-right; encode round-trips") {
    val got = spark.range(1)
      .select(BpeExprs.mergePass(
        typedLit(Seq("a", "a", "a")), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(got == Seq("aa", "a"), s"greedy: $got")
    val merges = Bpe.fit(vocab, 5)
    val toks = Seq("lowest").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("low", "est</w>"), s"encode(lowest) = $toks")
    // round-trip: concat(tokens) minus the marker == word
    assert(toks.mkString.replace("</w>", "") == "lowest")
  }

  test("save/load round-trips the model (merges + vocab, order intact)") {
    val wc = Bpe.wordCounts(Seq("low lower").toDF("text"), col("text"))
    val merges = Bpe.fit(wc, 4, minCount = 1L)
    val vocab = Bpe.fullVocab(wc, merges)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe").resolve("model").toString
    Bpe.save(spark, path, merges, vocab)
    assert(Bpe.load(spark, path) == ((merges, vocab)))
    // re-publish overwrites atomically
    Bpe.save(spark, path, merges.take(2), vocab)
    assert(Bpe.load(spark, path)._1 == merges.take(2))
  }

  test("duplicate merged symbols: vocab dedupes keep-first, encodeIds" +
      " builds a legal map (ANSI dup-key policy would throw)") {
    // 'a bc' and 'ab c' both concatenate to 'abc' — raw vocab would
    // hold the symbol twice and map() would throw at runtime
    val merges = Seq("b c", "a bc", "a b", "ab c")
    val wc = Seq(("abc", 2L)).toDF("word", "c")
    val vocab = Bpe.fullVocab(wc, merges)
    assert(vocab.count(_ == "abc") == 1, s"dedupe keep-first: $vocab")
    assert(vocab == Seq("a", "b", "c", "</w>", "bc", "abc", "ab"))
    // encodeIds runs (no dup-key throw) and maps to the FIRST id
    val ids = Seq("abc").toDF("text")
      .select(Bpe.encodeIds(col("text"), merges, vocab).as("ids"))
      .head().getSeq[Int](0)
    assert(ids.head == vocab.indexOf("abc"), s"ids=$ids vocab=$vocab")
  }

  test("wordCounts + round-one pair counts match a hand count") {
    val wc = Bpe.wordCounts(
      Seq("low low", "low newest").toDF("text"), col("text"))
    val counts = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("low" -> 3L, "newest" -> 1L))
    val pairs = wc.select(col("c"),
        explode(Bpe.adjacentPairs(Bpe.charSymbols(col("word")))).as("pair"))
      .groupBy("pair").agg(sum("c").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs("l o") == 3L && pairs("o w") == 3L &&
      pairs("w </w>") == 3L && pairs("t </w>") == 1L)
  }
}
