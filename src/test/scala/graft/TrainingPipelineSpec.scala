package graft

import graft.functions.TextFns.{shingles, tokens}
import graft.operators.{CorpusOps, NearDup, Packing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operators COMPOSE into the canonical training-data curation
  * pipeline: quality gate → near-dup canonicalization → split →
  * decontamination against the test split → sequence packing. Each stage
  * is unit/oracle-gated on its own; this spec pins the end-to-end user
  * story on the real corpus: counts fall monotonically, the kept set is
  * duplicate-free and test-disjoint, packing conserves every surviving
  * token, and the whole chain is deterministic on recompute. */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def curate() = {
    val docs = Tables.documents(spark, sf)

    // 1. quality gate
    val quality = CorpusOps.qualityScore(
      docs.select(col("doc_id"), col("source"), col("text")),
      "doc_id", "text", stopwords = Seq("the", "a"))
      .filter(col("quality_ok"))
      .select(col("doc_id"), col("source"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))

    // 2. near-dup canonicalization (LSH clusters; docs without a near
    // dup are their own canonical)
    val clusters = NearDup.clusters(quality, "doc_id", "text")
    val canonical = quality
      .join(clusters.filter(!col("is_canonical"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")

    // 3. deterministic split
    val split = CorpusOps.hashSplit(canonical, "doc_id")

    // 4. decontamination: drop TRAIN docs sharing any 5-gram with TEST
    val grams = split.select(col("doc_id"), col("split"),
      explode(shingles(tokens(col("text")), 5)).as("gram"))
    val testGrams = grams.filter(col("split") === "test")
      .select(col("gram")).distinct()
    val contaminated = grams.filter(col("split") === "train")
      .join(broadcast(testGrams), Seq("gram"))
      .select(col("doc_id")).distinct()
    val clean = split.filter(col("split") =!= "train")
      .unionByName(split.filter(col("split") === "train")
        .join(contaminated, Seq("doc_id"), "left_anti"))

    // 5. pack the train split into 128-token sequences per source
    val packed = Packing.pack(
      clean.filter(col("split") === "train")
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), capacity = 128)

    (docs, quality, canonical, split, clean, packed)
  }

  test("the curation chain composes: monotone counts, dup-free and" +
      " test-disjoint output, token-conserving pack") {
    val (docs, quality, canonical, split, clean, packed) = curate()
    val n0 = docs.count(); val n1 = quality.count()
    val n2 = canonical.count(); val n3 = clean.count()
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 > 0)

    // kept set has no exact duplicate text
    val kept = clean.select(md5(col("text")).as("h"))
    assert(kept.count() == kept.distinct().count())

    // train and test doc sets are disjoint
    val train = clean.filter(col("split") === "train").select("doc_id")
    val test = clean.filter(col("split") === "test").select("doc_id")
    assert(train.join(test, Seq("doc_id")).count() == 0)

    // packing conserves every surviving train token
    val totalTokens = clean.filter(col("split") === "train")
      .select(sum(size(tokens(col("text"))))).as[Long].head()
    val packedTokens = packed.select(sum(col("n_tokens"))).as[Long].head()
    assert(totalTokens == packedTokens)
    // offsets are contiguous per shard: max cum_end == shard token sum
    val byShard = packed.groupBy(col("source"))
      .agg(max(col("cum_end")).as("m"), sum(col("n_tokens")).as("s"))
      .filter(col("m") =!= col("s"))
    assert(byShard.count() == 0)
  }

  test("the chain is deterministic end-to-end (recompute-identical)") {
    val a = curate()._5.select("doc_id", "split")
      .as[(Long, String)].collect().toSet
    val b = curate()._5.select("doc_id", "split")
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("the tokenizer stage composes: BPE merges learned ON the curated" +
      " train split, packing by LEARNED token counts conserves tokens") {
    val (_, _, _, _, clean, _) = curate()
    val train = clean.filter(col("split") === "train")
      .select(col("doc_id"), col("source"), col("text"))
    val merges = graft.operators.Bpe.fit(
      graft.operators.Bpe.wordCounts(train, col("text")), numMerges = 20)
    assert(merges.size == 20, s"corpus supports 20 merges: $merges")
    // encode round-trip: stripping markers reconstructs the text's words
    val enc = train.select(col("doc_id"), col("text"),
      graft.operators.Bpe.encode(col("text"), merges).as("toks"))
    val bad = enc.filter(
      regexp_replace(array_join(col("toks"), ""), "</w>", "") =!=
        array_join(tokens(col("text")), "")).count()
    assert(bad == 0, s"$bad docs fail the encode round-trip")
    // repack by learned-token counts instead of whitespace counts
    val packed = Packing.pack(
      enc.join(train.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), capacity = 256)
    val total = enc.select(sum(size(col("toks")))).as[Long].head()
    val packedTotal = packed.select(sum(col("n_tokens"))).as[Long].head()
    assert(total == packedTotal, "packing conserves learned tokens")
  }
}
