package graft.operators

import graft.functions.BpeExprs
import graft.functions.TextFns.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the step a
  * large-scale training-data pipeline runs BEFORE token counting, packing
  * and quota sampling make sense: learn the subword vocabulary from the
  * corpus itself (Sennrich, Haddow & Birch, "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016 — the recipe GPT-2's and
  * most open tokenizers descend from).
  *
  * Scale design — the word-frequency trick is what makes this tractable:
  * the corpus folds ONCE into (word, count) — one shuffle, vocabulary-
  * sized output (~10M rows for 100 TB of text, thousands of times smaller
  * than the corpus). Every merge round then runs on that weighted
  * vocabulary: one pair-count aggregate (map-side combined, pair-keyed)
  * plus one narrow merge-apply pass ([[graft.functions.BpeMergeExpr]], a
  * native codegen'd loop). Rounds are inherently SEQUENTIAL (merge r+1's
  * counts depend on merge r's rewrite) — the same blocking-iteration cost
  * model as [[KMeans]]/PageRank, bounded here by vocabulary size, not
  * corpus size. Lineage per round is cut by an eager localCheckpoint so
  * round r's plan never re-derives rounds 1..r-1.
  *
  * Determinism: ties in pair counts break (count DESC, pair ASC), so the
  * learned merge list is a pure function of the corpus — bit-identical
  * across partitionings and engines (the t20 catalog query oracles round
  * one against DuckDB).
  *
  * Symbols never contain spaces (words are whitespace tokens), so the
  * "a b" pair encoding and single-space split in encode are lossless.
  */
object Bpe {

  /** Corpus → weighted word vocabulary: (word, c). */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Initial symbol decomposition: chars + the end-of-word marker. */
  def charSymbols(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0),
      array(lit("</w>")))

  /** Adjacent symbol pairs as "a b" strings (empty for 1-symbol arrays). */
  def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (x, y) => concat_ws(" ", x, y))

  /** Learn `numMerges` merges from a (word, c) vocabulary. Stops early
    * when no pair reaches `minCount`. Returns merges in training order as
    * "a b" strings. */
  def fit(wordCounts: DataFrame, numMerges: Int,
      minCount: Long = 2L): Seq[String] = {
    var vocab = wordCounts
      .select(col("c"), charSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done && merges.size < numMerges) {
      val best = vocab
        .select(col("c"), explode(adjacentPairs(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(1) < minCount) done = true
      else {
        val pair = best(0).getString(0)
        val sp = pair.indexOf(' ')
        merges += pair
        val next = vocab.withColumn("syms",
          BpeExprs.mergePass(col("syms"), pair.substring(0, sp),
            pair.substring(sp + 1))).localCheckpoint()
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Tokenize: whitespace words → subword tokens under the merge list
    * (one narrow codegen'd pass; no shuffle). */
  def encode(text: Column, merges: Seq[String]): Column =
    flatten(transform(tokens(text), w => BpeExprs.encode(w, merges)))

  /** The learned vocabulary: every distinct symbol producible by the
    * merge list — single chars and "</w>" plus one entry per merge. */
  def vocabOf(merges: Seq[String]): Seq[String] =
    merges.map(_.replace(" ", ""))

  /** Full id-stable vocabulary: observed base chars (sorted) + the
    * end-of-word marker + one merged symbol per merge in training
    * order. Index in this list IS the token id — a pure function of
    * (corpus, merges), so ids are reproducible across exports. */
  def fullVocab(wordCounts: DataFrame, merges: Seq[String]): Seq[String] = {
    val chars = wordCounts
      .select(explode(filter(split(col("word"), ""),
        s => length(s) > 0)).as("c"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    // distinct KEEP-FIRST: two merges can concatenate to the same
    // symbol ('a bc' and 'ab c' both yield 'abc'); the id is then the
    // first occurrence, and the map literal in encodeIds stays
    // duplicate-free (map() throws on dup keys under ANSI dedup policy)
    ((chars :+ "</w>") ++ vocabOf(merges)).distinct
  }

  /** Persist a trained model (ordered merges + id-stable vocab) as a
    * parquet artifact through the checked atomic swap — training jobs
    * re-publish without readers ever seeing a half-written model. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
      merges: Seq[String], vocab: Seq[String],
      store: CommitStore = CommitStore.local): Unit = {
    import spark.implicits._
    val df = merges.zipWithIndex.map { case (m, i) =>
      ("merge", i, m) }.toSeq ++
      vocab.zipWithIndex.map { case (v, i) => ("vocab", i, v) }
    Incremental.atomicOverwrite(store, path)(tmp =>
      df.toDF("kind", "idx", "value").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp))
  }

  /** Load a model saved by [[save]]: (merges, vocab) in training order. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[String], Seq[String]) = {
    val rows = spark.read.parquet(path)
      .orderBy(col("kind"), col("idx"))
      .collect().map(r => (r.getString(0), r.getString(2)))
    (rows.filter(_._1 == "merge").map(_._2).toSeq,
      rows.filter(_._1 == "vocab").map(_._2).toSeq)
  }

  /** Tokenize to TOKEN IDS under (merges, vocab): the trained model's
    * export form. Symbols outside the vocabulary (chars never seen at
    * fit time) map to -1, the UNK convention — `try_element_at` because
    * ANSI mode makes plain map access throw on absent keys. */
  def encodeIds(text: Column, merges: Seq[String],
      vocab: Seq[String]): Column = {
    // defensive keep-first dedupe for callers passing a hand-built
    // vocab with duplicate symbols (fullVocab already dedupes)
    val m = map(vocab.zipWithIndex.groupBy(_._1).view
      .mapValues(_.head._2).toSeq.sortBy(_._2)
      .flatMap { case (s, i) => Seq(lit(s), lit(i)) }: _*)
    transform(encode(text, merges),
      t => coalesce(try_element_at(m, t), lit(-1)))
  }
}
