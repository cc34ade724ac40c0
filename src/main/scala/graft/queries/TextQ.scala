package graft.queries

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis catalog over `documents`: language-ID scoring, quality
  * scoring, token counting, and rolling-hash fingerprinting — the per-doc
  * scoring passes of a training-data pipeline.
  *
  * All four are NARROW per-row transforms (zero shuffles except final
  * sorts/groupings) — exactly what you want when scoring 100 TB of text:
  * they pipeline inside whole-stage codegen on top of the parquet scan.
  *
  * (The corpus is synthetic with a shared vocabulary across langs, so
  * language-ID accuracy is meaningless here — the operator contract is the
  * deterministic scoring itself, verified against the oracle.)
  */
object TextQ {

  def all: Seq[Q] = Seq(t01LangId, t02QualityScore, t03TokenCount,
    t04Fingerprint, t05PiiScrub, t06CorpusFilter, t07HashSplit,
    t08SeqPack, t09MixtureSample, t10Tfidf, t11QuotaSample,
    t12Decontaminate, t13ChunkOverlap, t14Repetition, t15RareTokens,
    t16TrigramNovelty, t17TokenGini, t18BigramLm, t19ImportanceWeight,
    t20BpePairs, t21LmDocScore, t22GopherGrams, t23SourceFilter,
    t24CcnetBuckets, t25BenchContamination, t26DedupSavings)

  private[queries] val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "hash", "join", "row"),
    "en" -> Seq("the", "a", "order", "table"),
    "es" -> Seq("slow", "agg", "merge", "vector"),
    "fr" -> Seq("scan", "data", "query", "batch"),
    "zh" -> Seq("small", "column", "key", "line"))

  /** n-gram-heuristic language ID: per-language marker-token counts
    * (with multiplicity), argmax with lexicographic tiebreak. */
  val t01LangId: Q = Q("t01_lang_id", (s, d) => {
    // CorpusOps.languageId: explode + conditional aggregation, not 5
    // higher-order `filter` passes (each HOF lambda call is interpreted
    // — the whole corpus re-walked five times outside codegen, measured
    // 11s at sf0.1); the exploded form is one codegen'd hash aggregate,
    // `documents` is already hash-partitioned by doc_id so the groupBy
    // introduces no extra exchange, and the left join keeps docs with
    // zero tokens (scores 0), matching the per-row oracle.
    graft.operators.CorpusOps.languageId(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("text")), "doc_id", "text", markers)
      .select(Seq(col("doc_id"), col("lang"), col("pred_lang")) ++
        markers.map(m => col(s"score_${m._1}")): _*)
      .orderBy(col("doc_id"))
  }, {
    val scoreCols = markers.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(t, x -> list_contains([$list], x))) AS INT) AS score_$lang"
    }.mkString(",\n        ")
    val langs = markers.map(_._1)
    val pred = langs.init.foldRight(s"'${langs.last}'") { case (lang, rest) =>
      val isMax = langs.filter(_ != lang)
        .map(o => s"score_$lang >= score_$o").mkString(" AND ")
      s"CASE WHEN $isMax THEN '$lang' ELSE $rest END"
    }
    Some(s"""
    WITH toks AS (
      SELECT doc_id, lang,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
        $scoreCols
      FROM toks)
    SELECT doc_id, lang, $pred AS pred_lang,
      score_de, score_en, score_es, score_fr, score_zh
    FROM scored ORDER BY doc_id""")
  })

  /** Document quality scoring: length / token stats / stopword + distinct
    * ratios, composite score, keep/drop flag. Integer counts + a fixed
    * expression tree of double ops → deterministic. */
  val t02QualityScore: Q = Q("t02_quality_score", (s, d) => {
    graft.operators.CorpusOps.qualityScore(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("text")), "doc_id", "text", stopwords = Seq("the", "a"))
      .select(col("doc_id"), col("lang"), col("n_chars_actual"),
        col("n_tokens"), col("n_stop"), col("n_distinct"),
        col("avg_token_len"), col("stopword_ratio"),
        col("distinct_ratio"), col("quality_ok"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, lang, CAST(len(text) AS INT) AS n_chars_actual,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
      FROM documents),
    stats AS (
      SELECT doc_id, lang, n_chars_actual,
        CAST(len(t) AS INT) AS n_tokens,
        CAST(len(list_filter(t, x -> list_contains(['the', 'a'], x))) AS INT)
          AS n_stop,
        CAST(len(list_distinct(t)) AS INT) AS n_distinct,
        list_reduce(list_transform(t, x -> CAST(len(x) AS INT)),
          (a, b) -> a + b) AS sum_tok_len
      FROM toks)
    SELECT doc_id, lang, n_chars_actual, n_tokens, n_stop, n_distinct,
      CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_token_len,
      CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
      CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
      (n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.2
        AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.1) AS quality_ok
    FROM stats ORDER BY doc_id"""))

  /** Token counting three ways: whitespace, word-regex, and a BPE-ish
    * segmenter regex (≤4-char alpha runs, digits, punctuation). */
  val t03TokenCount: Q = Q("t03_token_count", (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .as("n_word_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]{1,4}|[0-9]|[^a-z0-9 ]"), lit(0))).as("n_bpeish_tokens"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id, n_chars,
      CAST(len(list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0)) AS INT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT)
        AS n_word_tokens,
      CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]'))
        AS INT) AS n_bpeish_tokens
    FROM documents ORDER BY doc_id"""))

  /** Rolling-hash fingerprint (winnowing-lite): md5 over every 8-char
    * shingle, fingerprint = 3 smallest hashes joined — robust to small
    * edits; docs sharing a fingerprint are near-dup candidates. */
  val t04Fingerprint: Q = Q("t04_fingerprint", (s, d) => {
    // Native RollingFpExpr: one loop computing the 3 smallest window
    // hashes directly — the transform+array_sort formulation materialized
    // and sorted ~1k 32-char strings per doc and its generated code was a
    // JIT hot spot (PLANS.md round 2). Byte-identical output
    // (FunctionsSpec proves equivalence in-engine); n_grams ==
    // greatest(len-7, 1) == size of the window sequence.
    val byFp = Window.partitionBy(col("fingerprint"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        greatest(length(col("text")) - 7, lit(1)).as("n_grams"),
        graft.functions.TextExprs.rollingFp(col("text"), 8, 3)
          .as("fingerprint"))
      .withColumn("n_same_fp", count(lit(1)).over(byFp))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH grams AS (
      SELECT doc_id,
        list_transform(range(1, greatest(len(text) - 7, 1) + 1),
          i -> md5(substr(text, i, 8))) AS g
      FROM documents),
    fps AS (
      SELECT doc_id, CAST(len(g) AS INT) AS n_grams,
        array_to_string(list_sort(g)[1:3], '|') AS fingerprint
      FROM grams)
    SELECT doc_id, n_grams, fingerprint,
      CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_same_fp
    FROM fps ORDER BY doc_id"""))

  /** PII-style scrubbing: blocklisted terms redacted in place (the shape
    * of the masking pass a training pipeline runs before tokenization).
    * Narrow per-row regexp work on top of the scan; the regex stays in
    * the RE2 ∩ java.util.regex common subset (\b word boundaries,
    * alternation) so both engines match identically. Output carries the
    * hit count and a digest of the scrubbed text, not the text itself —
    * at 100 TB you never shuffle the payload to audit the scrub. */
  val t05PiiScrub: Q = Q("t05_pii_scrub", (s, d) => {
    val pat = "\\b(customer|user|order)\\b"
    val scrubbed = regexp_replace(col("text"), pat, "[REDACTED]")
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_hits"),
        length(scrubbed).as("n_chars_scrubbed"),
        md5(scrubbed).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '\b(customer|user|order)\b'))
        AS INT) AS n_hits,
      CAST(len(regexp_replace(text, '\b(customer|user|order)\b',
        '[REDACTED]', 'g')) AS INT) AS n_chars_scrubbed,
      md5(regexp_replace(text, '\b(customer|user|order)\b',
        '[REDACTED]', 'g')) AS scrub_md5
    FROM documents ORDER BY doc_id"""))

  /** Corpus curation manifest: the keep/drop accounting a training-data
    * pipeline emits after its filter chain — quality gate (t02 semantics)
    * ∧ exact-dedup canonical (d01 semantics), per language. Disjoint
    * buckets: dropped_quality = fails the gate; dropped_dup = passes but
    * is a non-canonical duplicate; kept = the rest. One narrow pass + a
    * text-hash window + a tiny groupBy — the whole decision is computed
    * WITHOUT materializing any filtered copy of the corpus. */
  val t06CorpusFilter: Q = Q("t06_corpus_filter", (s, d) => {
    val stop = Seq("the", "a")
    val byHash = Window.partitionBy(col("text_hash"))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("text_hash"),
        tokens(col("text")).as("t"))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("n_stop", size(filter(col("t"), x => x.isin(stop: _*))))
      .withColumn("n_distinct", size(array_distinct(col("t"))))
      .withColumn("quality_ok",
        col("n_tokens") >= 20 &&
          col("n_stop").cast("double") / col("n_tokens") <= 0.2 &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.1)
      .withColumn("is_canonical",
        col("doc_id") === min(col("doc_id")).over(byHash))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality_ok") && col("is_canonical"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(!col("quality_ok"), 1L).otherwise(0L))
          .as("n_dropped_quality"),
        sum(when(col("quality_ok") && !col("is_canonical"), 1L)
          .otherwise(0L)).as("n_dropped_dup"))
      .orderBy(col("lang"))
  }, Some("""
    WITH scored AS (
      SELECT doc_id, lang, md5(text) AS text_hash,
        (CAST(len(t) AS INT) >= 20
         AND CAST(len(list_filter(t, x -> list_contains(['the','a'], x)))
           AS DOUBLE) / len(t) <= 0.2
         AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.1)
          AS quality_ok
      FROM (SELECT doc_id, lang, text,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t FROM documents)),
    flagged AS (
      SELECT lang, quality_ok,
        doc_id = MIN(doc_id) OVER (PARTITION BY text_hash) AS is_canonical
      FROM scored)
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN quality_ok AND is_canonical THEN 1 ELSE 0 END)
        AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN NOT quality_ok THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dropped_quality,
      CAST(SUM(CASE WHEN quality_ok AND NOT is_canonical THEN 1 ELSE 0 END)
        AS BIGINT) AS n_dropped_dup
    FROM flagged GROUP BY lang ORDER BY lang"""))

  /** Deterministic train/val/test split by content-independent key hash
    * (md5 of the id → 32-bit bucket mod 1000 → 80/10/10): stable across
    * runs and engines, no RNG, no shuffle — the split IS a pure column.
    * At 100 TB this is the only split that re-derives identically on
    * every recompute and survives repartitioning. */
  val t07HashSplit: Q = Q("t07_hash_split", (s, d) => {
    graft.operators.CorpusOps.hashSplit(
      Tables.documents(s, d).select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id,
      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 1000 AS bucket,
      CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) % 1000 < 800 THEN 'train'
        WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) % 1000 < 900 THEN 'val'
        ELSE 'test' END AS split
    FROM documents ORDER BY doc_id"""))

  /** Sequence packing (concat-and-chunk): lay each source's documents
    * end-to-end in deterministic doc_id order and cut the stream into
    * fixed-capacity token windows — the layout step that turns a filtered
    * corpus into training sequences. Each doc's placement is a running
    * token sum; the chunks it spans are pure arithmetic on that offset.
    *
    * The window partitions by `source`, so at 100 TB packing parallelizes
    * across sources/shards (a global pack would serialize on one task —
    * the per-shard pack is the shape real pipelines use; shard boundaries
    * just waste ≤1 partial chunk each). */
  val t08SeqPack: Q = Q("t08_seq_pack", (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
    graft.operators.Packing
      .pack(base, col("source"), col("doc_id"), col("n_tokens"), 128)
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, source,
        CAST(len(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS INT) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, source, n_tokens,
        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_end
      FROM toks)
    SELECT doc_id, source, n_tokens, cum_end,
      cum_end - n_tokens AS start_offset,
      CAST(floor((cum_end - n_tokens) / 128) AS BIGINT) AS first_chunk,
      CAST(floor((cum_end - 1) / 128) AS BIGINT) AS last_chunk,
      CAST(floor((cum_end - 1) / 128)
        - floor((cum_end - n_tokens) / 128) + 1 AS BIGINT) AS n_chunks
    FROM packed ORDER BY doc_id"""))

  /** Data-mixture sampling: given per-source mixture weights and a global
    * sample budget (40% of the corpus), derive each source's sampling
    * rate from its actual row count and sample deterministically by key
    * hash — the source-rebalancing step of training-data curation. The
    * weight here is a stand-in mixture config derived from the source id
    * (1..4); real pipelines would join a config table.
    *
    * Scale shape: per-source counts are a tiny aggregate, rates are
    * arithmetic on that 20-row table broadcast back to the corpus, and
    * the sample decision is a pure column (same md5-bucket idiom as t07)
    * — no RNG, no shuffle of the corpus, identical on recompute. */
  val t09MixtureSample: Q = Q("t09_mixture_sample", (s, d) => {
    val docs = Tables.documents(s, d)
    val weight = pmod(regexp_extract(col("source"), "([0-9]+)$", 1)
      .cast("long"), lit(4L)) + lit(1L)
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(1000L))
    val bySource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", weight)
    val totals = bySource.agg(sum(col("n_docs")).as("total_docs"),
      sum(col("weight")).as("w_sum"))
    val rates = bySource.crossJoin(broadcast(totals))
      .withColumn("n_target", floor(col("total_docs") * 2 / 5))
      .withColumn("rate",
        least(lit(1.0), col("n_target") * col("weight") / col("w_sum")
          / col("n_docs")))
      .withColumn("thresh", floor(col("rate") * 1000))
      .select(col("source"), col("n_docs"), col("weight"), col("thresh"))
    docs.select(col("source"), bucket.as("bucket"))
      .join(broadcast(rates), Seq("source"))
      .groupBy(col("source"), col("n_docs"), col("weight"), col("thresh"))
      .agg(sum(when(col("bucket") < col("thresh"), 1L).otherwise(0L))
        .as("n_sampled"))
      .orderBy(col("source"))
  }, Some("""
    WITH by_source AS (
      SELECT source, COUNT(*) AS n_docs,
        CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 + 1
          AS weight
      FROM documents GROUP BY source),
    totals AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
        CAST(SUM(weight) AS BIGINT) AS w_sum
      FROM by_source),
    rates AS (
      SELECT source, n_docs, weight,
        CAST(floor(least(1.0,
          floor(total_docs * 2 / 5) * weight / w_sum / n_docs) * 1000)
          AS BIGINT) AS thresh
      FROM by_source CROSS JOIN totals),
    flagged AS (
      SELECT d.source,
        CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) % 1000 < thresh THEN 1 ELSE 0 END AS sampled
      FROM documents d JOIN rates r ON d.source = r.source)
    SELECT r.source, n_docs, weight, thresh,
      CAST(SUM(sampled) AS BIGINT) AS n_sampled
    FROM flagged f JOIN rates r ON f.source = r.source
    GROUP BY r.source, n_docs, weight, thresh
    ORDER BY r.source"""))

  /** TF-IDF top terms per document: term frequency, document frequency,
    * idf as the plain N/df ratio (no transcendental log — the ratio ranks
    * identically and is engine-exact IEEE arithmetic), top-3 terms per
    * doc with a lexicographic tiebreak.
    *
    * The canonical scalable shape: tf shuffles on doc_id (already the
    * table's partitioning — no exchange), df is a pre-reduced term-keyed
    * aggregate joined back on term, the corpus count broadcasts, and the
    * top-k window shuffles the pre-reduced tf rows, never raw text. */
  val t10Tfidf: Q = Q("t10_tfidf", (s, d) => {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, t.term, tf, df,
        CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)
          AS score
      FROM tf t JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        ORDER BY score DESC, term) AS INT) AS rnk
      FROM scored)
    SELECT doc_id, rnk, term, tf, df, score
    FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** Stratified EXACT-quota sampling: exactly k docs per source, chosen
    * by ranking each stratum in key-hash order — t09's rate sampling
    * hits a quota only in expectation; this hits it exactly (training
    * mixtures are often specified as hard per-source counts). The hash
    * order makes the draw pseudo-random yet fully reproducible: same
    * corpus → same sample, on any engine, after any repartition.
    *
    * Scale: one window partitioned by source (parallel across strata).
    * When a single stratum is itself huge, per-partition top-k
    * pre-reduction (TakeOrdered-style) bounds the sort before the final
    * per-stratum cut — same idiom as q19's top-k. */
  val t11QuotaSample: Q = Q("t11_quota_sample", (s, d) => {
    val k = 10
    val w = Window.partitionBy(col("source"))
      .orderBy(col("draw"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("draw"))
      .withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= k)
      .select(col("source"), col("smp_rank"), col("doc_id"))
      .orderBy(col("source"), col("smp_rank"))
  }, Some("""
    WITH drawn AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS draw
      FROM documents),
    ranked AS (
      SELECT source, doc_id,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY draw, doc_id) AS INT) AS smp_rank
      FROM drawn)
    SELECT source, smp_rank, doc_id
    FROM ranked WHERE smp_rank <= 10
    ORDER BY source, smp_rank"""))

  /** Benchmark decontamination: flag TRAIN-split docs sharing any 5-token
    * word shingle with the held-out TEST split (t07's hash split defines
    * the splits, so train/test membership is itself deterministic). The
    * canonical eval-leakage check a training pipeline runs before
    * shipping a corpus.
    *
    * Scale shape: shingling is the same narrow per-row pass as d02; the
    * eval side is the SMALL side by construction (benchmark suites are
    * tiny next to a 100 TB corpus), so the overlap test is a broadcast
    * semi-ish join on the gram key — the train corpus never shuffles on
    * anything wider than its own (doc, gram) dedup. */
  val t12Decontaminate: Q = Q("t12_decontaminate", (s, d) => {
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(1000L))
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), bucket.as("bucket"),
        explode(graft.functions.TextExprs.shingles(
          tokens(col("text")), 5)).as("gram"))
    val trainGrams = grams.filter(col("bucket") < 800)
      .select(col("doc_id"), col("gram")).distinct()
    val evalGrams = grams.filter(col("bucket") >= 900)
      .select(col("gram")).distinct()
    val perDoc = trainGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val shared = trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared"))
    perDoc.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("shared"), lit(0L)).as("n_shared"),
        (coalesce(col("shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id,
        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          % 1000 AS bucket,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id, bucket,
        unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
          i -> array_to_string(t[i:i+4], ' '))) AS gram
      FROM toks),
    tg AS (SELECT DISTINCT doc_id, gram FROM grams WHERE bucket < 800),
    eg AS (SELECT DISTINCT gram FROM grams WHERE bucket >= 900),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM tg GROUP BY doc_id),
    sh AS (
      SELECT doc_id, COUNT(*) AS shared
      FROM tg JOIN eg USING (gram) GROUP BY doc_id)
    SELECT t.doc_id, n_grams, COALESCE(shared, 0) AS n_shared,
      COALESCE(shared, 0) > 0 AS contaminated
    FROM tot t LEFT JOIN sh USING (doc_id)
    ORDER BY doc_id"""))

  /** RAG-style chunking: overlapping fixed-size character windows
    * (size 64, stride 48 — 16-char overlap carries context across cuts),
    * emitted as (chunk_idx, offset, len, digest) descriptors. Explode of
    * a pure arithmetic sequence on top of the scan — a narrow generate,
    * no shuffle, no payload movement beyond the per-chunk digest (at
    * 100 TB the chunk TEXT would flow straight into the embedding stage,
    * never through an exchange). m02's frame sampling is the fixed-count
    * cousin; this one's chunk count scales with document length. */
  val t13ChunkOverlap: Q = Q("t13_chunk_overlap", (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      // zero-length docs chunk to NOTHING (the oracle's range() semantics);
      // without the filter+clamp, sequence(0, -1) would auto-step DOWN and
      // emit two bogus [0, -1] chunks for an empty document
      .filter(col("len") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(lit(0), floor((col("len") - 1) / 48)).cast("int"))))
      .withColumn("offset", col("chunk_idx") * 48)
      .select(col("doc_id"), col("chunk_idx"), col("offset"),
        least(lit(64), col("len") - col("offset")).as("chunk_len"),
        md5(col("text").substr(col("offset") + 1, lit(64))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }, Some("""
    WITH idx AS (
      SELECT doc_id, text, CAST(len(text) AS INT) AS len,
        CAST(unnest(range(0, (len(text) - 1) // 48 + 1)) AS INT)
          AS chunk_idx
      FROM documents)
    SELECT doc_id, chunk_idx, chunk_idx * 48 AS offset,
      least(64, len - chunk_idx * 48) AS chunk_len,
      md5(substr(text, chunk_idx * 48 + 1, 64)) AS chunk_md5
    FROM idx
    ORDER BY doc_id, chunk_idx"""))

  /** Within-document repetition scoring: the fraction of 8-token shingles
    * that are repeats of an earlier shingle in the SAME document — the
    * boilerplate/loop-output filter every LLM data pipeline runs (distinct
    * from t12, which measures overlap ACROSS documents). Narrow per-row
    * array work on top of the scan, zero shuffles: counting distinct
    * shingles inside one row needs no exchange at any corpus size. Docs
    * too short for a single shingle score null (no evidence ≠ clean). */
  val t14Repetition: Q = Q("t14_repetition", (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextExprs.shingles(tokens(col("text")), 8).as("g"))
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        size(array_distinct(col("g"))).as("n_distinct"))
      .withColumn("repetition_ratio",
        when(col("n_grams") === 0, lit(null)).otherwise(
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_grams").cast("double")))
      .withColumn("repetitive", col("repetition_ratio") >= 0.2)
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
        list_transform(range(1, greatest(len(t) - 7, 0) + 1),
          i -> array_to_string(t[i:i+7], ' ')) AS g
      FROM toks),
    stats AS (
      SELECT doc_id, CAST(len(g) AS INT) AS n_grams,
        CAST(len(list_distinct(g)) AS INT) AS n_distinct
      FROM grams)
    SELECT doc_id, n_grams, n_distinct,
      CASE WHEN n_grams = 0 THEN NULL
        ELSE 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
      END AS repetition_ratio,
      CASE WHEN n_grams = 0 THEN NULL
        ELSE 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
          >= 0.2 END AS repetitive
    FROM stats ORDER BY doc_id"""))

  /** Unigram-LM-lite quality signal: per-token CORPUS frequency joined
    * back to each document's tokens — docs dominated by rare tokens
    * (OCR noise, mojibake, code dumps) score high on `n_rare_tokens` /
    * low on `min_token_freq`. Integer-exact by construction (counts, no
    * log-probs — t10's no-transcendental rule), so the oracle hash is
    * stable. Scale shape: the frequency table is a pre-reduced
    * token-keyed aggregate (vocabulary-sized, ≪ corpus); the join is
    * keyed on the token string and the groupBy rides doc_id — the
    * text payload itself never shuffles. */
  val t15RareTokens: Q = Q("t15_rare_tokens", (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    toks.join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("freq") <= 2, 1L).otherwise(0L)).as("n_rare_tokens"),
        min(col("freq")).as("min_token_freq"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(CASE WHEN freq <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_rare_tokens,
      CAST(MIN(freq) AS BIGINT) AS min_token_freq
    FROM toks JOIN freq USING (tok)
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Corpus n-gram LM novelty — t15's rare-token signal lifted to
    * SEQUENCES: each doc's overlapping word trigrams score against the
    * corpus-wide trigram table; a doc whose trigrams are corpus-hapaxes
    * (seen nowhere else) is novel, one whose trigrams are all common is
    * templated/memorized. This is the count form of an n-gram LM
    * perplexity filter (log-probability ranks documents IDENTICALLY to
    * the exact integer counts used here — and the counts hash-compare
    * across engines, where float log-sums don't). Shape matches t15/t10:
    * narrow per-row shingling, one shuffle on the trigram key to build
    * the count table, one to score — both map-side combined; the doc
    * payload never moves. */
  val t16TrigramNovelty: Q = Q("t16_trigram_novelty", (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.shingles(
          tokens(col("text")), 3)).as("g"))
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("freq"))
    grams.join(freq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("freq") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("freq")).as("sum_freq"),
        max(col("freq")).as("max_freq"))
      .withColumn("novelty",
        col("n_hapax").cast("double") / col("n_trigrams").cast("double"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks),
    freq AS (SELECT g, COUNT(*) AS freq FROM grams GROUP BY g)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
      CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_hapax,
      CAST(SUM(freq) AS BIGINT) AS sum_freq,
      CAST(MAX(freq) AS BIGINT) AS max_freq,
      CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM grams JOIN freq USING (g)
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Token-diversity scoring via EXACT Gini/Simpson impurity — the
    * repetitive-document quality signal without transcendentals: entropy
    * needs log() (engine implementations differ in ulps, breaking hash
    * equality), but Simpson's 1 − Σc²/N² ranks repetitiveness the same
    * way and is purely rational — integer moment sums, one fixed double
    * expression at the end (q52's moment pattern applied to text). The
    * keep flag compares CROSS-MULTIPLIED INTEGERS (10·(N²−Σc²) ≥ 9·N²),
    * so the 0.9 boundary can't flip on a double ulp (q40's rule). Shape:
    * explode → (doc, tok) count → per-doc moment agg, all riding the
    * documents table's doc_id partitioning; zero-token docs survive via
    * the left join with NULL impurity (the t13 zero-length lesson from
    * round-3 ADVICE: guard degenerate inputs explicitly). */
  val t17TokenGini: Q = Q("t17_token_gini", (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val agg = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("sum_sq"))
    val n2 = col("n_tokens") * col("n_tokens")
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("sum_sq"), lit(0L)).as("sum_sq"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("sum_sq"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            col("sum_sq").cast("double") / n2.cast("double")).as("gini"),
        (col("n_tokens") > 0 &&
          lit(10L) * (n2 - col("sum_sq")) >= lit(9L) * n2)
          .as("diverse_ok"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH counts AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), ' +'),
            x -> len(x) > 0)) AS tok
        FROM documents)
      GROUP BY doc_id, tok),
    agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        COUNT(*) AS n_distinct,
        CAST(SUM(c * c) AS BIGINT) AS sum_sq
      FROM counts GROUP BY doc_id),
    filled AS (
      SELECT d.doc_id,
        COALESCE(a.n_tokens, 0) AS n_tokens,
        CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
        COALESCE(a.sum_sq, 0) AS sum_sq
      FROM documents d LEFT JOIN agg a USING (doc_id))
    SELECT doc_id, n_tokens, n_distinct, sum_sq,
      CASE WHEN n_tokens = 0 THEN NULL
        ELSE CAST(1 AS DOUBLE)
          - CAST(sum_sq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
      END AS gini,
      (n_tokens > 0 AND
        10 * (n_tokens * n_tokens - sum_sq) >= 9 * (n_tokens * n_tokens))
        AS diverse_ok
    FROM filled ORDER BY doc_id"""))

  /** Corpus bigram LM table — the count form of training an n-gram next-
    * token model: per (prev, next) pair counts, per-prev totals, and the
    * exact conditional probability, keeping the top-3 continuations per
    * prev with a deterministic (count DESC, token ASC) tiebreak. Counts
    * are exact integers and the probability is one double division, so
    * the table hash-matches across engines where a log-prob table never
    * would (t16's principle). Shape: narrow per-row shingling (native
    * ShinglesExpr), ONE bigram-keyed map-side-combined aggregation, then
    * windows over the pair-count rows — vocabulary-sized, not corpus-
    * sized. This is the table a quality filter consults for "how
    * predictable is this doc's next token", trained inside the engine. */
  val t18BigramLm: Q = Q("t18_bigram_lm", (s, d) => {
    val grams = Tables.documents(s, d)
      .select(explode(graft.functions.TextExprs.shingles(
        tokens(col("text")), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("prev_tok"),
        split(col("g"), " ").getItem(1).as("next_tok"))
    val counts = grams.groupBy(col("prev_tok"), col("next_tok"))
      .agg(count(lit(1)).as("c"))
    val wTot = Window.partitionBy(col("prev_tok"))
    val wRank = Window.partitionBy(col("prev_tok"))
      .orderBy(col("c").desc, col("next_tok").asc)
    counts
      .withColumn("n_prev", sum(col("c")).over(wTot))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 3)
      .select(col("prev_tok"), col("next_tok"), col("c"), col("n_prev"),
        (col("c").cast("double") / col("n_prev").cast("double"))
          .as("cond_p"), col("rk"))
      .orderBy(col("prev_tok"), col("rk"))
  }, Some("""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT t[i] AS prev_tok, t[i + 1] AS next_tok
      FROM toks, UNNEST(range(1, len(t))) AS u(i)),
    counts AS (
      SELECT prev_tok, next_tok, COUNT(*) AS c
      FROM grams GROUP BY prev_tok, next_tok),
    ranked AS (
      SELECT prev_tok, next_tok, c,
        CAST(SUM(c) OVER (PARTITION BY prev_tok) AS BIGINT) AS n_prev,
        CAST(ROW_NUMBER() OVER (PARTITION BY prev_tok
          ORDER BY c DESC, next_tok ASC) AS INT) AS rk
      FROM counts)
    SELECT prev_tok, next_tok, c, n_prev,
      CAST(c AS DOUBLE) / CAST(n_prev AS DOUBLE) AS cond_p, rk
    FROM ranked WHERE rk <= 3 ORDER BY prev_tok, rk"""))

  /** DSIR-style data-selection importance weighting (Xie et al. 2023):
    * score every doc by how much its HASHED-BIGRAM distribution looks
    * like a target slice (here lang='en') vs the whole corpus. Bigrams
    * hash into 256 buckets (16 md5 hex bits — engine-portable); each
    * bucket gets the EXACT-INTEGER cross-difference
    * (tgt_b+1)*(src_total+B) - (src_b+1)*(tgt_total+B) — the common-
    * denominator numerator of the smoothed ratio p_t(b) - p_s(b), i.e.
    * the first-order (count-form) proxy for DSIR's log-ratio, kept
    * transcendental-free like t16/t18 so the oracle is exact, not
    * float-fuzzy. A doc's score sums its bigram instances' bucket
    * weights; high = target-like (upsample), low = generic (down).
    *
    * Scale shape: the bucket weight table is 256 ROWS regardless of
    * corpus size — broadcast; per-doc scoring is one narrow map + one
    * groupBy(doc_id) with map-side combine. The two corpus-distribution
    * aggregates reduce to 256-row tables before anything joins. */
  val t19ImportanceWeight: Q = Q("t19_importance_weight", (s, d) => {
    val B = 256
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextExprs.shingles(
          tokens(col("text")), 2)).as("g"))
      .withColumn("b",
        conv(substring(md5(col("g")), 1, 4), 16, 10).cast("long") % B)
      .cache()
    val src = grams.groupBy(col("b")).agg(count(lit(1)).as("src_n"))
    val tgt = grams.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tgt_n"))
    val totals = grams.agg(count(lit(1)).as("src_total"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_total"))
    val weights = src.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        ((coalesce(col("tgt_n"), lit(0L)) + 1) * (col("src_total") + B) -
          (col("src_n") + 1) * (col("tgt_total") + B)).as("wt"))
    val perDoc = grams.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wt")).as("score"), count(lit(1)).as("n"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("score"), lit(0L)).cast("long").as("dsir_score"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_bigrams"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, lang,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id, lang,
        unnest(list_transform(range(1, len(t)),
          i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks),
    bk AS (
      SELECT doc_id, lang,
        CAST('0x' || substr(md5(g), 1, 4) AS BIGINT) % 256 AS b
      FROM grams),
    src AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS src_n
            FROM bk GROUP BY b),
    tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tgt_n
            FROM bk WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS src_total,
              CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT)
                AS tgt_total
            FROM bk),
    w AS (SELECT s.b,
            (COALESCE(t.tgt_n, 0) + 1) * (src_total + 256)
              - (s.src_n + 1) * (tgt_total + 256) AS wt
          FROM src s LEFT JOIN tgt t ON s.b = t.b CROSS JOIN tot),
    per_doc AS (
      SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM bk JOIN w ON bk.b = w.b GROUP BY doc_id)
    SELECT d.doc_id,
      CAST(COALESCE(p.score, 0) AS BIGINT) AS dsir_score,
      CAST(COALESCE(p.n, 0) AS BIGINT) AS n_bigrams
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id"""))

  /** BPE training, round one: the weighted adjacent-symbol pair counts
    * over the word-frequency vocabulary — the aggregate [[graft.operators
    * .Bpe.fit]] argmaxes every merge round. The corpus folds once into
    * (word, count) (vocabulary-sized, the Sennrich trick that makes BPE
    * tractable at 100 TB), so the per-round cost is independent of corpus
    * size; full multi-round training is spec-gated (BpeSpec — rounds are
    * sequential by definition, not oracle-expressible in one SQL). Top-20
    * pairs with (count DESC, pair ASC) determinism, the exact argmax
    * order training uses. */
  val t20BpePairs: Q = Q("t20_bpe_pairs", (s, d) => {
    import graft.operators.Bpe
    val wc = Bpe.wordCounts(Tables.documents(s, d), col("text"))
    wc.select(col("c"),
        explode(Bpe.adjacentPairs(Bpe.charSymbols(col("word")))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
      .select(col("pair"), col("cnt"))
  }, Some("""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0)) AS word
      FROM documents),
    wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
           FROM words GROUP BY word),
    pos AS (SELECT word, c, unnest(range(1, len(word) + 1)) AS i FROM wc),
    pairs AS (
      SELECT CASE WHEN i < len(word)
               THEN substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
               ELSE substr(word, i, 1) || ' </w>' END AS pair, c
      FROM pos)
    SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM pairs
    GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20"""))

  /** Per-document FLUENCY scoring under the corpus bigram LM — the
    * KenLM-style quality filter of every pretraining pipeline (score
    * each doc by how typical its token transitions are), kept
    * oracle-exact by reporting order-free statistics instead of a
    * summed log-prob (float sums are partition-order-dependent; counts,
    * int-compared ratios, and min/max of identical divisions are not):
    * per doc — n_bigrams, n_singleton (transitions occurring once in
    * the whole corpus), n_common (conditional probability >= 0.1,
    * decided by the EXACT integer test 10·c >= n_prev), min/max
    * conditional probability, and the fluency/novelty ratios. Scale
    * shape: the LM is the (prev,next)-count table — vocabulary², built
    * once with map-side combine; docs join it on the bigram key, so
    * the heavy side shuffles by bigram, never by doc payload. */
  val t21LmDocScore: Q = Q("t21_lm_doc_score", (s, d) => {
    val docs = Tables.documents(s, d)
    val docGrams = docs
      .select(col("doc_id"), explode(graft.functions.TextExprs.shingles(
        tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"),
        split(col("g"), " ").getItem(0).as("prev_tok"),
        split(col("g"), " ").getItem(1).as("next_tok"))
    val lm = docGrams.groupBy(col("prev_tok"), col("next_tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_prev", sum(col("c")).over(
        Window.partitionBy(col("prev_tok"))))
    val scored = docGrams.join(lm, Seq("prev_tok", "next_tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("c") * 10 >= col("n_prev"), 1L).otherwise(0L))
          .as("n_common"),
        min(col("c").cast("double") / col("n_prev").cast("double"))
          .as("min_p"),
        max(col("c").cast("double") / col("n_prev").cast("double"))
          .as("max_p"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_singleton"), lit(0L)).as("n_singleton"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        col("min_p"), col("max_p"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(col("n_common").cast("double") /
            col("n_bigrams").cast("double")).as("fluency_ratio"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(col("n_singleton").cast("double") /
            col("n_bigrams").cast("double")).as("novelty_ratio"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id, t[i] AS prev_tok, t[i + 1] AS next_tok
      FROM toks, UNNEST(range(1, len(t))) AS u(i)),
    lm AS (
      SELECT prev_tok, next_tok, COUNT(*) AS c
      FROM grams GROUP BY prev_tok, next_tok),
    lm2 AS (
      SELECT prev_tok, next_tok, c,
        CAST(SUM(c) OVER (PARTITION BY prev_tok) AS BIGINT) AS n_prev
      FROM lm),
    scored AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_singleton,
        CAST(SUM(CASE WHEN c * 10 >= n_prev THEN 1 ELSE 0 END)
          AS BIGINT) AS n_common,
        MIN(CAST(c AS DOUBLE) / CAST(n_prev AS DOUBLE)) AS min_p,
        MAX(CAST(c AS DOUBLE) / CAST(n_prev AS DOUBLE)) AS max_p
      FROM grams JOIN lm2 USING (prev_tok, next_tok)
      GROUP BY doc_id)
    SELECT d.doc_id,
      COALESCE(n_bigrams, 0) AS n_bigrams,
      COALESCE(n_singleton, 0) AS n_singleton,
      COALESCE(n_common, 0) AS n_common,
      min_p, max_p,
      CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN NULL
        ELSE CAST(n_common AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        END AS fluency_ratio,
      CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN NULL
        ELSE CAST(n_singleton AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        END AS novelty_ratio
    FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
    ORDER BY d.doc_id"""))

  /** Gopher-rule n-gram duplication filter (Rae et al. 2021 §A1.1
    * repetition rules, the public heuristic every curation stack ships):
    * fraction of token characters covered by the single most frequent
    * 2-gram / 3-gram, plus mean token length, gated at the published
    * thresholds (0.20 / 0.18, mean length in [3,10]). Complements t14
    * (distinct-ratio of long shingles — many-gram redundancy) with the
    * ONE-hot-gram signal that catches boilerplate spam t14's ratio
    * dilutes. Ties on gram frequency break lexicographically, so the
    * "top" gram is deterministic in both engines. Per-doc keyed aggs
    * only — no cross-doc state, pipelines on the scan at corpus scale. */
  val t22GopherGrams: Q = Q("t22_gopher_grams", (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .cache()
    val base = toks
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(length(col("tok"))).as("n_tok_chars"),
        count(lit(1)).as("n_tokens"))
    def top(n: Int): org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("c").desc, col("g").asc)
      toks.select(col("doc_id"),
          explode(graft.functions.TextExprs.shingles(col("t"), n)).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("g").as(s"top${n}_gram"),
          col("c").as(s"top${n}_count"))
    }
    def frac(n: Int) =
      (col(s"top${n}_count") *
        length(regexp_replace(col(s"top${n}_gram"), " ", "")))
        .cast("double") / col("n_tok_chars").cast("double")
    base.join(top(2), Seq("doc_id"), "left")
      .join(top(3), Seq("doc_id"), "left")
      .withColumn("mean_tok_len", col("n_tok_chars").cast("double") /
        col("n_tokens").cast("double"))
      .withColumn("dup2_frac", frac(2))
      .withColumn("dup3_frac", frac(3))
      .withColumn("gopher_ok",
        coalesce(col("dup2_frac") <= 0.20, lit(true)) &&
          coalesce(col("dup3_frac") <= 0.18, lit(true)) &&
          col("mean_tok_len").between(3.0, 10.0))
      .select(col("doc_id"), col("n_tok_chars"), col("n_tokens"),
        col("mean_tok_len"), col("top2_gram"), col("top2_count"),
        col("dup2_frac"), col("top3_gram"), col("top3_count"),
        col("dup3_frac"), col("gopher_ok"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    base AS (
      SELECT doc_id, CAST(SUM(len(tok)) AS BIGINT) AS n_tok_chars,
        CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id),
    g2 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
        i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
    t2 AS (
      SELECT doc_id, g AS top2_gram, CAST(c AS BIGINT) AS top2_count
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY c DESC, g ASC) AS rn FROM c2)
      WHERE rn = 1),
    g3 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
    t3 AS (
      SELECT doc_id, g AS top3_gram, CAST(c AS BIGINT) AS top3_count
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY c DESC, g ASC) AS rn FROM c3)
      WHERE rn = 1),
    joined AS (
      SELECT base.doc_id, n_tok_chars, n_tokens,
        CAST(n_tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          AS mean_tok_len,
        top2_gram, top2_count,
        CAST(top2_count * len(replace(top2_gram, ' ', '')) AS DOUBLE)
          / CAST(n_tok_chars AS DOUBLE) AS dup2_frac,
        top3_gram, top3_count,
        CAST(top3_count * len(replace(top3_gram, ' ', '')) AS DOUBLE)
          / CAST(n_tok_chars AS DOUBLE) AS dup3_frac
      FROM base
      LEFT JOIN t2 ON base.doc_id = t2.doc_id
      LEFT JOIN t3 ON base.doc_id = t3.doc_id)
    SELECT doc_id, n_tok_chars, n_tokens, mean_tok_len,
      top2_gram, top2_count, dup2_frac, top3_gram, top3_count, dup3_frac,
      (COALESCE(dup2_frac <= 0.20, TRUE)
        AND COALESCE(dup3_frac <= 0.18, TRUE)
        AND mean_tok_len BETWEEN 3.0 AND 10.0) AS gopher_ok
    FROM joined ORDER BY doc_id"""))

  /** SOURCE-level filtering — the C4/RefinedWeb domain-blocklist shape:
    * per-doc quality verdicts (t02's rules) roll up to a per-source OK
    * rate, and a source whose rate falls under 50 % is blocked wholesale
    * (its residual good docs dropped too — the point of domain filtering:
    * a bad host poisons trust in its good pages). Doc scoring pipelines
    * on the scan; the rollup shuffles one verdict row per doc on a
    * domain-cardinality key. The blocklist this emits is the broadcast
    * side of the production filter join. */
  val t23SourceFilter: Q = Q("t23_source_filter", (s, d) => {
    val m = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("source"),
        size(col("t")).as("n_tokens"),
        size(filter(col("t"), x => x.isin("the", "a"))).as("n_stop"),
        size(array_distinct(col("t"))).as("n_distinct"))
      .withColumn("quality_ok",
        col("n_tokens") >= 20 &&
          col("n_stop").cast("double") / col("n_tokens") <= 0.2 &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.1)
    m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_ok"))
      .withColumn("ok_rate",
        col("n_ok").cast("double") / col("n_docs").cast("double"))
      .withColumn("source_blocked", col("ok_rate") < 0.5)
      .withColumn("n_docs_kept",
        when(col("source_blocked"), 0L).otherwise(col("n_ok")))
      .orderBy(col("source"))
  }, Some("""
    WITH m AS (
      SELECT doc_id, source,
        len(t) AS n_tokens,
        len(list_filter(t, x -> list_contains(['the', 'a'], x))) AS n_stop,
        len(list_distinct(t)) AS n_distinct
      FROM (SELECT doc_id, source,
        list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0) AS t
        FROM documents)),
    v AS (
      SELECT source,
        (n_tokens >= 20
          AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.2
          AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.1) AS quality_ok
      FROM m),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_ok
      FROM v GROUP BY source)
    SELECT source, n_docs, n_ok,
      CAST(n_ok AS DOUBLE) / CAST(n_docs AS DOUBLE) AS ok_rate,
      (CAST(n_ok AS DOUBLE) / CAST(n_docs AS DOUBLE) < 0.5)
        AS source_blocked,
      CASE WHEN CAST(n_ok AS DOUBLE) / CAST(n_docs AS DOUBLE) < 0.5
        THEN 0 ELSE n_ok END AS n_docs_kept
    FROM agg ORDER BY source"""))

  /** CCNet-style LM-score bucketing (Wenzek et al. 2020): docs rank by a
    * corpus-LM fluency score into head/middle/tail TERCILES, and each
    * bucket keeps a different quota (head all, middle 50 %, tail 10 % —
    * by the t07/t12 deterministic md5 bucket, not an RNG). This is the
    * mixture lever LLM pipelines actually ship: oversample text the LM
    * finds natural without discarding the tail entirely. The tercile
    * window is single-partition but runs over ONE pre-reduced score row
    * per doc (q68's discipline — corpus-cardinality, not token
    * cardinality); docs with no bigram (nothing to score) are out of
    * scope by construction. */
  val t24CcnetBuckets: Q = Q("t24_ccnet_buckets", (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.shingles(
          tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"),
        split(col("g"), " ").getItem(0).as("prev_tok"),
        split(col("g"), " ").getItem(1).as("next_tok"))
    val lm = grams.groupBy(col("prev_tok"), col("next_tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_prev",
        sum(col("c")).over(Window.partitionBy(col("prev_tok"))))
    val scored = grams.join(lm, Seq("prev_tok", "next_tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") * 10 >= col("n_prev"), 1L).otherwise(0L))
          .as("n_common"))
      .withColumn("fluency",
        col("n_common").cast("double") / col("n_bigrams").cast("double"))
    scored
      .withColumn("tercile", ntile(3).over(
        Window.orderBy(col("fluency").desc, col("doc_id").asc)))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .withColumn("hb", pmod(
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(1000L)))
      .withColumn("sampled",
        col("bucket") === "head" ||
          (col("bucket") === "middle" && col("hb") < 500) ||
          (col("bucket") === "tail" && col("hb") < 100))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("fluency")).as("min_fluency"),
        max(col("fluency")).as("max_fluency"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("bucket"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    grams AS (
      SELECT doc_id, t[i] AS prev_tok, t[i + 1] AS next_tok
      FROM toks, UNNEST(range(1, len(t))) AS u(i)),
    lm AS (
      SELECT prev_tok, next_tok, c,
        SUM(c) OVER (PARTITION BY prev_tok) AS n_prev
      FROM (SELECT prev_tok, next_tok, COUNT(*) AS c
        FROM grams GROUP BY prev_tok, next_tok)),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
        SUM(CASE WHEN c * 10 >= n_prev THEN 1 ELSE 0 END) AS n_common
      FROM grams JOIN lm USING (prev_tok, next_tok)
      GROUP BY doc_id),
    bucketed AS (
      SELECT doc_id,
        CAST(n_common AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS fluency,
        ntile(3) OVER (ORDER BY CAST(n_common AS DOUBLE)
          / CAST(n_bigrams AS DOUBLE) DESC, doc_id ASC) AS tercile,
        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
          AS BIGINT) % 1000 AS hb
      FROM scored),
    labeled AS (
      SELECT fluency,
        CASE WHEN tercile = 1 THEN 'head'
          WHEN tercile = 2 THEN 'middle' ELSE 'tail' END AS bucket,
        hb
      FROM bucketed)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      MIN(fluency) AS min_fluency, MAX(fluency) AS max_fluency,
      CAST(SUM(CASE WHEN bucket = 'head'
        OR (bucket = 'middle' AND hb < 500)
        OR (bucket = 'tail' AND hb < 100) THEN 1 ELSE 0 END) AS BIGINT)
        AS n_sampled
    FROM labeled GROUP BY bucket ORDER BY bucket"""))

  /** Benchmark CONTAMINATION scoring — the eval-leakage audit run
    * before any training corpus ships: every candidate document's
    * distinct 8-token shingles are probed against the benchmark set's
    * shingle inventory (here: docs with doc_id % 97 = 0 stand in for
    * the held-out benchmark), and the document's contamination is the
    * matched fraction. The 13-gram industry variants are the same plan
    * with a different k. Scale shape: the benchmark inventory is SMALL
    * by construction (eval suites, not corpora) — it builds once,
    * dedups, and broadcasts, so the corpus-side probe is a narrow
    * map-side pass (explode + broadcast-hash left join + one keyed
    * re-aggregate); nothing corpus-sized ever shuffles on shingle
    * keys. Scores are ratios of exact integers. */
  val t25BenchContamination: Q = Q("t25_bench_contamination", (s, d) => {
    import graft.functions.TextExprs
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        array_distinct(TextExprs.shingles(tokens(col("text")), 8))
          .as("sh"))
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("hit", lit(1))
    docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode_outer(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("g")).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).cast("long")
          .as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        when(col("n_shingles") === 0, lit(null).cast("double"))
          .otherwise(col("n_contaminated").cast("double") /
            col("n_shingles").cast("double")).as("contamination"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) >= 8 THEN list_distinct(
            list_transform(range(1, len(t) - 6),
              i -> list_aggregate(t[i:i+7], 'string_agg', ' ')))
          ELSE [] END AS sh
      FROM t),
    bench AS (
      SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
    ex AS (
      SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
        CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hit
      FROM ex LEFT JOIN bench b ON ex.g = b.g
      GROUP BY ex.doc_id)
    SELECT s.doc_id,
      COALESCE(n_sh, 0) AS n_shingles,
      COALESCE(n_hit, 0) AS n_contaminated,
      CASE WHEN COALESCE(n_sh, 0) = 0 THEN NULL
        ELSE CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE) END
        AS contamination
    FROM sh s LEFT JOIN hits ON s.doc_id = hits.doc_id
    WHERE s.doc_id % 97 <> 0
    ORDER BY s.doc_id"""))

  /** Dedup SAVINGS report per source — the before/after accounting a
    * curation run publishes: docs and tokens per source, how many fall
    * to exact dedup (keep-min-id canonical across the WHOLE corpus, so
    * a doc whose canonical lives in another source counts as dropped
    * here), and the surviving token share. Scale shape: one hash
    * window for canonical assignment (d01's shape) over (id, hash,
    * n_tokens) rows only, then a source-sized rollup; ratios are exact
    * integer divisions performed once at the end. */
  val t26DedupSavings: Q = Q("t26_dedup_savings", (s, d) => {
    val byHash = Window.partitionBy(col("h"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(byHash))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(!col("keep"), col("n_tokens")).otherwise(0L))
          .as("tokens_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        col("tokens_total"), col("tokens_dropped"),
        (lit(1.0) - col("tokens_dropped").cast("double") /
          col("tokens_total").cast("double")).as("kept_share"))
      .orderBy(col("source"))
  }, Some("""
    WITH base AS (
      SELECT doc_id, source, md5(text) AS h,
        CAST(len(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS BIGINT) AS n_tokens
      FROM documents),
    marked AS (
      SELECT source, n_tokens,
        doc_id = MIN(doc_id) OVER (PARTITION BY h) AS keep
      FROM base)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dropped,
      CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
      CAST(SUM(CASE WHEN NOT keep THEN n_tokens ELSE 0 END) AS BIGINT)
        AS tokens_dropped,
      1.0 - CAST(SUM(CASE WHEN NOT keep THEN n_tokens ELSE 0 END)
          AS DOUBLE)
        / CAST(SUM(n_tokens) AS DOUBLE) AS kept_share
    FROM marked GROUP BY source ORDER BY source"""))
}
