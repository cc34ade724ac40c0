package graft.queries

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication catalog over the `documents` corpus: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard — the operators a training-data
  * pipeline runs before anything else at 100 TB.
  *
  * All hashing is md5-hex-string based (bit-identical across engines; see
  * TextFns). The test corpus carries driver-injected near-duplicate pairs
  * (~25 pairs with bigram-shingle Jaccard ≥ 0.5), so every query below has
  * non-trivial output.
  *
  * Scale shape: per-doc signatures are narrow map-side work; candidate
  * generation shuffles ONLY on short band/bucket keys (never all-pairs);
  * verification joins candidates back to per-doc state by doc_id. The
  * exact all-pairs query (d04) is deliberately bounded to a prefix of the
  * corpus and exists as the oracle-of-record for the approximate ones.
  */
object DedupQ {

  def all: Seq[Q] = Seq(d01Exact, d02MinhashLsh, d03Simhash, d04NgramJaccard,
    d05EmbedNearDup, d06DedupClusters, d07EmbedLshNearDup,
    d08NormalizedDedup, d09EditDistance, d10WinnowPairs,
    d11BoilerplateChunks, d12ClusterCanonical, d13SemDedup,
    d14BoilerplateStrip, d15Containment, d16CrossSourceLeakage)

  /** Token bigram SETS per doc — the shingle basis for d02/d04. Native
    * ShinglesExpr (one loop) instead of the staggered-slice zip_with
    * chain: same values (FunctionsSpec), a fraction of the generated
    * code. */
  private def bigramSets(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_distinct(graft.functions.TextExprs.shingles(
          tokens(col("text")), 2)).as("sh"))

  private val bigramSetsSql = """
    SELECT doc_id,
      list_distinct(list_transform(range(1, len(t)),
        i -> t[i] || ' ' || t[i+1])) AS sh
    FROM (SELECT doc_id,
      list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t FROM documents)"""

  /** Exact dedup by full-text hash: canonical id + multiplicity per group
    * (hash-groupBy + keep-first window; W-dedup shape on a corpus). */
  val d01Exact: Q = Q("d01_exact_dedup", (s, d) => {
    val byHash = Window.partitionBy(col("text_hash"))
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(byHash))
      .withColumn("n_copies", count(lit(1)).over(byHash))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id, md5(text) AS text_hash,
      MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
      CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies,
      doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
    FROM documents ORDER BY doc_id"""))

  /** MinHash + LSH near-dup detection: 16 seeded md5 minhashes over bigram
    * shingles → 8 bands × 2 rows → same-band candidate pairs → exact
    * Jaccard verification ≥ 0.5. Detection probability at j=0.5 is
    * 1-(1-0.25)^8 ≈ 0.90 (standard LSH recall; deterministic given the
    * fixed hash family, so oracle-matchable). Candidates shuffle on band
    * keys only; verification re-joins per-doc shingle sets by doc_id. */
  /** LSH-verified near-dup pairs over the FULL corpus — the production
    * edge source for clustering as well as d02's result body. 16 minhashes
    * from only 4 md5 calls per shingle: each seeded md5 splits into four
    * independent 8-hex (32-bit) chunk hashes, and the minhash is the
    * lexicographic min per chunk. Computed by the native MinhashSigExpr
    * (one tight loop per doc — the equivalent transform/array_min chain
    * was 4 interpreted lambda passes and enough generated code to dominate
    * one-shot runs with JIT, see PLANS.md; byte-identical output,
    * FunctionsSpec proves equivalence in-engine). Signatures feed FOUR
    * plan branches (band self-join + two verification joins) —
    * materialize once (at cluster scale: a persisted signature table). */
  private[queries] def lshVerifiedPairs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.NearDup.lshPairs(
      Tables.documents(s, d), "doc_id", "text", 0.5)

  /** DuckDB CTE chain mirroring lshVerifiedPairs up to a `pairs(doc_a,
    * doc_b, jaccard, est_jaccard)` relation — shared by d02 and d06. */
  private val lshPairsCtes: String = {
    val md5Cols = (0 until 4).map(seed =>
      s"list_transform(sh, x -> md5('$seed:' || x)) AS m$seed").mkString(", ")
    val minhashes = (for { seed <- 0 until 4; c <- 0 until 4 } yield
      s"list_min(list_transform(m$seed, h -> substr(h, ${1 + 8 * c}, 8)))")
      .mkString(", ")
    val bandKeys = (0 until 8).map(b =>
      s"md5('$b' || '|' || sig[${2 * b + 1}] || '|' || sig[${2 * b + 2}])")
      .mkString(", ")
    s"""docs AS ($bigramSetsSql),
    md5s AS (SELECT doc_id, sh, $md5Cols FROM docs),
    sigs AS (SELECT doc_id, sh, [$minhashes] AS sig FROM md5s),
    bands AS (SELECT doc_id, unnest([$bandKeys]) AS band FROM sigs),
    cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band
      WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b,
        CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard,
        CAST(len(list_filter(list_transform(sa.sig, (x, i) -> x = sb.sig[i]),
          b -> b)) AS DOUBLE) / 16 AS est_jaccard
      FROM cands
      JOIN sigs sa ON cands.doc_a = sa.doc_id
      JOIN sigs sb ON cands.doc_b = sb.doc_id
      WHERE CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5)"""
  }

  val d02MinhashLsh: Q = Q("d02_minhash_lsh", (s, d) => {
    lshVerifiedPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
  }, Some(s"""
    WITH $lshPairsCtes
    SELECT doc_a, doc_b, jaccard, est_jaccard FROM pairs
    ORDER BY doc_a, doc_b"""))

  /** SimHash near-dup detection: 32-bit signed-weight fingerprint over the
    * token multiset, byte-banded blocking (pairs must share one of 4 exact
    * bytes), Hamming ≤ 3 verification via bit_count(xor). Bit j of a
    * token's hash comes from hex nibble j/4 of its md5 (engine-portable
    * hex parse), weighted +n/−n by token multiplicity. */
  val d03Simhash: Q = Q("d03_simhash", (s, d) => simhashImpl(s, d),
    Some(simhashOracle))

  private def simhashImpl(s: org.apache.spark.sql.SparkSession, d: String) = {
    // One shuffle, no row blowup: per token INSTANCE parse one 32-bit
    // value `v` from md5 (bit j of the hash = hex digit j/4 = nibble
    // (7 - j div 4) of v, bit j % 4), then 32 ±1 sums as AGGREGATION
    // COLUMNS of a single groupBy(doc) — not 32 exploded rows per token
    // (which shuffled 32× the data twice and measured 12s at sf0.1).
    // Summing ±1 per instance equals the oracle's ±multiplicity per
    // distinct token; map-side partial aggregation makes the shuffle one
    // 32-column row per (doc × partition).
    val inst = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("v",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val wAggs = (0 until 32).map { b =>
      val shift = (7 - b / 4) * 4 + (b % 4)
      sum(expr(s"CAST(((v >> $shift) & 1) * 2 - 1 AS BIGINT)")).as(s"w$b")
    }
    // materialized once: both self-join sides read the (doc_id, simhash)
    // table — uncached, the whole tokenize+md5+32-column aggregation ran
    // TWICE (4 scans in the round-16 before-plan; the per-token md5 pass
    // is the query's entire CPU cost). One row per doc, trivially cached.
    val bits = inst.groupBy(col("doc_id")).agg(wAggs.head, wAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"w$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).cast("bigint").as("simhash"))
      .cache()
    val bands = bits.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("byte", expr("(simhash >> (band * 8)) & 255"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def simhashOracle: String = """
    WITH tok_counts AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n, md5(tok) AS h
      FROM (SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS tok FROM documents)
      GROUP BY doc_id, tok),
    bits AS (
      SELECT doc_id, bit,
        SUM(((( CAST('0x' || substr(h, (bit // 4) + 1, 1) AS INT)
          >> (bit % 4)) & 1) * 2 - 1) * n) AS w
      FROM tok_counts, (SELECT unnest(range(0, 32)) AS bit)
      GROUP BY doc_id, bit),
    hashes AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN w >= 0 THEN CAST(POWER(2, bit) AS BIGINT)
          ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS byte
      FROM hashes, (SELECT unnest(range(0, 4)) AS band))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b"""

  /** Exact all-pairs n-gram (word bigram) Jaccard over a bounded corpus
    * prefix — the ground-truth oracle for the approximate dedup operators.
    * Deliberately O(n²): at scale you run d02/d03 instead; this exists to
    * measure their recall. */
  /** Exact pairwise jaccard ≥ threshold over the doc_id < 500 prefix.
    * Relational formulation, not per-pair array ops: |A∩B| via explode +
    * equi-join on the shingle + groupBy pair, |A∪B| = |A|+|B|-|A∩B| from
    * per-doc set sizes. Everything is hash joins and hash aggregates
    * inside codegen — no O(|A|+|B|) array intersection per candidate pair
    * (which measured 100-500s for 250k pairs), and at 100 TB the shingle
    * join is the only formulation that shuffles instead of broadcasting
    * the corpus. The prefix bound is REAL: the corpus grows with SF
    * (5000 docs at sf0.1) and the 31-token vocabulary makes shingle
    * postings collide heavily (pair join is ~deg² per shingle); at the
    * correctness scale (sf0.01, 500 docs) the prefix IS the whole corpus. */
  private[graft] def exactJaccardPairs(s: org.apache.spark.sql.SparkSession,
      d: String, threshold: Double) = {
    val sets = bigramSets(s, d).filter(col("doc_id") < 500).cache()
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** ASYMMETRIC near-dup: shingle CONTAINMENT |Sa∩Sb|/|Sa| — Jaccard
    * misses doc-in-doc relations (a tweet quoted inside an article has
    * tiny Jaccard but containment ≈ 1), which is the quote/subset/
    * template signal a curation pipeline wants separately from symmetric
    * near-dup (Broder's resemblance vs containment distinction, SEQUENCES
    * 1997). Both directions ride one pair row; detection gate is on the
    * MAX direction. Same shingle-postings equi-join shape as d04 (the
    * pair meets on shared shingles — never all-pairs), same deliberate
    * doc_id < 500 bound, which at sf0.01 is the whole corpus; the
    * production path for 100 TB is d02's LSH candidates verified with
    * containment instead of Jaccard. */
  val d15Containment: Q = Q("d15_containment", (s, d) => {
    val sets = bigramSets(s, d).filter(col("doc_id") < 500).cache()
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / col("na").cast("double"))
          .as("cont_a_in_b"),
        (col("n_inter").cast("double") / col("nb").cast("double"))
          .as("cont_b_in_a"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= 0.6)
      .orderBy(col("doc_a"), col("doc_b"))
  }, Some(s"""
    WITH docs AS (
      SELECT * FROM ($bigramSetsSql) WHERE doc_id < 500)
    SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
          / len(a.sh) AS cont_a_in_b,
        CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
          / len(b.sh) AS cont_b_in_a
      FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
    WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.6
    ORDER BY doc_a, doc_b"""))

  val d04NgramJaccard: Q = Q("d04_ngram_jaccard", (s, d) => {
    exactJaccardPairs(s, d, 0.2)
      .orderBy(col("doc_a"), col("doc_b"))
  }, Some(s"""
    WITH docs AS (
      SELECT * FROM ($bigramSetsSql) WHERE doc_id < 500)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
    ORDER BY doc_a, doc_b"""))

  /** Near-dup CLUSTERS: pair detection gives edges; dedup needs groups.
    * The edge source is the LSH-VERIFIED pair set (d02's bucketed
    * candidate generation + exact jaccard ≥ 0.5 verification) — the
    * production path at 100 TB: NOTHING in this lineage is all-pairs
    * (candidates shuffle on band keys only). 3 rounds of min-label
    * propagation (operators.Cluster) map every clustered doc to its
    * canonical (minimum) id. A fixed round count keeps this a pure
    * deterministic query — exact for components of diameter ≤ 3, which
    * near-dup clusters are in practice — so the oracle replays the same
    * 3 rounds as chained CTEs over the same LSH pair CTEs. RecallSpec
    * additionally asserts LSH-fed clusters equal exact-all-pairs-fed
    * clusters on the test corpus. */
  val d06DedupClusters: Q = Q("d06_dedup_clusters", (s, d) => {
    import graft.operators.Cluster
    // Materialize the (tiny) verified pair set before clustering: edges
    // are pairs ∪ reversed-pairs, so without this the FULL LSH pipeline
    // plan is inlined twice into the edge union — double the generated
    // code for zero benefit (measured: 20-37 s of JIT per run). At
    // cluster scale the pair set is a persisted table anyway.
    val pairs = lshVerifiedPairs(s, d)
      .select(col("doc_a"), col("doc_b")).cache()
    Cluster.canonicalize(pairs, "doc_a", "doc_b", rounds = 3)
      .orderBy(col("doc_id"))
  }, Some(s"""
    WITH $lshPairsCtes,
    nodes AS (SELECT DISTINCT doc_id FROM
      (SELECT doc_a AS doc_id FROM pairs
       UNION ALL SELECT doc_b FROM pairs)),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    r0 AS (SELECT doc_id, doc_id AS lbl FROM nodes),
    r1 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r0 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r0 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl),
    r2 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r1 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r1 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl),
    r3 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r2 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r2 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl)
    SELECT doc_id, lbl AS cluster_id, doc_id = lbl AS is_canonical
    FROM r3 ORDER BY doc_id"""))

  /** Embedding cosine near-dup: pairs with cosine ≥ 0.4. Dot products use
    * ordered sequential double accumulation (identical fold order in both
    * engines — see VectorFns). At corpus scale the pairing would go through
    * s02's LSH buckets; the threshold filter is what matters here. */
  val d05EmbedNearDup: Q = Q("d05_embed_neardup", (s, d) => {
    // Per-vector norms precomputed (O(N), cached); each pair evaluates
    // only one native dot product. See SimilarityQ.normed.
    val e = SimilarityQ.normed(s, d)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        SimilarityQ.cosPre(col("a.embedding"), col("a.nrm"),
          col("b.embedding"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }, Some(s"""
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        ${VectorSql.dot("a.embedding", "b.embedding")} AS dot,
        ${VectorSql.norm("a.embedding")} AS na,
        ${VectorSql.norm("b.embedding")} AS nb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b,
      CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot / (na * nb) END AS cos
    FROM pairs
    WHERE CASE WHEN na = 0 OR nb = 0 THEN NULL
      ELSE dot / (na * nb) END >= 0.4
    ORDER BY vec_a, vec_b"""))

  /** Sign-bit LSH band layout for d07: 16 bands × 4 consecutive dims each,
    * covering all 64 dims. Measured on the test corpus (sf0.01): recall
    * 0.966 on true cos ≥ 0.4 pairs; 8×4 layouts measured 0.81-0.83. The
    * corpus's near-dup pairs all sit in cos 0.40-0.51 — the HARD regime
    * for sign-LSH (bit-collision p ≈ 0.63), hence many short bands. At a
    * real near-dup threshold (cos ≥ 0.8, p ≈ 0.86) the same layout is far
    * more selective; bits-per-band is the cost dial to re-tune per corpus
    * size. */
  private val d07Bands = 16
  private val d07Bits = 4
  private def d07BandDims(b: Int): Seq[Int] =
    (0 until d07Bits).map(i => b * d07Bits + i)

  /** Embedding near-dup at scale: the LSH-bucketed production path for
    * d05's all-pairs scan. One pass computes 16 sign-bit band keys per
    * vector (explode → (vec_id, band, 4-char key) — narrow); candidates
    * are same-(band, key) id pairs, DISTINCT-deduped; verification joins
    * candidates back to the normed corpus by vec_id and applies the exact
    * cosine ≥ 0.4 test. Nothing all-pairs anywhere: the candidate join
    * shuffles on short band keys, verify shuffles id pairs — the d02
    * recipe applied to vectors. Zero false positives by construction
    * (exact verify); recall vs d05 is gated in RecallSpec. */
  val d07EmbedLshNearDup: Q = Q("d07_embed_lsh_neardup", (s, d) => {
    val e = SimilarityQ.normed(s, d)
    val banded = e.select(col("vec_id"),
        explode(array((0 until d07Bands).map { b =>
          struct(lit(b).as("band"),
            graft.functions.VectorFns.signBucket(
              col("embedding"), d07BandDims(b)).as("key"))
        }: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
      // both candidate self-join sides read the banded keys; uncached
      // the 16-band sign-bucket pass ran twice (narrow but per-vector)
      .cache()
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        SimilarityQ.cosPre(col("a.embedding"), col("a.nrm"),
          col("b.embedding"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }, {
    val bandSelects = (0 until d07Bands).map { b =>
      val key = d07BandDims(b).map(i =>
        s"(CASE WHEN embedding[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"SELECT vec_id, $b AS band, $key AS key FROM embeddings"
    }.mkString("\n      UNION ALL ")
    Some(s"""
    WITH bands AS (
      $bandSelects),
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        AND x.vec_id < y.vec_id),
    verified AS (
      SELECT vec_a, vec_b,
        ${VectorSql.dot("a.embedding", "b.embedding")} AS dot,
        ${VectorSql.norm("a.embedding")} AS na,
        ${VectorSql.norm("b.embedding")} AS nb
      FROM cand JOIN embeddings a ON vec_a = a.vec_id
        JOIN embeddings b ON vec_b = b.vec_id)
    SELECT vec_a, vec_b,
      CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot / (na * nb) END AS cos
    FROM verified
    WHERE CASE WHEN na = 0 OR nb = 0 THEN NULL
      ELSE dot / (na * nb) END >= 0.4
    ORDER BY vec_a, vec_b""")
  })

  /** Dedup on NORMALIZED text — case-fold, strip non-alphanumerics,
    * collapse runs of whitespace — the canonicalization real pipelines
    * apply BEFORE exact hashing (d01 is the raw-byte baseline; formatting
    * variants of the same content hash apart there and together here).
    * One row per normalized group: canonical doc, group size, and how
    * many RAW-distinct variants normalization merged. Same scale shape
    * as d01: narrow per-row normalization, one shuffle on the short
    * hash key. */
  val d08NormalizedDedup: Q = Q("d08_normalized_dedup", (s, d) => {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("raw_hash"),
        md5(norm).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("raw_hash")).as("n_raw_variants"))
      .orderBy(col("canonical_id"))
  }, Some("""
    WITH hashed AS (
      SELECT doc_id, md5(text) AS raw_hash,
        md5(trim(regexp_replace(regexp_replace(lower(text),
          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
      FROM documents)
    SELECT norm_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs,
      CAST(COUNT(DISTINCT raw_hash) AS BIGINT) AS n_raw_variants
    FROM hashed GROUP BY norm_hash
    ORDER BY canonical_id"""))

  /** Edit-distance fuzzy matching with prefix BLOCKING — the
    * entity-resolution cousin of the shingle family: candidate pairs
    * meet only inside a 16-char name-prefix block (turning O(n²) into
    * per-block pairs, the same play as d02's bands/d03's bytes), then
    * exact Levenshtein keeps distance-1 pairs ("single-typo" matches —
    * on this corpus, customer ids differing in one digit). At 100 TB
    * the block key is the shuffle key and the quadratic work is bounded
    * per block; a skewed block would get the q14 salting treatment. */
  val d09EditDistance: Q = Q("d09_edit_distance", (s, d) => {
    // explicit-count repartition on the block key: customer is one small
    // input split feeding a compute-heavy candidate join — bare/AQE
    // partitioning coalesces the ~500 KB exchange to ONE partition and
    // serializes every Levenshtein on a single core (the Tables.documents
    // rule; measured 5.2 s -> sub-second). Both self-join sides then
    // arrive co-partitioned on the join key.
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 1, 16).as("block"))
      .repartition(s.sparkContext.defaultParallelism, col("block"))
    c.as("a").join(c.as("b"), Seq("block"))
      .filter(col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("key_a"),
        col("b.c_custkey").as("key_b"),
        levenshtein(col("a.c_name"), col("b.c_name")).as("edit_dist"))
      .filter(col("edit_dist") === 1)
      .orderBy(col("key_a"), col("key_b"))
  }, Some("""
    WITH c AS (
      SELECT c_custkey, c_name, substr(c_name, 1, 16) AS block
      FROM customer)
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
      CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
    FROM c a JOIN c b ON a.block = b.block AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) = 1
    ORDER BY key_a, key_b"""))

  /** SUBSTRING-level duplication candidates via winnowing (t04's rolling
    * fingerprint turned pairwise): each doc keeps its 5 smallest 8-char
    * window hashes (RollingFpExpr — one native loop, robust to small
    * edits), docs sharing ≥ 2 winnowed hashes pair up. Catches
    * copy-paste SEGMENTS between otherwise-different documents — the
    * case whole-document shingle MinHash (d02, Jaccard over the full
    * set) is designed to ignore. Scale shape: 5 short hash keys per doc
    * → equi-join on the hash → pair-count agg; never all-pairs, shuffle
    * volume 5 rows/doc. At 100 TB this is the candidate stage of a
    * winnowing dedup (Schleimer et al.'s local fingerprinting); exact
    * substring verification would follow on the candidate sliver. */
  val d10WinnowPairs: Q = Q("d10_winnow_pairs", (s, d) => {
    // materialized once: both self-join sides read the fingerprints —
    // uncached, rollingFp (one md5 per 8-char window over the whole
    // text, the query's entire CPU cost) ran TWICE. 5 short rows per
    // doc, trivially cached.
    val fps = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(graft.functions.TextExprs.rollingFp(
          col("text"), 8, 5), "\\|")).as("gram"))
      .cache()
    fps.as("a").join(fps.as("b"), Seq("gram"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(countDistinct(col("gram")).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }, Some("""
    WITH grams AS (
      SELECT doc_id,
        list_transform(range(1, greatest(len(text) - 7, 1) + 1),
          i -> md5(substr(text, i, 8))) AS g
      FROM documents),
    fps AS (
      SELECT doc_id, unnest(list_sort(g)[1:5]) AS gram FROM grams)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b USING (gram)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT gram) >= 2
    ORDER BY doc_a, doc_b"""))

  /** Chunk-level (paragraph) boilerplate detection — the CCNet-style
    * dedup granularity BETWEEN d01's whole-document hash and d04's
    * overlapping shingles: each doc splits into NON-overlapping 8-token
    * chunks (the corpus has no newlines, so fixed-width chunks stand in
    * for paragraphs), a chunk seen in ≥ 2 distinct docs is boilerplate,
    * and each doc reports how much of it would be stripped. Two shuffles,
    * both on the short chunk string (at 100 TB: md5 the chunk first so
    * the exchange key is 32 bytes regardless of chunk width); the doc
    * payload itself never moves. Removing the flagged chunks — not the
    * whole doc — is what line-level dedup does to navigation/header
    * boilerplate in web corpora. */
  val d11BoilerplateChunks: Q = Q("d11_boilerplate_chunks", (s, dir) => {
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), (size(col("t")) / 8).cast("int") - 1),
          i => array_join(slice(col("t"), i * 8 + 1, lit(8)), " ")))
        .as("chunk"))
      // feeds the frequency aggregate AND the flag join: cache so the
      // tokenize+chunk pass over the text runs once, not twice
      .cache()
    val freq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(freq, Seq("chunk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L))
          .as("n_boilerplate_chunks"),
        max(col("n_docs")).as("max_chunk_docs"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    chunks AS (
      SELECT doc_id, array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM toks, UNNEST(range(0, CAST(floor(len(t) / 8) AS BIGINT)))
        AS u(i)
      WHERE len(t) >= 8),
    freq AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs
      FROM chunks GROUP BY chunk)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_boilerplate_chunks,
      CAST(MAX(n_docs) AS BIGINT) AS max_chunk_docs
    FROM chunks JOIN freq USING (chunk)
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Cluster-aware canonical selection — what production dedup actually
    * ships: not "keep an arbitrary member per near-dup cluster" (d06's
    * min-id canonical) but "keep the BEST member", here the most
    * lexically diverse (max distinct tokens, doc_id tiebreak). Clusters
    * come from the same LSH-verified pair set as d06 (nothing all-pairs
    * in the lineage); docs outside every cluster are their own
    * singleton via the left join. The winner is picked by ONE window
    * over cluster-keyed doc STATS (two longs per doc) — the text
    * payload never enters the shuffle. Filter keep=true and the corpus
    * is near-dup-free with per-cluster best representatives: the
    * curation manifest form of d06. */
  val d12ClusterCanonical: Q = Q("d12_cluster_canonical", (s, d) => {
    import graft.operators.Cluster
    val pairs = lshVerifiedPairs(s, d)
      .select(col("doc_a"), col("doc_b")).cache()
    val labels = Cluster.minLabelPropagation(pairs, "doc_a", "doc_b",
      rounds = 3)
    val stats = Tables.documents(s, d)
      .select(col("doc_id"),
        size(array_distinct(tokens(col("text")))).cast("long")
          .as("n_distinct_tokens"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_distinct_tokens").desc, col("doc_id").asc)
    stats.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
        col("n_distinct_tokens"))
      .withColumn("keep", row_number().over(w) === 1)
      .orderBy(col("doc_id"))
  }, Some(s"""
    WITH $lshPairsCtes,
    nodes AS (SELECT DISTINCT doc_id FROM
      (SELECT doc_a AS doc_id FROM pairs
       UNION ALL SELECT doc_b FROM pairs)),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    r0 AS (SELECT doc_id, doc_id AS lbl FROM nodes),
    r1 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r0 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r0 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl),
    r2 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r1 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r1 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl),
    r3 AS (SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(r.lbl), n.lbl)) AS lbl
           FROM r2 n LEFT JOIN edges e ON n.doc_id = e.u
           LEFT JOIN r2 r ON e.v = r.doc_id GROUP BY n.doc_id, n.lbl),
    stats AS (
      SELECT doc_id, CAST(len(list_distinct(list_filter(
          string_split_regex(lower(text), ' +'), x -> len(x) > 0)))
        AS BIGINT) AS n_distinct_tokens
      FROM documents),
    lbl AS (
      SELECT s.doc_id, COALESCE(r3.lbl, s.doc_id) AS cluster_id,
        s.n_distinct_tokens
      FROM stats s LEFT JOIN r3 ON s.doc_id = r3.doc_id)
    SELECT doc_id, cluster_id, n_distinct_tokens,
      ROW_NUMBER() OVER (PARTITION BY cluster_id
        ORDER BY n_distinct_tokens DESC, doc_id ASC) = 1 AS keep
    FROM lbl ORDER BY doc_id"""))

  /** The APPLICATION of d11's detection — C4/RefinedWeb-style boilerplate
    * REMOVAL with document reconstruction: chunk the normalized token
    * stream (8-token blocks, same basis as d11), drop every chunk shared
    * by ≥2 docs, and reassemble each document from its surviving chunks
    * IN ORDER plus the unchunked tail. Output is the cleaned corpus (the
    * normalized token stream — the form the downstream tokenizer
    * consumes), not just per-doc counts.
    *
    * Scale shape: two shuffles on short chunk strings (frequency, then
    * the flag join) and one groupBy(doc_id) whose payload is the doc's
    * own kept chunks — the reconstruction never moves other docs' text,
    * and the window-free sort happens inside the per-doc aggregate
    * (array_sort over collect_list, bounded by the doc's chunk count). */
  val d14BoilerplateStrip: Q = Q("d14_boilerplate_strip", (s, dir) => {
    def nz(c: org.apache.spark.sql.Column) =
      when(c === "", lit(null)).otherwise(c)
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("nfull", (size(col("t")) / 8).cast("int"))
      // read by the chunker and again by the reconstruction join — cache
      // so the tokenize pass over the text runs once
      .cache()
    val chunks = base.filter(col("nfull") >= 1)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nfull") - 1),
          i => array_join(slice(col("t"), i * 8 + 1, lit(8)), " "))))
      .toDF("doc_id", "idx", "chunk")
      // feeds the frequency aggregate AND the reconstruction join:
      // cache so the tokenize+chunk pass runs once, not twice
      .cache()
    val freq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val agg = chunks.join(freq, Seq("chunk"))
      .select(col("doc_id"), col("idx"), col("chunk"),
        (col("n_docs") < 2).as("keep"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("idx"), col("chunk"))))),
          c => c.getField("chunk")), " ").as("body"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        concat_ws(" ",
          nz(coalesce(col("body"), lit(""))),
          nz(array_join(slice(col("t"), col("nfull") * 8 + 1,
            size(col("t")) - col("nfull") * 8), " ")))
          .as("cleaned_text"))
      .orderBy(col("doc_id"))
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), ' +'),
        x -> len(x) > 0) AS t
      FROM documents),
    base AS (
      SELECT doc_id, t, CAST(floor(len(t) / 8) AS INT) AS nfull
      FROM toks),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS idx,
        array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk
      FROM base, UNNEST(range(0, nfull)) AS u(i)),
    freq AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs
      FROM chunks GROUP BY chunk),
    agg AS (
      SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        CAST(SUM(CASE WHEN f.n_docs < 2 THEN 0 ELSE 1 END) AS BIGINT)
          AS n_dropped,
        string_agg(CASE WHEN f.n_docs < 2 THEN c.chunk END, ' '
          ORDER BY c.idx) AS body
      FROM chunks c JOIN freq f USING (chunk)
      GROUP BY c.doc_id)
    SELECT b.doc_id,
      COALESCE(a.n_chunks, 0) AS n_chunks,
      COALESCE(a.n_dropped, 0) AS n_dropped,
      concat_ws(' ',
        NULLIF(COALESCE(a.body, ''), ''),
        NULLIF(array_to_string(b.t[(b.nfull*8+1):len(b.t)], ' '), ''))
        AS cleaned_text
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY b.doc_id"""))

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023): cluster the
    * embedding space (deterministic IVF centroids, broadcast; one nearest-
    * centroid assignment — SimilarityQ.cellRanks), then run the pairwise
    * cosine scan ONLY within each cluster and keep, of every near-dup
    * pair, the member FARTHEST from its centroid (low centroid-cosine =
    * the cluster's diverse exemplar; ties broken on vec_id). A vector is
    * dropped iff some same-cell vector with cos ≥ 0.4 beats it on that
    * order — a pure EXISTS, so the decision is order-independent (no
    * greedy chain) and the oracle expresses it exactly.
    *
    * Scale shape: this is the published 100 TB recipe — the quadratic
    * pair scan never crosses cluster boundaries, so with K ~ √N cells the
    * per-cell work is bounded and the only wide exchange is the shuffle
    * on the short cell key. The centroid set is broadcast; the assignment
    * pass is one narrow map over the corpus. d05 (exact all-pairs twin)
    * is the recall oracle for the clustering's blocking loss, exactly as
    * d04 is for d02/d03. */
  val d13SemDedup: Q = Q("d13_semdedup", (s, d) => {
    val assigned = SimilarityQ.cellRanks(SimilarityQ.normed(s, d))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_label").as("cell"),
        col("cos").as("cos_c"), col("embedding"), col("nrm"))
      .cache()
    // b beats a ⟺ b is the pair member kept under keep-farthest-from-
    // centroid; a's EXISTS over beaten near-dup pairs marks it dropped.
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          (col("b.cos_c") < col("a.cos_c") ||
            (col("b.cos_c") === col("a.cos_c") &&
              col("b.vec_id") < col("a.vec_id"))))
      .filter(SimilarityQ.cosPre(col("a.embedding"), col("a.nrm"),
        col("b.embedding"), col("b.nrm")) >= 0.4)
      .select(col("a.vec_id").as("dvid")).distinct()
    assigned
      .join(dropped, col("vec_id") === col("dvid"), "left")
      .select(col("vec_id"), col("cell"), col("cos_c"),
        col("dvid").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }, Some(s"""
    WITH seeds AS (
      SELECT label AS centroid_label, MIN(vec_id) AS seed_id
      FROM embeddings GROUP BY label),
    centroids AS (
      SELECT centroid_label, e.embedding AS centroid
      FROM seeds JOIN embeddings e ON seed_id = e.vec_id),
    scored AS (
      SELECT e.vec_id, centroid_label,
        CASE WHEN ${VectorSql.norm("e.embedding")} = 0
          OR ${VectorSql.norm("centroid")} = 0 THEN NULL
        ELSE ${VectorSql.dot("e.embedding", "centroid")}
          / (${VectorSql.norm("e.embedding")} * ${VectorSql.norm("centroid")})
        END AS cos
      FROM embeddings e CROSS JOIN centroids),
    ranked AS (
      SELECT vec_id, centroid_label, cos,
        row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, centroid_label ASC) AS rn
      FROM scored),
    assigned AS (
      SELECT vec_id, centroid_label AS cell, cos AS cos_c
      FROM ranked WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a
      JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        AND (b.cos_c < a.cos_c
          OR (b.cos_c = a.cos_c AND b.vec_id < a.vec_id))
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE CASE WHEN ${VectorSql.norm("ea.embedding")} = 0
          OR ${VectorSql.norm("eb.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("ea.embedding", "eb.embedding")}
          / (${VectorSql.norm("ea.embedding")} * ${VectorSql.norm("eb.embedding")})
        END >= 0.4)
    SELECT a.vec_id, a.cell, a.cos_c, (d.vec_id IS NULL) AS kept
    FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id"""))

/** Cross-source duplicate LEAKAGE audit — the provenance report run
    * before mixing corpora: per source, how many of its distinct
    * contents also appear in at least one OTHER source (a crawl
    * re-scraped by two vendors, a dataset bundled into another), and
    * the leaked share. Scale shape: the corpus reduces FIRST to
    * distinct (content-hash, source) rows — hash-keyed map-side
    * distinct, the payload never shuffles — then a hash-keyed degree
    * count joins back; every relation after the first distinct is
    * hash+source-name narrow, and the result is source-sized. */
  val d16CrossSourceLeakage: Q = Q("d16_cross_source_leakage", (s, d) => {
    val hs = Tables.documents(s, d)
      .select(md5(col("text")).as("h"), col("source"))
      .distinct()
    val deg = hs.groupBy(col("h"))
      .agg(count(lit(1)).as("n_src"))
    hs.join(deg, Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contents"),
        sum(when(col("n_src") > 1, 1L).otherwise(0L)).as("n_leaked"))
      .select(col("source"), col("n_contents"), col("n_leaked"),
        (col("n_leaked").cast("double") / col("n_contents").cast("double"))
          .as("leak_share"))
      .orderBy(col("source"))
  }, Some("""
    WITH hs AS (
      SELECT DISTINCT md5(text) AS h, source FROM documents),
    deg AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_src
            FROM hs GROUP BY h)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contents,
      CAST(SUM(CASE WHEN n_src > 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_leaked,
      CAST(SUM(CASE WHEN n_src > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS leak_share
    FROM hs JOIN deg ON hs.h = deg.h
    GROUP BY source ORDER BY source"""))
}

/** DuckDB SQL mirrors of VectorFns — ordered left-to-right double folds
  * (list_reduce), matching Spark's `aggregate` evaluation order exactly. */
object VectorSql {
  def dot(a: String, b: String): String =
    s"""list_reduce(list_transform($a, (x, i) ->
       CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE)), (p, c) -> p + c)"""
  def norm(a: String): String =
    s"""sqrt(list_reduce(list_transform($a, x ->
       CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, c) -> p + c))"""
}
