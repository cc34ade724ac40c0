package graft.queries

import graft.Tables
import graft.functions.VectorFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float> column).
  *
  * Three tiers, mirroring how ANN is actually deployed at 100 TB:
  *  - s01: brute-force exact top-k for a SMALL query set — the query side
  *    broadcasts against the corpus; the corpus is scanned once, never
  *    shuffled. The correctness baseline.
  *  - s02: sign-bit LSH buckets — corpus and queries shuffle only on a
  *    short bucket key; candidates are same-bucket only. The recall/cost
  *    tradeoff path.
  *  - s03: IVF-style cells — deterministic seed centroids (lowest vec_id
  *    per label), every vector assigned to its nearest centroid; search
  *    probes only the query's cell.
  *
  * All cosines use ordered double folds (VectorFns), bit-identical to the
  * DuckDB oracle's list_reduce.
  */
object SimilarityQ {

  def all: Seq[Q] = Seq(s01KnnBrute, s02KnnLsh, s03IvfAssign, s04IvfSearch,
    s05QuantizedRerank, s06KmeansUpdate, s07PqRerank, s08RangeSearch,
    s09FilteredKnn, s10Mmr, s11FilteredIvf)

  /** Corpus with per-VECTOR norms precomputed and materialized: norms are
    * O(N), not O(pairs) — computing them inside the pair expression would
    * redo each norm ~500×. At cluster scale this is a persisted column. */
  private[queries] def normed(s: org.apache.spark.sql.SparkSession,
      d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))
      .cache()

  /** cosine(a,b) from precomputed norms; null on zero norms. */
  private[queries] def cosPre(av: Column, an: Column, bv: Column,
      bn: Column): Column =
    when(an === 0 || bn === 0, lit(null))
      .otherwise(VectorFns.dot(av, bv) / (an * bn))

  /** Exact cosine top-10 for query vectors (vec_id < 5), ranked with a
    * deterministic tiebreak. Spark plans broadcast-nested-loop of the tiny
    * query side × corpus, then a per-query window top-k. */
  val s01KnnBrute: Q = Q("s01_knn_brute", (s, d) => {
    val e = normed(s, d)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queries).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }, Some(s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT query_id, e.vec_id,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM q JOIN embeddings e ON query_id <> e.vec_id),
    ranked AS (
      SELECT query_id, vec_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, cos
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""))

  /** FILTERED vector search — the metadata-predicate + similarity combo
    * every vector store ships (and the standard retrieval shape for
    * RAG: "top-k among docs matching the filter"): per query (vec_id <
    * 5), exact cosine top-5 among corpus vectors whose label is EVEN,
    * self excluded. PRE-filtering (predicate before ranking) is the
    * semantics — post-filtering a plain top-k under-returns when the
    * filter is selective. Scale shape = s01's: the tiny query side
    * broadcasts, the filter prunes the corpus scan BEFORE any scoring
    * (pushed to the parquet reader), and at index scale it composes
    * with s04's IVF by filtering inside the probed cells. */
  val s09FilteredKnn: Q = Q("s09_filtered_knn", (s, d) => {
    val e = normed(s, d)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queries)
      .join(e.filter(col("label") % 2 === 0),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }, Some(s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT query_id, e.vec_id, e.label,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM q JOIN embeddings e
        ON query_id <> e.vec_id AND e.label % 2 = 0),
    ranked AS (
      SELECT query_id, vec_id, label, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, label, cos
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""))

  /** LSH-bucketed ANN: 8 sign-bit hyperplane buckets; per query (vec_id <
    * 20), exact top-5 re-rank WITHIN its bucket. Recall < 1 by design —
    * but cost drops from O(N) to O(N/256) per query at scale, and the
    * bucket join shuffles only (bucket, id, vec). */
  val s02KnnLsh: Q = Q("s02_knn_lsh", (s, d) => {
    val dims = Seq(0, 9, 18, 27, 36, 45, 54, 63)
    val e = normed(s, d)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        VectorFns.signBucket(col("embedding"), dims).as("bucket"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("nrm").as("qn"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    queries.join(e, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("bucket"), col("vec_id"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"), col("bucket"))
      .orderBy(col("query_id"), col("rank"))
  }, {
    val dims = Seq(0, 9, 18, 27, 36, 45, 54, 63)
    val bucketSql = dims.map(i =>
      s"(CASE WHEN embedding[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    Some(s"""
    WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
          FROM b WHERE vec_id < 20),
    scored AS (
      SELECT query_id, q.bucket, e.vec_id,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM q JOIN b e ON q.bucket = e.bucket AND query_id <> e.vec_id),
    ranked AS (
      SELECT query_id, bucket, vec_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, cos, bucket
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank""")
  })

  /** IVF cell assignment: centroid seeds = lowest vec_id per label
    * (deterministic — no floating mean accumulation across rows), each
    * vector assigned to its nearest seed by cosine. Output is the inverted
    * file: (vector → cell, similarity, agreement with true label). */
  /** Deterministic IVF centroids: lowest vec_id per label (no floating
    * mean accumulation), broadcast-sized. */
  private def centroids(e: org.apache.spark.sql.DataFrame) = {
    val seedIds = e.groupBy(col("label"))
      .agg(min(col("vec_id")).as("seed_id"))
    seedIds
      .join(e.select(col("vec_id").as("seed_id"),
        col("embedding").as("centroid"), col("nrm").as("cn")), Seq("seed_id"))
      .select(col("label").as("centroid_label"), col("centroid"), col("cn"))
  }

  /** Every vector scored against every centroid (broadcast), ranked per
    * vector: rn = 1 is the cell assignment; higher rn are probe order.
    * Carries the vector itself so downstream search needs no join back
    * to the corpus. */
  private[queries] def cellRanks(e: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("centroid_label").asc)
    e.select(col("vec_id"), col("label"), col("embedding"), col("nrm"))
      .join(broadcast(centroids(e)))
      .select(col("vec_id"), col("label"), col("embedding"), col("nrm"),
        col("centroid_label"),
        cosPre(col("embedding"), col("nrm"), col("centroid"), col("cn"))
          .as("cos"))
      .withColumn("rn", row_number().over(w))
  }

  val s03IvfAssign: Q = Q("s03_ivf_assign", (s, d) => {
    cellRanks(normed(s, d))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"),
        col("centroid_label").as("assigned_cell"), col("cos"),
        (col("label") === col("centroid_label")).as("matches_label"))
      .orderBy(col("vec_id"))
  }, Some(s"""
    WITH seeds AS (
      SELECT label AS centroid_label, MIN(vec_id) AS seed_id
      FROM embeddings GROUP BY label),
    centroids AS (
      SELECT centroid_label, e.embedding AS centroid
      FROM seeds JOIN embeddings e ON seed_id = e.vec_id),
    scored AS (
      SELECT e.vec_id, e.label, centroid_label,
        CASE WHEN ${VectorSql.norm("e.embedding")} = 0
          OR ${VectorSql.norm("centroid")} = 0 THEN NULL
        ELSE ${VectorSql.dot("e.embedding", "centroid")}
          / (${VectorSql.norm("e.embedding")} * ${VectorSql.norm("centroid")})
        END AS cos
      FROM embeddings e CROSS JOIN centroids),
    ranked AS (
      SELECT vec_id, label, centroid_label, cos,
        row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, centroid_label ASC) AS rn
      FROM scored)
    SELECT vec_id, label, centroid_label AS assigned_cell, cos,
      label = centroid_label AS matches_label
    FROM ranked WHERE rn = 1
    ORDER BY vec_id"""))

  /** IVF probe SEARCH (completes the s03 inverted file): each query
    * (vec_id < 10) probes its nprobe=2 nearest cells and exact-ranks only
    * the vectors ASSIGNED to those cells — top-5 by cosine. Cost shape at
    * scale: centroids broadcast (tiny), the candidate join is an
    * equi-join on the short cell key (assignment partitions the corpus),
    * so per-query work is O(corpus / n_cells × nprobe), not O(corpus).
    * Recall < 1 by design — the measurable IVF tradeoff. */
  val s04IvfSearch: Q = Q("s04_ivf_search", (s, d) => {
    // One materialized rank table feeds both sides; the search is a
    // single equi-join on the cell key (the query side is tiny and
    // broadcast by AQE) — no join back to the corpus, no third shuffle.
    val ranks = cellRanks(normed(s, d)).cache()
    val assignment = ranks.filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_label").as("cell"),
        col("embedding"), col("nrm"))
    val probes = ranks.filter(col("vec_id") < 10 && col("rn") <= 2)
      .select(col("vec_id").as("query_id"),
        col("centroid_label").as("cell"),
        col("embedding").as("q"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes)
      .join(assignment, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"), col("cell").as("probed_cell"))
      .orderBy(col("query_id"), col("rank"))
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
    assignment AS (
      SELECT vec_id, centroid_label AS cell FROM ranked WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, centroid_label AS cell
      FROM ranked WHERE vec_id < 10 AND rn <= 2),
    queries AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 10),
    cands AS (
      SELECT p.query_id, a.vec_id, p.cell,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM probes p
      JOIN assignment a ON p.cell = a.cell AND p.query_id <> a.vec_id
      JOIN queries ON queries.query_id = p.query_id
      JOIN embeddings e ON e.vec_id = a.vec_id),
    final_ranked AS (
      SELECT query_id, vec_id, cell, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM cands)
    SELECT query_id, rank, vec_id AS neighbor_id, cos, cell AS probed_cell
    FROM final_ranked WHERE rank <= 5
    ORDER BY query_id, rank"""))

  /** Scalar-quantized search (SQ8-style) + exact re-rank — the
    * memory-bound scale path the IVF/LSH tiers don't cover: the full
    * candidate scan touches only an int8-range quantized copy of the
    * corpus (4× smaller than float32; per-vector max-abs scale, values in
    * [-127, 127]), and the float vectors are read ONLY for the ≤20
    * candidates per query that survive, via an id join — at 100 TB the
    * quantized column is the one you can afford to scan.
    *
    * Determinism: quantized values are exact small integers (stored as
    * floats), so the quantized dot is exact integer arithmetic in both
    * engines and the candidate CUT (top-20 by quantized cosine) is
    * bit-stable — which is what makes the query oracle-checkable at all.
    * Exact cosine then re-ranks the survivors. Recall vs the s01 exact
    * baseline is gated in RecallSpec. */
  val s05QuantizedRerank: Q = Q("s05_quantized_rerank", (s, d) => {
    val e = normed(s, d)
    val quant = e
      .withColumn("mx",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("qvec",
        when(col("mx") === 0,
          transform(col("embedding"), _ => lit(0.0f)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") * lit(127.0) / col("mx"))
              .cast("float"))))
      .withColumn("qn", VectorFns.norm(col("qvec")))
      .select(col("vec_id"), col("qvec"), col("qn"))
      .cache()
    val qQueries = quant.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qvec").as("qq"),
        col("qn").as("qqn"))
    val exQueries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("nrm").as("q_nrm"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id").asc)
    val wx = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    // candidate scan: quantized columns ONLY
    val cands = broadcast(qQueries)
      .join(quant, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosPre(col("qq"), col("qqn"), col("qvec"), col("qn")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= 20)
    // float vectors touched only for the surviving candidates
    cands
      .join(e.select(col("vec_id"), col("embedding"), col("nrm")),
        Seq("vec_id"))
      .join(broadcast(exQueries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("qcos"),
        cosPre(col("q"), col("q_nrm"), col("embedding"), col("nrm"))
          .as("cos"))
      .withColumn("rank", row_number().over(wx))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"), col("qcos"))
      .orderBy(col("query_id"), col("rank"))
  }, Some(s"""
    WITH scaled AS (
      SELECT vec_id, embedding,
        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
          AS mx
      FROM embeddings),
    quant AS (
      SELECT vec_id,
        CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0.0)
          ELSE list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 127.0 / mx))
        END AS qvec
      FROM scaled),
    qn AS (
      SELECT vec_id, qvec, ${VectorSql.norm("qvec")} AS qn FROM quant),
    qqueries AS (
      SELECT vec_id AS query_id, qvec AS qq, qn AS qqn
      FROM qn WHERE vec_id < 10),
    scored AS (
      SELECT query_id, e.vec_id,
        CASE WHEN qqn = 0 OR e.qn = 0 THEN NULL
          ELSE ${VectorSql.dot("qq", "e.qvec")} / (qqn * e.qn)
        END AS qcos
      FROM qqueries q JOIN qn e ON query_id <> e.vec_id),
    cand AS (
      SELECT query_id, vec_id, qcos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY qcos DESC, vec_id ASC) AS qrank
      FROM scored),
    exq AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 10),
    rer AS (
      SELECT c.query_id, c.vec_id, c.qcos,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM cand c
      JOIN embeddings e ON c.vec_id = e.vec_id
      JOIN exq q ON q.query_id = c.query_id
      WHERE c.qrank <= 20),
    final_ranked AS (
      SELECT query_id, vec_id, qcos, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM rer)
    SELECT query_id, rank, vec_id AS neighbor_id, cos, qcos
    FROM final_ranked WHERE rank <= 5
    ORDER BY query_id, rank"""))

  /** One Lloyd (k-means) centroid-update step over s03's cell assignment
    * — the TRAINING side of IVF (s03/s04 consume centroids; this is how
    * they'd be refined). Per (cell, dim): member count, exact integer sum
    * of floor-quantized components (floor(v·1024) — float→double→·2^10 is
    * exact, floor unambiguous in both engines, so the cross-row SUM is
    * exact integer arithmetic with NO float accumulation-order
    * sensitivity), and the new centroid component as one double division.
    *
    * Scale shape: assignment is s03's plan (centroids broadcast, one
    * window); the update is posexplode (×64) → hash agg on the short
    * (cell, dim) key — partial map-side combine collapses each partition
    * to ≤ cells×64 rows before the ONE shuffle, so the exchange moves
    * sketch-sized data no matter the corpus size. Iterating = re-running
    * with the emitted centroids as the next seed table. */
  val s06KmeansUpdate: Q = Q("s06_kmeans_update", (s, d) => {
    cellRanks(normed(s, d))
      .filter(col("rn") === 1)
      .select(col("centroid_label").as("cell_id"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell_id"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("v").cast("double") * 1024).cast("long")).as("sum_q"))
      .select(col("cell_id"), col("dim"), col("n_vecs"), col("sum_q"),
        (col("sum_q").cast("double") / col("n_vecs").cast("double"))
          .as("centroid_q"))
      .orderBy(col("cell_id"), col("dim"))
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
    exploded AS (
      SELECT centroid_label AS cell_id,
        CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
        unnest(list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))) AS q
      FROM ranked JOIN embeddings e USING (vec_id)
      WHERE rn = 1)
    SELECT cell_id, dim, COUNT(*) AS n_vecs,
      CAST(SUM(q) AS BIGINT) AS sum_q,
      CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid_q
    FROM exploded GROUP BY cell_id, dim
    ORDER BY cell_id, dim"""))

  /** Product-quantized compressed scan + exact re-rank — the third
    * compressed search path beside s02 (LSH buckets) and s05 (SQ8): the
    * corpus is held as m=16 one-byte codes per vector (a 16x-smaller scan
    * set than the float embeddings), ADC keeps a 150-candidate sliver per
    * query from table lookups alone, and ONLY that sliver joins back to
    * the float vectors for the exact cosine top-5 the oracle verifies.
    * (m=8 codes measured recall@5 < 1 on the 5k-vector tier — a true
    * rank-2 neighbor fell outside a 100-candidate sliver; 4-dim
    * subquantizers restore it with margin.)
    * Codebooks fit in-engine (ProductQuantizer.fit, bit-deterministic
    * Lloyd rounds) and broadcast; the encoded corpus joins the per-query
    * lookup tables on (sub, code) — nothing all-pairs, nothing float in
    * the scan stage. At 100 TB this composes with IVF (s04) exactly like
    * s05: prune cells, ADC-scan survivors compressed, re-rank the sliver.
    * The recall contract (sliver covers the true top-k) is pinned in
    * ProductQuantizerSpec; here the 30x candidate margin makes the final
    * top-5 exact, so the DuckDB oracle is the plain exact kNN. */
  val s07PqRerank: Q = Q("s07_pq_rerank", (s, d) => {
    val e = normed(s, d)
    val model = graft.operators.ProductQuantizer.fit(
      s, e, m = 16, k = 256, rounds = 3)
    val enc = graft.operators.ProductQuantizer.encode(e, model)
    val queries = e.filter(col("vec_id") < 10)
    val cands = graft.operators.ProductQuantizer.search(
      enc, model, queries, topK = 150)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.select(col("query_id"), col("neighbor_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), col("nrm").as("cn")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q"), col("nrm").as("qn"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosPre(col("q"), col("qn"), col("cv"), col("cn")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }, Some(s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT query_id, e.vec_id,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM q JOIN embeddings e ON query_id <> e.vec_id),
    ranked AS (
      SELECT query_id, vec_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, cos
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank"""))

  /** RANGE (radius) search — the other half of the vector-search API:
    * not "k nearest" but "ALL neighbors with cos ≥ τ", the primitive
    * behind near-dup sweeps and recall-controlled retrieval. Exact form:
    * the 20-query side broadcasts, the corpus streams once and never
    * shuffles, each pair evaluates one native dot against precomputed
    * norms, and per-query match counts ride a window over the (sparse)
    * match rows. At corpus scale the production path is the d07/s02
    * bucket-prune composed with this exact verify inside buckets —
    * range search is precisely the verify stage, so the exact operator
    * IS the scale path's inner loop. */
  val s08RangeSearch: Q = Q("s08_range_search", (s, d) => {
    val e = normed(s, d)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
    broadcast(queries).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .filter(col("cos") >= 0.3)
      .withColumn("n_matches", count(lit(1)).over(w))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("n_matches"))
      .orderBy(col("query_id"), col("neighbor_id"))
  }, Some(s"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT query_id, e.vec_id,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM q JOIN embeddings e ON query_id <> e.vec_id),
    matches AS (SELECT * FROM scored WHERE cos >= 0.3)
    SELECT query_id, vec_id AS neighbor_id, cos,
      CAST(COUNT(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_matches
    FROM matches ORDER BY query_id, neighbor_id"""))

  /** MMR diversified retrieval under the ORACLE gate: retrieve the
    * top-12 candidates for query vector 0, then greedily select k=3 by
    * λ·rel − (1−λ)·max-sim (λ=0.5) — graft.operators.Mmr driving the
    * selection, with DuckDB replaying the greedy rounds as CHAINED
    * ARGMAX CTEs (fixed k makes the sequential loop SQL-expressible).
    * Every cosine shares the DotProduct fold order, so relevance AND
    * the mmr scores hash-match bit-for-bit — the operator's driver
    * loop is proven equivalent to a relational spelling, not just to
    * the in-repo reference implementation (MmrSpec). */
  val s10Mmr: Q = Q("s10_mmr", (s, d) => {
    val e = normed(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    // top-12 via orderBy+limit: plans TakeOrderedAndProject (per-
    // partition top-k, then a 12-row merge) — a global rank window
    // would single-partition the corpus (pinned in PlanAuditSpec)
    val pool = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        (VectorFns.dot(col("embedding"), typedLit(q)) /
          (col("nrm") * lit(qn))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(12)
      .select(col("vec_id"), col("embedding"))
    graft.operators.Mmr.rerank(pool, "vec_id", "embedding", q,
        k = 3, lambda = 0.5)
      .select(col("mmr_rank"), col("vec_id").as("neighbor_id"),
        col("relevance"), col("mmr_score"))
      .orderBy(col("mmr_rank"))
  }, Some(s"""
    WITH q AS (
      SELECT embedding AS qv, ${VectorSql.norm("embedding")} AS qn
      FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.embedding,
        ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("e.embedding")} * qn) AS rel
      FROM embeddings e, q WHERE e.vec_id <> 0),
    pool AS (
      SELECT vec_id, embedding, rel,
        row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS rk
      FROM scored),
    cand AS (SELECT vec_id, embedding, rel FROM pool WHERE rk <= 12),
    p1 AS (
      SELECT vec_id, embedding, rel, 0.5 * rel AS score
      FROM cand ORDER BY 0.5 * rel DESC, vec_id ASC LIMIT 1),
    s2 AS (
      SELECT c.vec_id, c.embedding, c.rel,
        0.5 * c.rel - 0.5 * (${VectorSql.dot("c.embedding", "p1.embedding")}
          / (${VectorSql.norm("c.embedding")}
             * ${VectorSql.norm("p1.embedding")})) AS score
      FROM cand c, p1 WHERE c.vec_id <> p1.vec_id),
    p2 AS (SELECT * FROM s2 ORDER BY score DESC, vec_id ASC LIMIT 1),
    s3 AS (
      SELECT c.vec_id, c.rel,
        0.5 * c.rel - 0.5 * greatest(
          ${VectorSql.dot("c.embedding", "p1.embedding")}
            / (${VectorSql.norm("c.embedding")}
               * ${VectorSql.norm("p1.embedding")}),
          ${VectorSql.dot("c.embedding", "p2.embedding")}
            / (${VectorSql.norm("c.embedding")}
               * ${VectorSql.norm("p2.embedding")})) AS score
      FROM cand c, p1, p2
      WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id),
    p3 AS (SELECT * FROM s3 ORDER BY score DESC, vec_id ASC LIMIT 1)
    SELECT 1 AS mmr_rank, vec_id AS neighbor_id, rel AS relevance,
      score AS mmr_score FROM p1
    UNION ALL SELECT 2, vec_id, rel, score FROM p2
    UNION ALL SELECT 3, vec_id, rel, score FROM p3
    ORDER BY mmr_rank"""))

  /** FILTERED IVF search — s09's metadata predicate composed with s04's
    * cell-probed index, the production RAG shape at index scale: the
    * filter (label even) prunes the ASSIGNMENT side BEFORE any scoring,
    * so only matching vectors inside the probed cells are ranked
    * (pre-filtering semantics — post-filtering a top-k under-returns
    * when the filter is selective). Scale shape = s04's: one equi-join
    * on the cell key, the tiny probe side broadcast, no join back to
    * the corpus; the predicate rides the index scan. */
  val s11FilteredIvf: Q = Q("s11_filtered_ivf", (s, d) => {
    val ranks = cellRanks(normed(s, d)).cache()
    val assignment = ranks
      .filter(col("rn") === 1 && col("label") % 2 === 0)
      .select(col("vec_id"), col("label"),
        col("centroid_label").as("cell"), col("embedding"), col("nrm"))
    val probes = ranks.filter(col("vec_id") < 10 && col("rn") <= 2)
      .select(col("vec_id").as("query_id"),
        col("centroid_label").as("cell"),
        col("embedding").as("q"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes)
      .join(assignment, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("label"), col("cell"),
        cosPre(col("q"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("label"), col("cos"), col("cell").as("probed_cell"))
      .orderBy(col("query_id"), col("rank"))
  }, Some(s"""
    WITH seeds AS (
      SELECT label AS centroid_label, MIN(vec_id) AS seed_id
      FROM embeddings GROUP BY label),
    centroids AS (
      SELECT centroid_label, e.embedding AS centroid
      FROM seeds JOIN embeddings e ON seed_id = e.vec_id),
    scored AS (
      SELECT e.vec_id, e.label, centroid_label,
        CASE WHEN ${VectorSql.norm("e.embedding")} = 0
          OR ${VectorSql.norm("centroid")} = 0 THEN NULL
        ELSE ${VectorSql.dot("e.embedding", "centroid")}
          / (${VectorSql.norm("e.embedding")} * ${VectorSql.norm("centroid")})
        END AS cos
      FROM embeddings e CROSS JOIN centroids),
    ranked AS (
      SELECT vec_id, label, centroid_label, cos,
        row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, centroid_label ASC) AS rn
      FROM scored),
    assignment AS (
      SELECT vec_id, label, centroid_label AS cell
      FROM ranked WHERE rn = 1 AND label % 2 = 0),
    probes AS (
      SELECT vec_id AS query_id, centroid_label AS cell
      FROM ranked WHERE vec_id < 10 AND rn <= 2),
    queries AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 10),
    cands AS (
      SELECT p.query_id, a.vec_id, a.label, p.cell,
        CASE WHEN ${VectorSql.norm("qv")} = 0
          OR ${VectorSql.norm("e.embedding")} = 0 THEN NULL
        ELSE ${VectorSql.dot("qv", "e.embedding")}
          / (${VectorSql.norm("qv")} * ${VectorSql.norm("e.embedding")})
        END AS cos
      FROM probes p
      JOIN assignment a ON p.cell = a.cell AND p.query_id <> a.vec_id
      JOIN queries ON queries.query_id = p.query_id
      JOIN embeddings e ON e.vec_id = a.vec_id),
    final_ranked AS (
      SELECT query_id, vec_id, label, cell, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rank
      FROM cands)
    SELECT query_id, rank, vec_id AS neighbor_id, label, cos,
      cell AS probed_cell
    FROM final_ranked WHERE rank <= 5
    ORDER BY query_id, rank"""))
}
