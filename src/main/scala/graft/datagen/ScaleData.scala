package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic SYNTHETIC SCALE CORPUS generator — the round-10
  * verdict's "no empirical scale point beyond sf0.1" closer. The driver
  * testdata is read-only and capped at sf0.1, so scale experiments
  * synthesize their own corpus with the SAME table shapes
  * (`documents(doc_id, text, lang, source, n_chars)`,
  * `embeddings(vec_id, embedding float[64], label)`, plus the
  * `orders`/`lineitem` columns the graph queries touch), sized by a
  * multiplier over the sf0.1 row counts (mult=10 → 50k docs / 20k
  * vectors / 1.5M orders / 6M lineitem).
  *
  * Everything derives from `xxhash64` of the row id — fully
  * distributed generation (a `spark.range` and per-row expressions; no
  * driver-side loops, no `Random`), byte-identical across runs, and
  * structured the way the dedup/ANN lineages need:
  *
  *  - documents form near-dup GROUPS of 5 consecutive ids; ~40% of a
  *    group's members copy the group seed's token stream with ~4%
  *    per-token mutation (high-jaccard near-dups LSH must catch), the
  *    rest draw independent streams. Cluster sizes are bounded (≤5),
  *    so verified-pair counts scale LINEARLY with the corpus — the
  *    regime a deduplicated web corpus shows, and the one where a
  *    superlinear stage in the engine (not the data) is visible as a
  *    wall-clock ratio above the multiplier.
  *  - embeddings draw one of 10 label centroids plus bounded noise,
  *    L2-normalized — IVF cells stay balanced at any multiplier.
  *  - orders/lineitem give q57's customer–supplier graph ~mult× the
  *    sf0.1 edge count with the same degree distribution shape. */
object ScaleData {

  private val Vocab: Seq[String] = Seq(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "table", "vector", "join", "shuffle",
    "cache", "plan", "stage", "task", "codegen", "executor")

  /** documents: groups of 5; dup members share the group seed's token
    * stream (length included) with a ~4% mutation rate.
    *
    * `vocabVariants` widens each base word into `_0.._V-1` variants so
    * the TOKEN VOCABULARY grows with the corpus (Heaps' law: V ∝ √n —
    * pass `3 * sqrt(mult)`): with a FIXED tiny vocabulary the bigram
    * space saturates as the corpus grows, every LSH band bucket goes
    * hot, and in-bucket candidate pairing turns quadratic — an
    * adversarial regime real web corpora don't exhibit (ScaleBench ran
    * it once as a stress variant; SCALE.md records both). */
  def documents(spark: SparkSession, n: Long,
      vocabVariants: Int = 3): DataFrame = {
    val vocabSql = Vocab.map(w => s"'$w'").mkString("array(", ",", ")")
    spark.range(n).toDF("doc_id")
      .withColumn("grp", expr("doc_id div 5"))
      .withColumn("is_dup",
        expr("pmod(xxhash64(doc_id, 'dup'), 5) < 2"))
      .withColumn("seed_id",
        expr("if(is_dup, grp * 5, doc_id)"))
      .withColumn("n_tok",
        expr("10 + pmod(xxhash64(seed_id, 'len'), 91)"))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, n_tok), j ->
           |  concat(element_at($vocabSql, cast(1 + pmod(xxhash64(
           |    if(is_dup and pmod(xxhash64(doc_id, j, 'mut'), 25) = 0,
           |       doc_id, seed_id), j), ${Vocab.size}) as int)),
           |  '_', pmod(xxhash64(
           |    if(is_dup and pmod(xxhash64(doc_id, j, 'mut'), 25) = 0,
           |       doc_id, seed_id), j, 'var'), $vocabVariants))), ' ')
           |""".stripMargin))
      .withColumn("lang", expr(
        """case when pmod(xxhash64(doc_id, 'lang'), 100) < 55 then 'en'
          |  when pmod(xxhash64(doc_id, 'lang'), 100) < 70 then 'es'
          |  when pmod(xxhash64(doc_id, 'lang'), 100) < 80 then 'fr'
          |  when pmod(xxhash64(doc_id, 'lang'), 100) < 90 then 'de'
          |  else 'zh' end""".stripMargin))
      .withColumn("source",
        expr("concat('src', pmod(xxhash64(doc_id, 'src'), 20))"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** embeddings: 64-dim unit vectors around 10 label centroids. */
  def embeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("label",
        expr("cast(pmod(xxhash64(vec_id, 'lbl'), 10) as int)"))
      .withColumn("raw", expr(
        """transform(sequence(0, 63), k ->
          |  (pmod(xxhash64(label, k, 'cent'), 2001) - 1000) / 1000.0d
          |  + 0.25d * ((pmod(xxhash64(vec_id, k, 'nz'), 2001) - 1000)
          |             / 1000.0d))""".stripMargin))
      .withColumn("nrm",
        expr("sqrt(aggregate(raw, 0.0d, (a, x) -> a + x * x))"))
      .withColumn("embedding",
        expr("transform(raw, x -> cast(x / nrm as float))"))
      .select("vec_id", "embedding", "label")

  /** orders/lineitem: only the columns the graph/join lineages read. */
  def orders(spark: SparkSession, n: Long, nCust: Long): DataFrame =
    spark.range(n)
      .select((col("id") + 1).as("o_orderkey"),
        expr(s"1 + pmod(xxhash64(id, 'cust'), ${nCust}L)").as("o_custkey"))

  def lineitem(spark: SparkSession, n: Long, nOrders: Long,
      nSupp: Long): DataFrame =
    spark.range(n)
      .select(expr(s"1 + pmod(xxhash64(id, 'ord'), ${nOrders}L)")
        .as("l_orderkey"),
        expr(s"1 + pmod(xxhash64(id, 'sup'), ${nSupp}L)").as("l_suppkey"))

  /** Write the corpus at `mult`× the sf0.1 row counts (idempotent: a
    * dir holding all four tables is reused). The token vocabulary
    * follows Heaps' law (√mult) unless `fixedVocab` pins it — the
    * saturated-shingle stress variant. */
  def ensure(spark: SparkSession, dir: String, mult: Int,
      fixedVocab: Boolean = false): Unit = {
    // fixedVocab pins ONE variant (30 tokens, ~900 bigrams — the fully
    // saturated shingle space of the committed SCALE_STRESS run)
    val variants =
      if (fixedVocab) 1 else math.max(3, math.round(
        3.0 * math.sqrt(mult.toDouble)).toInt)
    // generation marker: a dir is reusable only when it was produced
    // by THIS generator shape — a generator change must regenerate,
    // never silently serve a stale corpus under the new description
    val gen = s"scaledata-v2:mult=$mult:variants=$variants"
    val genPath = java.nio.file.Paths.get(s"$dir/_gen")
    val names = Seq("documents", "embeddings", "orders", "lineitem")
    val complete = names.forall(n =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$dir/$n.parquet/_SUCCESS")))
    val sameGen = java.nio.file.Files.exists(genPath) &&
      new String(java.nio.file.Files.readAllBytes(genPath),
        "UTF-8").trim == gen
    if (complete && sameGen) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.deleteIfExists(genPath)
    documents(spark, 5000L * mult, variants)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    embeddings(spark, 2000L * mult)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    orders(spark, 150000L * mult, 15000L * mult)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    lineitem(spark, 600000L * mult, 150000L * mult, 1000L * mult)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    // marker written LAST: a crash mid-generation leaves no marker and
    // the next ensure() regenerates
    java.nio.file.Files.write(genPath, gen.getBytes("UTF-8"))
    ()
  }
}
