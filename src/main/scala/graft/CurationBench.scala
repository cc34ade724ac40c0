package graft

import graft.functions.TextFns.{shingles, tokens}
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** END-TO-END training-data curation benchmark — the corpus-side
  * companion of [[PipelineBench]] (which measures the reference-shaped
  * warehouse DAG): the canonical LLM-data pipeline run as ONE dataflow
  * over the driver's documents+embeddings tables, with per-phase
  * wall-clock so composition cost (not just per-operator cost, which
  * graft.Bench measures) is a recorded number.
  *
  * Phases (each an operator family the catalog gates individually):
  *   1. quality_gate        heuristic scoring + filter (CorpusOps)
  *   2. classifier_distill  train the hashed-logistic classifier ON the
  *                          heuristic labels (distillation), score all
  *   3. near_dedup          MinHash+LSH clusters → canonical survivors
  *   4. semantic_dedup      SemDeDup over the embeddings table
  *   5. split               deterministic hash split
  *   6. decontaminate       drop train docs sharing 5-grams with test
  *   7. bpe_train           learn subword merges on the train split
  *   8. tokenize_pack       encode to token ids, pack 512-token seqs
  *   9. export              balanced shard export + manifest verify
  *  10. day-2 incremental    a new batch through the INCREMENTAL paths:
  *                           bloom dedup vs the corpus, the frozen
  *                           saved tokenizer, manifest-diff re-export
  *
  * Output: phase log to stderr, ONE JSON line to stdout. Recorded in
  * PLANS.md. SPARK_GRAFT_SF_DIR selects the scale (default sf0.1).
  */
object CurationBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_CURATION_DIR",
      java.nio.file.Files.createTempDirectory("graft_curation").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    System.err.println(s"🚀 Curation pipeline: $sfDir → $out")
    val t0 = System.nanoTime()
    var phases = Vector.empty[(String, Double)]
    def phase[A](name: String)(body: => A): A = {
      val p0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - p0) / 1e9
      phases :+= ((name, dt))
      System.err.println(f"✅ Phase $name done in $dt%.1fs")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    // 1. heuristic quality gate
    val quality = phase("quality_gate") {
      val q = CorpusOps.qualityScore(
        docs.select(col("doc_id"), col("source"), col("text")),
        "doc_id", "text", stopwords = Seq("the", "a"))
        .select(col("doc_id"), col("quality_ok"))
        .join(docs, Seq("doc_id"))
        .localCheckpoint(true)
      q.count(); q
    }
    val kept = quality.filter(col("quality_ok"))
      .select(col("doc_id"), col("source"), col("text"))

    // 2. distill the heuristic gate into the trained classifier and
    // score every doc (the model-based filter a production pipeline
    // would apply to data the heuristics never saw)
    val aucLike = phase("classifier_distill") {
      val m = QualityClassifier.train(
        quality.select(col("doc_id"), col("text"),
          col("quality_ok").cast("int").as("label")),
        "doc_id", col("text"), col("label"), iters = 15, lr = 4.0)
      val scored = QualityClassifier.score(
        quality.select(col("doc_id"), col("text")), "doc_id",
        col("text"), m)
        .join(quality.select(col("doc_id"),
          col("quality_ok").cast("int").as("label")), "doc_id")
      // agreement with the teacher labels (the distillation check)
      scored.select(avg(((col("p_quality") > 0.5).cast("int") ===
        col("label")).cast("int"))).head().getDouble(0)
    }

    // 3. near-dup canonicalization
    val canonical = phase("near_dedup") {
      val clusters = NearDup.clusters(kept, "doc_id", "text")
      val c = kept.join(clusters.filter(!col("is_canonical"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      c.count(); c
    }

    // 4. semantic dedup over the embeddings table (own id space)
    val nVecSurvivors = phase("semantic_dedup") {
      val emb = Tables.embeddings(spark, sfDir)
      val k = math.max(4, math.sqrt(emb.count().toDouble).toInt / 2)
      SemDedup.run(spark, emb, k, idCol = "vec_id",
        vecCol = "embedding", threshold = 0.97).count()
    }

    // 5. deterministic split
    val split = phase("split") {
      val s = CorpusOps.hashSplit(canonical, "doc_id").localCheckpoint(true)
      s.count(); s
    }

    // 6. decontamination (train vs test 5-grams)
    val clean = phase("decontaminate") {
      val grams = split.select(col("doc_id"), col("split"),
        explode(shingles(tokens(col("text")), 5)).as("gram"))
      val testGrams = grams.filter(col("split") === "test")
        .select(col("gram")).distinct()
      val contaminated = grams.filter(col("split") === "train")
        .join(broadcast(testGrams), Seq("gram"))
        .select(col("doc_id")).distinct()
      val c = split.filter(col("split") =!= "train")
        .unionByName(split.filter(col("split") === "train")
          .join(contaminated, Seq("doc_id"), "left_anti"))
        .localCheckpoint(true)
      c.count(); c
    }
    val train = clean.filter(col("split") === "train")
      .select(col("doc_id"), col("source"), col("text"))

    // 7. BPE training on the surviving train split
    val learned = phase("bpe_train") {
      val wc = Bpe.wordCounts(train, col("text")).localCheckpoint(true)
      val ms = Bpe.fit(wc, numMerges = merges)
      val vocab = Bpe.fullVocab(wc, ms)
      Bpe.save(spark, s"$out/bpe_model", ms, vocab)
      (ms, vocab)
    }

    // 8. tokenize to ids + pack fixed sequences per source shard
    val (nTokens, nSeqs) = phase("tokenize_pack") {
      val enc = train.select(col("doc_id"), col("source"),
        Bpe.encodeIds(col("text"), learned._1, learned._2).as("ids"))
        .withColumn("n_tokens", size(col("ids")))
        .localCheckpoint(true)
      val packed = Packing.pack(
        enc.select(col("doc_id"), col("source"), col("n_tokens")),
        col("source"), col("doc_id"), col("n_tokens"), capacity = 512)
      val total = enc.select(sum(col("n_tokens"))).as[Long].head()
      val seqs = packed.groupBy(col("source"))
        .agg((max(col("last_chunk")) + 1).as("n"))
        .select(sum(col("n"))).as[Long].head()
      (total, seqs)
    }

    // 9. shard export + integrity verify
    val nShards = 16
    val badShards = phase("export") {
      val enc = train.select(col("doc_id"),
        size(Bpe.encodeIds(col("text"), learned._1, learned._2))
          .as("n_tokens"))
      ShardWriter.write(spark, enc, col("doc_id"), col("n_tokens"),
        s"$out/shards", nShards)
      ShardWriter.verify(spark, s"$out/shards", col("doc_id"),
        col("n_tokens")).size
    }

    // ── DAY-2 INCREMENTAL PASS: a new document batch flows through the
    // incremental paths — bloom dedup against the existing corpus, the
    // FROZEN tokenizer (Bpe.load — production freezes the vocab), and
    // manifest-diff shard re-export. Batch = half exact duplicates of
    // the corpus (the dedup must drop them) + half genuinely new docs.
    val nIncNew = {
      val dup = docs.limit(250).select(col("doc_id"), col("source"),
        col("text"))
      val fresh = docs.limit(250)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          concat(col("text"), lit(" appended day2 material")).as("text"))
      val batch = dup.unionByName(fresh)
      val survivors = phase("inc_dedup") {
        val kept = BloomDedup.filterNew(
          batch.withColumn("h", md5(col("text"))),
          train.withColumn("h", md5(col("text"))), "h",
          expectedItems = 10000)
          .localCheckpoint(true)
        kept.count(); kept
      }
      val (ms2, vocab2) = phase("inc_load_model") {
        Bpe.load(spark, s"$out/bpe_model")
      }
      phase("inc_encode_export") {
        val newEnc = survivors.select(col("doc_id"),
          size(Bpe.encodeIds(col("text"), ms2, vocab2)).as("n_tokens"))
        val allEnc = train.select(col("doc_id"),
          size(Bpe.encodeIds(col("text"), ms2, vocab2)).as("n_tokens"))
          .unionByName(newEnc)
        val changed = ShardWriter.writeIncremental(spark, allEnc,
          col("doc_id"), col("n_tokens"), s"$out/shards", nShards)
        require(ShardWriter.verify(spark, s"$out/shards", col("doc_id"),
          col("n_tokens")).isEmpty, "incremental export must verify")
        changed.size
      }
      survivors.count()
    }

    val total = (System.nanoTime() - t0) / 1e9
    System.err.println(f"🏁 Curation pipeline done in $total%.1fs")
    val phaseJson = phases.map { case (n, s) =>
      s""""$n":${math.round(s * 10) / 10.0}""" }.mkString(",")
    println(s"""{"metric":"curation_e2e","value":${
      math.round(total * 10) / 10.0},"unit":"sec","phases":{$phaseJson},""" +
      s""""docs":$nDocs,"kept":${kept.count()},""" +
      s""""canonical":${canonical.count()},"train":${train.count()},""" +
      s""""distill_agreement":${math.round(aucLike * 1000) / 1000.0},""" +
      s""""vec_survivors":$nVecSurvivors,"bpe_merges":$merges,""" +
      s""""tokens":$nTokens,"sequences":$nSeqs,"shards":$nShards,""" +
      s""""bad_shards":$badShards,"inc_new_docs":$nIncNew}""")
    spark.stop()
  }
}
