package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** SemDeDup (Abbas et al. 2023) at PRODUCTION K — the operator form of
  * catalog query d13. The query fixes its clustering to deterministic
  * label seeds so DuckDB verifies the keep rule exactly; here the
  * clustering is a real [[KMeans]] fit at caller-chosen K (K ~ √N bounds
  * per-cell pair work — the published configuration), then the same
  * order-independent keep rule: of every same-cell pair with cosine ≥
  * `threshold`, the member FARTHEST from its centroid survives (ties on
  * id). Because the beat relation totally orders every near-dup pair,
  * the kept set provably contains NO same-cell pair above the threshold
  * (SemDedupSpec pins this invariant plus witness existence).
  *
  * Scale shape: centroids broadcast (model-sized driver state only);
  * the quadratic scan never crosses cell boundaries — the only wide
  * exchange is the shuffle on the cell key; output is one row per input
  * vector. The intermediate assignment is cached for its three uses;
  * callers clear the cache (or session) when done, as with the query
  * catalog's scoped caches.
  */
object SemDedup {

  /** Returns (idCol, cell, cos_c, kept) — one row per corpus vector. */
  def run(spark: SparkSession, corpus: DataFrame, k: Int,
      threshold: Double, fitRounds: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && threshold > 0.0)
    val model = KMeans.fit(spark, corpus, k, fitRounds, idCol, vecCol)
    val assigned = corpus
      .select(col(idCol), col(vecCol),
        VectorFns.norm(col(vecCol)).as("__nrm"))
      .join(model.assignments.select(col(idCol), col("cell"),
        col("cos").as("cos_c")), idCol)
      .cache()
    val pairCos =
      when(col("a.__nrm") === 0 || col("b.__nrm") === 0, lit(null))
        .otherwise(VectorFns.dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.__nrm") * col("b.__nrm")))
    // b beats a ⟺ b is the pair member kept under keep-farthest-from-
    // centroid; an EXISTS over beaten near-dup pairs marks a dropped.
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col(s"a.$idCol") =!= col(s"b.$idCol") &&
          (col("b.cos_c") < col("a.cos_c") ||
            (col("b.cos_c") === col("a.cos_c") &&
              col(s"b.$idCol") < col(s"a.$idCol"))))
      .filter(pairCos >= threshold)
      .select(col(s"a.$idCol").as("__dropped")).distinct()
    assigned
      .join(dropped, col(idCol) === col("__dropped"), "left")
      .select(col(idCol), col("cell"), col("cos_c"),
        col("__dropped").isNull.as("kept"))
  }

  /** INCREMENTAL semantic dedup: KEEP/DROP decisions for a NEW batch
    * against a persisted clustered corpus — the [[NearDup.pairsWithCorpus]]
    * twin for the embedding family. The corpus index is
    * [[VectorSearch.writeIndex]]'s layout ((id, vec, nrm) PARTITIONED BY
    * cell), so the scan is partition-PRUNED to the batch's own cells —
    * a day's batch against a 100 TB corpus reads only the cells the
    * batch lands in. Corpus members always win (the corpus is the
    * stable, already-deduped set — re-litigating it per batch would
    * churn accepted data); batch-internal pairs use the standard
    * keep-farthest-from-centroid rule.
    *
    * Returns (idCol, cell, cos_c, kept, dropped_by) — `dropped_by` is
    * 'corpus', 'batch', or null, with corpus precedence. Survivors are
    * what an ingest appends to the index (per-cell file adds, per
    * writeIndex's contract). */
  def batchAgainstIndex(spark: SparkSession, batch: DataFrame,
      centroids: DataFrame, indexPath: String, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0.0)
    val assigned = batch
      .select(col(idCol), col(vecCol),
        VectorFns.norm(col(vecCol)).as("__nrm"))
      .join(VectorSearch.ivfAssign(batch, centroids, corpusId = idCol,
        cellId = "cell", vecCol = vecCol)
        .select(col(idCol), col("cell"), col("cos").as("cos_c")), idCol)
      .cache()
    // batch-cell literals collect (batch-sized, bounded) → the index
    // read lists and scans ONLY those partitions. A not-yet-written
    // index (first batch of a stream) is an empty corpus.
    val cells = assigned.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val idx = (try Some(spark.read.parquet(indexPath))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") => None
      })
      .map(_.filter(col("cell").isin(cells: _*))
        .select(col("cell"), col(vecCol).as("__cv"),
          col("nrm").as("__cn")))
      .getOrElse(assigned.limit(0)
        .select(col("cell"), col(vecCol).as("__cv"),
          col("__nrm").as("__cn")))
    val corpusCos =
      when(col("a.__nrm") === 0 || col("b.__cn") === 0, lit(null))
        .otherwise(VectorFns.dot(col(s"a.$vecCol"), col("b.__cv")) /
          (col("a.__nrm") * col("b.__cn")))
    val dupOfCorpus = assigned.as("a").join(idx.as("b"), Seq("cell"))
      .filter(corpusCos >= threshold)
      .select(col(s"a.$idCol").as("__c_dropped")).distinct()
    val pairCos =
      when(col("a.__nrm") === 0 || col("b.__nrm") === 0, lit(null))
        .otherwise(VectorFns.dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.__nrm") * col("b.__nrm")))
    val dupOfBatch = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col(s"a.$idCol") =!= col(s"b.$idCol") &&
          (col("b.cos_c") < col("a.cos_c") ||
            (col("b.cos_c") === col("a.cos_c") &&
              col(s"b.$idCol") < col(s"a.$idCol"))))
      .filter(pairCos >= threshold)
      .select(col(s"a.$idCol").as("__b_dropped")).distinct()
    assigned
      .join(dupOfCorpus, col(idCol) === col("__c_dropped"), "left")
      .join(dupOfBatch, col(idCol) === col("__b_dropped"), "left")
      .select(col(idCol), col("cell"), col("cos_c"),
        (col("__c_dropped").isNull && col("__b_dropped").isNull)
          .as("kept"),
        when(col("__c_dropped").isNotNull, lit("corpus"))
          .when(col("__b_dropped").isNotNull, lit("batch"))
          .otherwise(lit(null)).as("dropped_by"))
  }

  /** STREAMING semantic dedup — the full incremental loop: every
    * micro-batch decides against the index as it stands
    * ([[batchAgainstIndex]]: cell-pruned scan, corpus wins), then its
    * SURVIVORS append to the index in [[VectorSearch.writeIndex]]'s
    * cell-partitioned layout (per-cell file adds — no rewrite), so a
    * later batch's near-dup of an earlier batch's survivor is dropped.
    * The accepted corpus only ever grows with non-duplicates; run
    * [[run]] offline to re-cluster when the centroids drift. */
  def streamDedup(spark: SparkSession, stream: DataFrame,
      centroids: DataFrame, indexPath: String, threshold: Double,
      checkpoint: String, idCol: String = "vec_id",
      vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, _: Long) => {
        val decisions =
          batchAgainstIndex(spark, batch, centroids, indexPath,
            threshold, idCol, vecCol)
        decisions
          .filter(col("kept"))
          .join(batch.select(col(idCol), col(vecCol)), idCol)
          .select(col(idCol), col(vecCol),
            VectorFns.norm(col(vecCol)).as("nrm"), col("cell"))
          .write.partitionBy("cell")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
        ()
      })
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
