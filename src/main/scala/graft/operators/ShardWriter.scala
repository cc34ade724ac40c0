package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data EXPORT: write a curated corpus as N balanced,
  * deterministically-ordered parquet shards plus a manifest — the last
  * step of the curation pipeline (after dedup/filter/pack) and the
  * contract a training job consumes. The published loaders (WebDataset,
  * Mosaic streaming, HF datasets) all want the same three properties
  * this operator pins:
  *
  *  - DETERMINISTIC GLOBAL SHUFFLE: shard assignment and within-shard
  *    order come from md5(id) — a pseudo-random permutation that is a
  *    pure function of the data (re-running the export reproduces every
  *    shard), de-correlating adjacent training examples from their
  *    source/crawl order without any RNG state.
  *  - BALANCE: hash assignment spreads rows ~uniformly over N shards
  *    (training-step cost is the max shard, not the mean); one output
  *    file per shard via a shard-keyed repartition, so N maps to the
  *    loader's worker fan-out.
  *  - MANIFEST: one row per shard (rows, token sum, content checksum) —
  *    the loader's integrity check and the resumable-download index.
  *    The checksum is an exact-decimal SUM of per-row position-keyed
  *    hashes: commutative, so it map-side combines at any scale (no
  *    shard-sized collect), yet any dropped/duplicated/mutated row
  *    changes it (rows carry their order key INSIDE the hash, so
  *    position tampering is content tampering).
  *
  * Scale: one hash-keyed shuffle of the corpus (the export IS a
  * shuffle), manifest aggregation rides the same partitioning, and the
  * writer emits shards in parallel. Re-export after an upstream change
  * rewrites only what a differing manifest row identifies.
  */
object ShardWriter {

  /** Shard id in [0, n) for `id` — first 8 hex digits of md5. */
  def shardOf(id: Column, n: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(n.toLong)).cast("int")

  /** Within-shard order key: the full md5 (the deterministic shuffle). */
  def orderKey(id: Column): Column = md5(id.cast("string"))

  /** Per-shard manifest of a __shard-keyed frame: rows, token sum, and
    * the mergeable content checksum (48-bit row hashes summed as exact
    * DECIMAL(38,0) — overflow-free past 10^23 rows per shard). */
  private def manifestOf(keyed: DataFrame, id: Column,
      nTokens: Column): DataFrame =
    keyed
      .withColumn("__rowsum",
        conv(substring(md5(concat_ws("|", orderKey(id),
          nTokens.cast("string"))), 1, 12), 16, 10)
          .cast(DecimalType(38, 0)))
      .groupBy(col("__shard").as("shard"))
      .agg(count(lit(1)).as("rows"),
        sum(nTokens.cast("long")).as("tokens"),
        sum(col("__rowsum")).as("checksum"))

  /** Write `df` as `n` shards under `dir` (shard=K subdirs, one parquet
    * file each) and return the manifest — also written to
    * `dir/_manifest`. `id` must be unique per row; `nTokens` feeds the
    * token accounting (pass lit(0) if irrelevant). */
  def write(spark: SparkSession, df: DataFrame, id: Column,
      nTokens: Column, dir: String, n: Int): DataFrame = {
    require(n > 0, s"shard count must be positive, got $n")
    val keyed = df.withColumn("__shard", shardOf(id, n))
    keyed
      .withColumn("__ord", orderKey(id))
      .repartition(n, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__ord"))
      .drop("__ord")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__shard")
      .parquet(s"$dir/data")
    val manifest = manifestOf(keyed, id, nTokens).orderBy(col("shard"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/_manifest")
    manifest
  }

  /** Incremental re-export after an upstream change (new/changed/removed
    * rows from a re-run of the curation pipeline): recompute the manifest
    * from the new corpus — one aggregate, no data write — diff it against
    * the stored manifest, and rewrite ONLY the shards whose row count or
    * checksum moved (dynamic partition overwrite, so untouched shard
    * files stay byte-identical for resumable loaders). Falls back to a
    * full [[write]] when no manifest exists or the shard count changed.
    * Returns the rewritten shard ids. */
  def writeIncremental(spark: SparkSession, df: DataFrame, id: Column,
      nTokens: Column, dir: String, n: Int): Seq[Int] = {
    require(n > 0, s"shard count must be positive, got $n")
    val manifestPath = s"$dir/_manifest"
    val havePrev =
      try spark.read.parquet(manifestPath).count() == n.toLong
      catch { case _: Exception => false }
    if (!havePrev) {
      write(spark, df, id, nTokens, dir, n)
      return (0 until n).toSeq
    }
    val keyed = df.withColumn("__shard", shardOf(id, n))
    val fresh = manifestOf(keyed, id, nTokens)
    val stored = spark.read.parquet(manifestPath)
    val changed = stored.as("s")
      .join(fresh.as("a"), col("s.shard") === col("a.shard"), "full_outer")
      .filter(col("s.checksum").isNull || col("a.checksum").isNull ||
        col("s.checksum") =!= col("a.checksum") ||
        col("s.rows") =!= col("a.rows"))
      .select(coalesce(col("s.shard"), col("a.shard")).as("shard"))
      .collect().map(_.getInt(0)).toSeq.sorted
    if (changed.nonEmpty) {
      keyed
        .filter(col("__shard").isin(changed.map(Integer.valueOf): _*))
        .withColumn("__ord", orderKey(id))
        .repartition(changed.size, col("__shard"))
        .sortWithinPartitions(col("__shard"), col("__ord"))
        .drop("__ord")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__shard")
        .parquet(s"$dir/data")
      // a shard whose rows ALL vanished gets no partition from the
      // dynamic overwrite — drop its stale dir explicitly
      val freshShards = fresh.select("shard").collect()
        .map(_.getInt(0)).toSet
      changed.filterNot(freshShards).foreach { s =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/data/__shard=$s")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      }
      fresh.orderBy(col("shard")).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(manifestPath)
    }
    changed
  }

  /** Re-read one shard in its manifest order (the order training sees). */
  def readShard(spark: SparkSession, dir: String, shard: Int,
      id: Column): DataFrame =
    spark.read.parquet(s"$dir/data/__shard=$shard")
      .withColumn("__ord", orderKey(id))
      .orderBy(col("__ord")).drop("__ord")

  /** Integrity check: recompute the manifest from the written shards and
    * diff against the stored one. Returns mismatching shard ids (missing
    * on either side, row-count drift, or checksum drift). */
  def verify(spark: SparkSession, dir: String, id: Column,
      nTokens: Column): Seq[Int] = {
    val stored = spark.read.parquet(s"$dir/_manifest")
    val actual = manifestOf(
      spark.read.parquet(s"$dir/data")
        .withColumn("__shard", col("__shard").cast("int")),
      id, nTokens)
    stored.as("s").join(actual.as("a"),
        col("s.shard") === col("a.shard"), "full_outer")
      .filter(col("s.checksum").isNull || col("a.checksum").isNull ||
        col("s.checksum") =!= col("a.checksum") ||
        col("s.rows") =!= col("a.rows"))
      .select(coalesce(col("s.shard"), col("a.shard")).as("shard"))
      .collect().map(_.getInt(0)).toSeq
  }
}
