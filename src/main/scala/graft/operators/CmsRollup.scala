package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained COUNT-MIN frequency rollup — the third
  * mergeable-sketch materializer next to [[SketchDistinct]] (HLL
  * distincts) and [[KmvRollup]] (KMV set algebra): "how often has key X
  * ever appeared?" over unbounded history from fixed-size state, with
  * the classic CMS guarantee (never an undercount; overcount ≤ εN with
  * probability 1−δ, Cormode & Muthukrishnan 2005).
  *
  * The sketch is stored RELATIONALLY — one row per (depth, cell) counter,
  * depth×width rows total — rather than as a driver-side binary blob
  * (q44's form): counters merge by ADDITION, so each refresh is one
  * map-side-combined aggregate of the batch (depth rows per input key)
  * plus a counter-keyed merge join, entirely distributed, and the
  * stored table doubles as a queryable relation. Probing joins the
  * candidate keys' depth hashes against the counter table and takes the
  * per-key MIN — counters-sized work, no history re-scan.
  *
  * Hashing: xxhash64(key, depth-salt) mod width — engine-native,
  * deterministic, the same family Spark's own bloom machinery uses.
  * Shares the single-writer lock + checked atomic swap with the other
  * materializers.
  */
final class CmsRollup(spark: SparkSession, targetPath: String,
    keyCol: String, depth: Int = 4, width: Int = 2048,
    store: CommitStore = CommitStore.local) {
  require(depth >= 1 && width >= 2)

  private def cells(df: DataFrame, key: Column): DataFrame =
    df.select((0 until depth).map(d =>
        struct(lit(d).as("d"),
          pmod(xxhash64(key.cast("string"), lit(d)), lit(width.toLong))
            .as("c")).as(s"__h$d")): _*)
      .select(explode(array((0 until depth).map(d => col(s"__h$d")): _*))
        .as("h"))
      .select(col("h.d").as("d"), col("h.c").as("c"))

  /** Fold one batch's key occurrences into the stored counters. */
  def refresh(batch: DataFrame): Unit =
    Incremental.withLock(targetPath, Incremental.DefaultLockStaleMs,
        store) {
      val p = cells(batch, col(keyCol))
        .groupBy(col("d"), col("c")).agg(count(lit(1)).as("n"))
      val merged =
        if (!store.exists(targetPath)) p
        else spark.read.parquet(targetPath)
          .withColumnRenamed("n", "n0")
          .join(p.withColumnRenamed("n", "n1"), Seq("d", "c"),
            "full_outer")
          .select(col("d"), col("c"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
              .as("n"))
      Incremental.atomicOverwrite(store, targetPath)(tmp =>
        merged.write.mode(SaveMode.Overwrite).parquet(tmp))
    }

  /** Frequency estimates for candidate keys: per-key MIN over its depth
    * counters (a key never seen reads 0 — its cells are absent or hold
    * other keys' counts, and min-over-depth keeps the bound). */
  def probe(keys: DataFrame, key: Column): DataFrame = {
    val k = keys.select(key.as("__key")).distinct()
    val h = k.select(col("__key"), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          pmod(xxhash64(col("__key").cast("string"), lit(d)),
            lit(width.toLong)).as("c"))): _*)).as("h"))
      .select(col("__key"), col("h.d").as("d"), col("h.c").as("c"))
    h.join(spark.read.parquet(targetPath), Seq("d", "c"), "left")
      .groupBy(col("__key").as(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("freq_est"))
  }

  /** Total folded count (N in the εN bound): sum of any one depth row. */
  def totalCount(): Long =
    spark.read.parquet(targetPath).filter(col("d") === 0)
      .agg(sum(col("n"))).head().getLong(0)
}
