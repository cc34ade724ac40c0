package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's deterministic test tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * single-parquet tables from it. At cluster scale these would be directories
  * of many parquet files / a catalog table — `spark.read.parquet` handles both
  * shapes identically, so nothing here is local-mode specific.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical shapes across driver
    * testdata generations: TIMESTAMP(NANOS) — which Spark's parquet
    * reader rejects, so it is read as long via the legacy conf and
    * integer-divided to micros (exact — no double path, nanos exceed
    * 2^53; matches DuckDB's ns→us truncation) — and plain
    * TIMESTAMP(MICROS), which Spark reads directly (as NTZ under
    * `inferTimestampNTZ`). Normalize BOTH to a session-zone
    * TimestampType column so every downstream query sees one shape. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long file
        timestamp_micros(expr("ts div 1000"))
      case _ => // native timestamp file (NTZ wall-clock = UTC session)
        col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  /** documents/embeddings are single small parquet files (1 input split)
    * but feed COMPUTE-heavy per-row pipelines (minhash, simhash, cosine).
    * Hash-repartition by id so that work spreads across cores — WITH AN
    * EXPLICIT partition count: a bare repartition(col) leaves the count to
    * AQE, which sees ~1 MB of rows and coalesces the exchange to ONE
    * partition, serializing every downstream hash/score pipeline on a
    * single core (measured: whole corpus suite pinned to task 0.0, 10-90×
    * slowdowns). Bytes-small but CPU-heavy data is exactly the case where
    * the partition count must come from compute, not size — same rule a
    * real cluster applies to decode/hash stages over compressed blobs. */
  private def cpus(s: SparkSession): Int = s.sparkContext.defaultParallelism
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").repartition(cpus(s), col("doc_id"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").repartition(cpus(s), col("vec_id"))
}
