package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion: the Spark-native re-expression of the
  * reference's micro-batch file ingester
  * (ingestion/streaming_ingest.py:50-232 in
  * mattyg3/ecommerce_analytics_platform).
  *
  * Mapping (SURVEY.md §2.9):
  *  - ST1 poll loop (1 s)            → micro-batch trigger (ProcessingTime)
  *  - ST2 processed-file checkpoint  → checkpointLocation + file-source log
  *  - ST3 backfill mode              → Trigger.AvailableNow
  *  - ST4 graceful stop              → StreamingQuery.stop / awaitTermination
  *  - ST8 wall-clock batch_id        → foreachBatch's real batchId
  *  - P1/P3 typed projection+lineage → select(casts, lits) before the sink
  *
  * Scale notes: the file source lists on the driver but reads on executors;
  * the projection is narrow (no shuffle); the sink writes
  * partitionBy(ingest_date) so downstream reads partition-prune. Set
  * maxFilesPerTrigger to bound micro-batch size; at 1000 executors the same
  * topology holds — only `spark.sql.shuffle.partitions` and file sizes
  * change.
  */
final class StreamingIngest(spark: SparkSession) {

  /** Typed projection + lineage columns applied to every micro-batch —
    * byte-identical to what a batch backfill produces (SURVEY §7.4 risk 5:
    * stream and batch paths must agree). `ingest_date` is the PROCESSING
    * date (like the reference, ingestion/streaming_ingest.py:82) — late
    * events land in the current partition, never a closed one. */
  def shape(df: DataFrame, sourceSystem: String, batchId: Long): DataFrame =
    df.withColumn("pipeline_ingested_at", current_timestamp())
      .withColumn("ingest_date",
        date_format(current_timestamp(), "yyyy-MM-dd"))
      .withColumn("source_system", lit(sourceSystem))
      .withColumn("batch_id", lit(batchId))

  /** Continuous micro-batch ingest: JSON-lines dir → partitioned parquet.
    * Exactly-once per file via the checkpoint's file-source log. */
  def stream(inputDir: String, schema: StructType, outDir: String,
             checkpointDir: String, sourceSystem: String,
             maxFilesPerTrigger: Int = 16,
             trigger: Trigger = Trigger.ProcessingTime("1 second"))
      : StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // (ingest_date, batch_id) layout mirrors the reference's landing
        // zone (S4) — downstream idempotence keys on batch_id, the only
        // partition that is closed the moment it is written
        shape(batch, sourceSystem, batchId)
          .write.mode("append").partitionBy("ingest_date", "batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Backfill/drain mode: process everything pending, then stop —
    * Trigger.AvailableNow (the reference's `--mode backfill`,
    * ingestion/streaming_ingest.py:180-194). */
  def backfill(inputDir: String, schema: StructType, outDir: String,
               checkpointDir: String, sourceSystem: String): Unit = {
    val q = stream(inputDir, schema, outDir, checkpointDir, sourceSystem,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** Streaming silver: event-time watermark + keyed dedup — the streaming
    * twin of the batch Dedup.keepLatest/1-day-lookback contract (ST5/ST6).
    * State is bounded by the watermark; duplicates beyond it age out. */
  def dedupStream(inputDir: String, schema: StructType, key: String,
                  eventTime: String, lateness: String): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .withWatermark(eventTime, lateness)
      .dropDuplicates(key, eventTime)

  /** Event-time session windows (gap-close semantics) — the streaming
    * generalization of Sessionize.rollup (ST7). */
  def sessionRollup(events: DataFrame, userCol: String, tsCol: String,
                    gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start_ts"),
        max(col(tsCol)).as("session_end_ts"))
      .select(col(userCol),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("session_start_ts"), col("session_end_ts"))
}
