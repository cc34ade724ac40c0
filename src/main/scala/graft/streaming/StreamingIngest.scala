package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

/** One micro-batch's progress row — the engine's mirror of the
  * reference's backfill progress surface
  * (ingestion/helper_functions/backfill_progress.py:3-32, which tails
  * `lastProgress` for per-batch row counts under AvailableNow). */
final case class BatchProgress(queryId: java.util.UUID, batchId: Long,
    numInputRows: Long, timestamp: String)

/** Collects EVERY micro-batch's progress via StreamingQueryListener —
  * `lastProgress` alone only retains the most recent batch, so a drained
  * backfill would lose all but the last row count. Listener events are
  * posted asynchronously; `awaitTerminated` fences on the (FIFO-ordered)
  * termination event so all progress rows are in before reading. */
final class ProgressRecorder extends StreamingQueryListener {
  import scala.jdk.CollectionConverters._
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[BatchProgress]()
  private val done =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    buf.add(BatchProgress(e.progress.id, e.progress.batchId,
      e.progress.numInputRows, e.progress.timestamp)); ()
  }
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    done.add(e.id); ()
  }

  /** Progress rows of one query, in batch order. */
  def batchesFor(id: java.util.UUID): Seq[BatchProgress] =
    buf.asScala.filter(_.queryId == id).toSeq.sortBy(_.batchId)

  def totalRowsFor(id: java.util.UUID): Long =
    batchesFor(id).map(_.numInputRows).sum

  /** Block until the query's termination event has been delivered (the
    * listener bus is async w.r.t. awaitTermination). */
  def awaitTerminated(id: java.util.UUID, timeoutMs: Long = 10000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!done.contains(id) && System.nanoTime() < deadline)
      Thread.sleep(10)
    done.contains(id)
  }
}

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
    * events land in the current partition, never a closed one.
    *
    * `arrivalFrom`: derive the arrival lineage from a source column
    * instead of the wall clock — for REPLAYING history as if the
    * pipeline had been running continuously (a backfill of months of
    * raw data should carry each record's real ingestion moment, not
    * one compressed wall-clock instant, or every downstream
    * arrival-window mechanism sees the whole corpus as "just
    * arrived"). Null values fall back to the wall clock. */
  def shape(df: DataFrame, sourceSystem: String, batchId: Long,
      arrivalFrom: Option[String] = None): DataFrame = {
    val arrival = arrivalFrom
      .map(c => coalesce(col(c).cast("timestamp"), current_timestamp()))
      .getOrElse(current_timestamp())
    df.withColumn("pipeline_ingested_at", arrival)
      .withColumn("ingest_date",
        date_format(col("pipeline_ingested_at"), "yyyy-MM-dd"))
      .withColumn("source_system", lit(sourceSystem))
      .withColumn("batch_id", lit(batchId))
  }

  /** Split raw JSON lines into (parsed, quarantine): a line that fails
    * to parse lands in the quarantine frame with its raw text preserved
    * for replay; a parsed line yields the typed row. The reference's
    * `read_json_auto(columns=…)` + TRY_CAST (streaming_ingest.py:62-107)
    * silently NULLs what it cannot read — this is the stricter engine
    * form, in BOTH directions (a deliberate §2.12-style deviation, not
    * parity): `from_json` PERMISSIVE sets `_corrupt_record` on a
    * type-mismatched field of otherwise-valid JSON too, so such a row
    * QUARANTINES with its raw text rather than passing with that field
    * nulled as the reference's TRY_CAST would; and undecodable lines
    * are kept, not dropped. At 100 TB, a producer bug — whether it
    * malforms the framing or the field types of 0.1% of lines — is a
    * replayable quarantine partition, not silent data loss. (If
    * reference TRY_CAST parity is ever wanted: parse all-string, then
    * per-field `try_cast`.) Pinned by StreamingSpec's quarantine cases.
    *
    * Built on `from_json` over a TEXT frame rather than the JSON
    * source's PERMISSIVE corrupt-record column: identical semantics for
    * batch `spark.read.text` and `spark.readStream.text` inputs (the
    * corrupt-column form cannot be filtered without caching the batch —
    * impossible in a stream), and the parse stays a narrow codegen'd
    * projection. */
  def jsonWithQuarantine(raw: DataFrame, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = raw.select(col("value"),
      from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    val good = parsed
      .filter(col("r").isNotNull && col("r._corrupt_record").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
    val quarantine = parsed
      .filter(col("r").isNull || col("r._corrupt_record").isNotNull)
      .select(col("value").as("raw_record"))
    (good, quarantine)
  }

  /** Continuous micro-batch ingest: JSON-lines dir → partitioned parquet.
    * Exactly-once per file via the checkpoint's file-source log. */
  def stream(inputDir: String, schema: StructType, outDir: String,
             checkpointDir: String, sourceSystem: String,
             maxFilesPerTrigger: Int = 16,
             trigger: Trigger = Trigger.ProcessingTime("1 second"),
             arrivalFrom: Option[String] = None)
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
        shape(batch, sourceSystem, batchId, arrivalFrom)
          .write.mode("append").partitionBy("ingest_date", "batch_id")
          .parquet(outDir)
        ()
      }
      .start()

  /** Backfill/drain mode: process everything pending, then stop —
    * Trigger.AvailableNow (the reference's `--mode backfill`,
    * ingestion/streaming_ingest.py:180-194). Returns the per-batch
    * progress rows (batch_id, rows) the reference's backfill_progress
    * helper surfaces. */
  def backfill(inputDir: String, schema: StructType, outDir: String,
               checkpointDir: String, sourceSystem: String,
               maxFilesPerTrigger: Int = 16,
               arrivalFrom: Option[String] = None): Seq[BatchProgress] = {
    val rec = new ProgressRecorder
    spark.streams.addListener(rec)
    try {
      val q = stream(inputDir, schema, outDir, checkpointDir, sourceSystem,
        maxFilesPerTrigger, trigger = Trigger.AvailableNow(),
        arrivalFrom = arrivalFrom)
      q.awaitTermination()
      rec.awaitTerminated(q.id)
      rec.batchesFor(q.id)
    } finally spark.streams.removeListener(rec)
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

  /** Continuous streaming MERGE: each micro-batch is keyed-deduped and
    * delete+insert-upserted into a partitioned parquet target via
    * foreachBatch — the continuous twin of MedallionPipeline.runSilver's
    * drain-then-batch phase. End-to-end effectively-once without a
    * transactional table format: the checkpoint guarantees at-least-once
    * batch delivery, and the keyed delete+insert is idempotent, so a
    * replayed batch merges to the same state. At scale each merge touches
    * only the partitions the batch's keys live in (Incremental's static
    * pruning), so steady-state cost tracks batch size, not table size. */
  def streamUpsert(inputDir: String, schema: StructType, targetPath: String,
                   checkpointDir: String, keys: Seq[String],
                   orderCol: String, partCol: String,
                   trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val inc = new graft.operators.Incremental(spark)
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = graft.operators.Dedup.keepLatest(
          batch, keys, col(orderCol), Nil)
        inc.upsertPartitioned(targetPath, deduped, keys, partCol)
        ()
      }
      .start()
  }

  /** `streamUpsert` addressed by CATALOG TABLE NAME: each micro-batch
    * dedups and upserts into a metastore-registered table via
    * CatalogIncremental — location resolved from the catalog, the same
    * single-writer lock and idempotent delete+insert, and the catalog
    * re-synced per batch so `spark.table(name)` readers always see the
    * latest committed state. The streaming half of the metastore
    * surface: a warehouse consumer never handles a path. */
  def streamUpsertCatalog(inputDir: String, schema: StructType,
                          table: String, checkpointDir: String,
                          keys: Seq[String], orderCol: String,
                          partCol: String,
                          trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val cinc = new graft.operators.CatalogIncremental(spark)
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = graft.operators.Dedup.keepLatest(
          batch, keys, col(orderCol), Nil)
        cinc.upsertPartitioned(table, deduped, keys, partCol)
        ()
      }
      .start()
  }

  /** Continuous corpus ingest with CROSS-RUN dedup: each micro-batch is
    * filtered against everything already accepted — first through a bloom
    * sketch of the historical keys (codegen'd probe, no false negatives),
    * then an exact anti-join for the might-contain sliver — and only
    * genuinely-new rows append (BloomDedup.filterNew inside foreachBatch,
    * plus a within-batch keep-first; the streaming twin of d01/d08's
    * batch dedup). At 100 TB the sketch is the point: steady-state cost
    * per batch is one bloom build over the history's KEY COLUMN (or, in
    * a real deployment, an incrementally-maintained sketch) plus a
    * batch-sized probe — the corpus body is never rejoined. Idempotent:
    * a replayed batch's rows are all duplicates and append nothing. */
  def streamCorpusAppend(inputDir: String, schema: StructType,
                         targetPath: String, checkpointDir: String,
                         key: String, expectedItems: Long,
                         trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val inBatch = graft.operators.Dedup.keepFirst(
          batch, Seq(key), col(key), Nil)
        val toAppend =
          if (!java.nio.file.Files.exists(java.nio.file.Paths.get(targetPath)))
            inBatch
          else graft.operators.BloomDedup.filterNew(
            inBatch, spark.read.parquet(targetPath), key, expectedItems)
        if (!toAppend.isEmpty)
          toAppend.write.mode("append").parquet(targetPath)
        ()
      }
      .start()

  /** Continuous incremental rollup: each micro-batch folds into a
    * MaterializedAgg target (per-key counts + exact decimal sums) —
    * a streaming materialized view kept fresh by ADDITION, so per-batch
    * cost is the batch's partial aggregate plus a key-wise merge,
    * independent of how much history the rollup summarizes. Exact
    * decimal addition is associative, so ANY micro-batch slicing of the
    * input converges to the batch recompute (the spec pins this). */
  def streamRollup(inputDir: String, schema: StructType,
                   targetPath: String, checkpointDir: String,
                   keys: Seq[String], sumCols: Seq[String],
                   trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val magg = new graft.operators.MaterializedAgg(
      spark, targetPath, keys, sumCols)
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        magg.refresh(batch); ()
      }
      .start()
  }

  /** Continuous DISTINCT-COUNT rollup: each micro-batch folds into a
    * SketchDistinct target — per-key mergeable HLL sketches united per
    * batch, so "distinct users per key" stays fresh at batch-sized cost
    * and the raw stream never needs retention for the rollup's sake.
    * streamRollup's twin for the non-distributive aggregate. The sketch
    * union is IDEMPOTENT, so a replayed batch cannot inflate the
    * distinct estimates (n_rows, like streamRollup's counts, stays
    * at-least-once — pair with upstream dedup where exact row counts
    * matter). */
  def streamDistinctRollup(inputDir: String, schema: StructType,
                           targetPath: String, checkpointDir: String,
                           keys: Seq[String], distinctCol: String,
                           trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val skd = new graft.operators.SketchDistinct(
      spark, targetPath, keys, distinctCol)
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        skd.refresh(batch); ()
      }
      .start()
  }

  /** Dedup for at-least-once sources whose duplicates carry DIFFERENT
    * event times (producer retries re-stamp the clock — the case
    * `dropDuplicates(key, ts)` silently misses). State is keyed on `key`
    * alone; `dropDuplicatesWithinWatermark` ages each key out once the
    * watermark passes its first-seen time + delay, so state stays bounded
    * without requiring exact-timestamp duplicates. */
  def dedupWithinWatermark(df: DataFrame, key: String, eventTime: String,
                           lateness: String): DataFrame =
    df.withWatermark(eventTime, lateness)
      .dropDuplicatesWithinWatermark(key)

  /** Stream-STATIC enrichment: join a stream against a broadcast
    * dimension — each micro-batch probes the broadcast hash map-side,
    * so the stream never shuffles and no join state accumulates (the
    * dim is re-resolved per micro-batch, so a periodically rewritten
    * dim parquet is picked up without restarting the query). The third
    * member of the join family next to batch q03 and the stream-stream
    * interval join below; at 100 TB this is how every streaming fact
    * picks up its dimensions. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream-stream interval join: each event enriched with the matching
    * order the same user placed within `lookback` BEFORE the event — the
    * streaming twin of the batch as-of join (q28), as enrichment rather
    * than carry-forward.
    *
    * Both inputs carry watermarks and the join predicate bounds the
    * event-time distance; Spark derives state-eviction watermarks for
    * BOTH buffers from that range, so state is purged as event time
    * advances. An unbounded equi-join of two streams would buffer
    * forever — the range condition is what makes this runnable on an
    * infinite stream (and it shuffles both sides on the user key only,
    * the same co-partitioning a batch join would use). */
  def enrichStream(events: DataFrame, orders: DataFrame,
                   eventUser: String, orderUser: String,
                   eventTs: String, orderTs: String,
                   lateness: String, lookback: String): DataFrame =
    intervalJoin(events, orders, eventUser, orderUser, eventTs, orderTs,
      lateness, lookback, "inner")

  /** LEFT OUTER stream-stream interval join: like `enrichStream`, but an
    * event with NO matching order still emits — with null order columns —
    * once the order-side watermark proves no future match can arrive
    * (watermark > event_time, the end of the interval). The outer
    * variant is what attribution pipelines actually run: "every view,
    * with its purchase if one happened" must not drop the unconverted
    * views. Same bounded state as the inner form; the null rows are
    * emitted on watermark advance, so a drained backfill flushes them
    * only when a later batch moves event time forward. */
  def enrichStreamLeftOuter(events: DataFrame, orders: DataFrame,
                            eventUser: String, orderUser: String,
                            eventTs: String, orderTs: String,
                            lateness: String, lookback: String): DataFrame =
    intervalJoin(events, orders, eventUser, orderUser, eventTs, orderTs,
      lateness, lookback, "leftOuter")

  private def intervalJoin(events: DataFrame, orders: DataFrame,
                           eventUser: String, orderUser: String,
                           eventTs: String, orderTs: String,
                           lateness: String, lookback: String,
                           joinType: String): DataFrame = {
    val e = events.withWatermark(eventTs, lateness)
    val o = orders.withWatermark(orderTs, lateness)
    e.join(o, expr(
      s"$eventUser = $orderUser AND " +
        s"$orderTs BETWEEN $eventTs - INTERVAL $lookback AND $eventTs"),
      joinType)
  }

  /** Sliding (hopping) event-time windows — the streaming twin of the
    * batch catalog's q41: identical `window(ts, width, slide)` construct,
    * so a live rollup and its batch backfill land in the SAME epoch-
    * aligned buckets (each event in width/slide of them). Watermark
    * bounds state: a window's state is dropped once the watermark passes
    * its end. */
  def slidingRollup(events: DataFrame, tsCol: String, width: String,
                    slide: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("n_events"))

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
