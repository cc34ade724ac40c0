package graft.pipeline

import graft.operators.{BronzeAppend, Dedup, Incremental, Quality}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end medallion pipeline: the Spark-native re-expression of the
  * reference's full dataflow (orchestration/run_pipeline.sh:19-23 →
  * generator ‖ ingest ‖ bronze ‖ dbt staging/marts in
  * mattyg3/ecommerce_analytics_platform), composed from the engine's
  * operators:
  *
  *   raw JSON-lines  --backfill(AvailableNow)-->  landing parquet
  *     (ingest_date partitions, lineage cols)          [StreamingIngest]
  *   landing  --partition-idempotent append-->  bronze  [BronzeAppend]
  *   bronze   --1-day lookback + keep-latest dedup + delete+insert-->
  *            silver (partitioned by event_date)  [Incremental + Dedup]
  *   silver   --daily rollup-->  gold_daily_kpis
  *   quality gates after silver and gold (dbt-test semantics, §2.11)
  *
  * Scale notes: every hop is partition-pruned (ingest_date / event_date);
  * the silver upsert reads only the partitions the late-data window can
  * touch; gold is a single hash-agg over the silver slice. Re-running any
  * phase is idempotent (bronze by partition anti-membership, silver by
  * keyed delete+insert).
  */
final class MedallionPipeline(spark: SparkSession, baseDir: String,
    extraEventColumns: Seq[StructField] = Nil) {

  val rawDir = s"$baseDir/raw"
  val landingDir = s"$baseDir/landing"
  val checkpointDir = s"$baseDir/checkpoint"
  val bronzePath = s"$baseDir/bronze/events"
  val silverPath = s"$baseDir/silver/events"
  val goldKpisPath = s"$baseDir/gold/daily_kpis"

  /** Declared event schema — inference is nondeterministic and a full
    * extra pass (SURVEY §1.3). `extraEventColumns` is the evolution hook
    * (`on_schema_change: append_new_columns`, dbt_project.yml:29): when
    * producers move v1 → v2 (linked_clickstream_order_generator.py:162-167
    * adds fields), the pipeline is reconstructed with the new columns
    * appended; raw/landing/bronze files written before the evolution read
    * them as null (schema-on-read), and the silver upsert merges them via
    * Incremental's allowMissingColumns union. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("user_id", StringType),
    StructField("event_time", TimestampType),
    StructField("value", DoubleType)) ++ extraEventColumns)

  /** Lineage columns StreamingIngest stamps onto every landing row. */
  private def withLineage(schema: StructType): StructType = schema
    .add("pipeline_ingested_at", TimestampType)
    .add("source_system", StringType)
    .add("ingest_date", StringType)
    .add("batch_id", LongType)

  private val ingest = new StreamingIngest(spark)
  private val bronze = new BronzeAppend(spark)
  private val incremental = new Incremental(spark)

  /** Phase 1: drain pending raw JSON into the landing zone (exactly once
    * per file via the streaming checkpoint). */
  def runIngest(): Unit =
    ingest.backfill(rawDir, eventSchema, landingDir, checkpointDir, "graft")

  /** Phase 2: typed bronze append, idempotent at batch_id granularity —
    * a micro-batch partition is closed the moment it is written, so
    * re-runs never drop late data the way date-level idempotence would
    * for still-hot dates. */
  def runBronze(): Long = {
    val landing = spark.read.schema(withLineage(eventSchema))
      .parquet(landingDir)
      .withColumn("bronze_ingested_at", current_timestamp())
    bronze.appendNewPartitions(landing, bronzePath, "batch_id")
  }

  /** Phase 3: silver — 1-day sliding window over bronze, keep-latest dedup
    * per event_id, delete+insert upsert partitioned by event_date. */
  def runSilver(): Unit = {
    // declared schema, not footer inference: bronze may hold mixed
    // v1/v2 footers after an evolution — absent columns read as null
    val src = spark.read
      .schema(withLineage(eventSchema).add("bronze_ingested_at", TimestampType))
      .parquet(bronzePath)
      .filter(col("event_time").isNotNull)
      .withColumn("event_date", col("event_time").cast("date").cast("string"))
    val windowed = incremental.lateWindow(src, silverPath, "event_time")
    val deduped = Dedup.keepLatest(windowed, Seq("event_id"),
      col("pipeline_ingested_at"), Seq(col("batch_id")))
    incremental.upsertPartitioned(silverPath, deduped, Seq("event_id"),
      "event_date")
    val silver = this.silver
    Quality.run(Seq(
      "silver_event_id_not_null" -> (() => Quality.notNull(silver, "event_id")),
      "silver_event_id_unique" -> (() => Quality.unique(silver, Seq("event_id"))),
      "silver_value_nonneg" -> (() =>
        Quality.expressionIsTrue(silver, col("value") >= 0))),
      failFast = true)
  }

  /** Phase 4: gold daily KPIs (full recompute — dims/metrics are `table`
    * materializations in the reference, dbt_project.yml:42-51). */
  def runGold(): Unit = {
    val silver = this.silver
    val kpis = silver.groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("dau"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("total_value"))
    kpis.write.mode("overwrite").parquet(goldKpisPath)
    val gold = spark.read.parquet(goldKpisPath)
    Quality.run(Seq(
      "gold_date_unique" -> (() => Quality.unique(gold, Seq("event_date"))),
      "gold_counts_positive" -> (() =>
        Quality.expressionIsTrue(gold, col("n_events") > 0))),
      failFast = true)
  }

  /** Full run: all phases in dependency order (run_pipeline.sh shape). */
  def runAll(): Unit = { runIngest(); runBronze(); runSilver(); runGold() }

  def gold: DataFrame = spark.read.parquet(goldKpisPath)
  // mergeSchema: partitions not touched since an evolution keep v1 footers
  def silver: DataFrame =
    spark.read.option("mergeSchema", "true").parquet(silverPath)
}
