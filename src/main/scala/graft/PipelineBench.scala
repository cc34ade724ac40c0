package graft

import graft.datagen.Generator
import graft.etl.ReferencePipeline
import graft.operators.BronzeAppend
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.Instant

/** Reference-shaped END-TO-END pipeline benchmark (BASELINE.md's
  * self-imposed gate): the full dataflow of
  * `orchestration/run_pipeline.sh:19-23` — generator+ingestion, bronze,
  * "dbt" (the 16-model staging/marts DAG plus its complete schema.yml
  * test corpus) — on a default 24 h-sim dataset at `local[8]` (the
  * reference's 8 dbt threads, dbt_project/profiles.yml:7), with the same
  * phase-elapsed logging shape as `run_pipeline.sh:25-32`.
  *
  * This measures PIPELINE COMPOSITION — lock acquisition, atomic swaps,
  * watermark reads, partition-pruned upserts, and the 123-check quality
  * gate chained across 20+ materializations — which the per-operator
  * catalog bench (graft.Bench) cannot see.
  *
  * Dataset scale: the reference's default 24 h run advances sim-time 60 s
  * per batch (producer :386, TIME_MULTIPLIER=60 → 60 batches/sim-hour)
  * drawing `sessions_per_batch` from a diurnal curve with scaler=40
  * (producer :316-325: 80-200 night, 200-600 morning, 600-1200 afternoon,
  * 400-800 evening) — a diurnal mean of ~510 sessions/batch, i.e. ~30k
  * sessions/sim-hour, ~700k sessions / ~3M events / ~250k orders per day.
  * SPARK_GRAFT_PIPE_SESSIONS (default 30000) reproduces that volume
  * through the seeded generator's flat hourly rate.
  *
  * Phases:
  *   1. generate  — seeded 24 h simulation → raw JSON-lines, one file per
  *                  sim-hour per topic (producer append shape)
  *   2. ingest    — AvailableNow backfill raw → landing parquet
  *                  (declared schemas, lineage columns, quarantine path)
  *   3. bronze    — batch_id-idempotent append landing → bronze
  *   4. dbt       — ReferencePipeline.run: 4 staging + 4 fact + 4 dim +
  *                  4 metrics models with per-model incremental
  *                  materializations, gated by the full SchemaTests corpus
  *
  * Output: phase log to stderr; ONE JSON line to stdout with per-phase
  * seconds, row counts, and the check count. Recorded in PLANS.md.
  */
object PipelineBench {

  def main(args: Array[String]): Unit = {
    val hours = sys.env.getOrElse("SPARK_GRAFT_PIPE_HOURS", "24").toInt
    val sessions =
      sys.env.getOrElse("SPARK_GRAFT_PIPE_SESSIONS", "30000").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_PIPE_DIR",
      java.nio.file.Files.createTempDirectory("graft_pipe").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // SPARK_GRAFT_PIPE_ARRIVAL=simulated derives pipeline_ingested_at
    // from each record's sim ingest_time instead of the backfill's wall
    // clock — the REAL arrival spread a continuously-running pipeline
    // sees (the default "wallclock" compresses 24 sim-hours of arrivals
    // into one instant, making every 1 h sliver window span the whole
    // corpus — a bench artifact, not a production regime).
    val arrivalMode =
      sys.env.getOrElse("SPARK_GRAFT_PIPE_ARRIVAL", "wallclock")
    // loud refusal (the CommitStore.resolve convention): a typo like
    // 'simulate' must not silently record a wallclock run whose JSON
    // labels look intentional
    if (arrivalMode != "wallclock" && arrivalMode != "simulated")
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_PIPE_ARRIVAL='$arrivalMode' is not a known arrival " +
          "regime — valid values: wallclock, simulated")
    val arrivalFrom =
      if (arrivalMode == "simulated") Some("ingest_time") else None
    // SPARK_GRAFT_PIPE_SLIVER=0 disables sliver narrowing + window
    // signatures (full-overlap windows) — isolates the sliver
    // machinery's bookkeeping cost in day-1 attribution runs
    val sliverOn =
      sys.env.getOrElse("SPARK_GRAFT_PIPE_SLIVER", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.err.println("🚀 Starting orchestration pipeline...")
    System.err.println(s"⏱️  Simulation hours: $hours" +
      s" (~$sessions sessions/hour) → $base")
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

    // ── phase 1: generator (producer shape: per-hour JSONL appends) ──
    val rawClicks = s"$base/raw/clickstream"
    val rawOrders = s"$base/raw/orders"
    val (nEvents, nOrders) = phase("generator_ingestion_gen") {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rawClicks))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rawOrders))
      val gen = new Generator(seed = 894L)
      var ne = 0L; var no = 0L
      // within-hour session spacing: the reference's sim clock advances
      // THROUGH the hour, so an hour's sessions start inside that hour
      gen.simulateEach(Instant.parse("2024-06-01T00:00:00Z"), hours,
          sessions, sessionSpacingSec = 3600.0 / sessions) { (h, evs, ords) =>
        def writeLines(path: String, lines: Iterator[String]): Unit = {
          val w = java.nio.file.Files.newBufferedWriter(
            java.nio.file.Paths.get(path))
          try lines.foreach { l => w.write(l); w.write('\n') }
          finally w.close()
        }
        writeLines(f"$rawClicks/clickstream_$h%02d.jsonl",
          evs.iterator.map(gen.eventJson))
        writeLines(f"$rawOrders/orders_$h%02d.jsonl",
          ords.iterator.map(gen.orderJson))
        ne += evs.size; no += ords.size
      }
      System.err.println(s"   generated $ne events, $no orders")
      (ne, no)
    }

    // ── phase 2: streaming backfill raw → landing (declared schemas) ──
    val eventSchema = StructType(Seq(
      StructField("event_id", StringType), StructField("event_type", StringType),
      StructField("version", StringType), StructField("user_id", StringType),
      StructField("session_id", StringType),
      StructField("product_id", StringType),
      StructField("event_time", TimestampType),
      StructField("ingest_time", TimestampType),
      StructField("device", StringType), StructField("country", StringType),
      StructField("user_agent", StringType),
      StructField("referrer", StringType),
      StructField("experiment_id", StringType)))
    val orderSchema = StructType(Seq(
      StructField("order_id", StringType),
      StructField("session_id", StringType),
      StructField("user_id", StringType),
      StructField("items", ArrayType(StructType(Seq(
        StructField("product_id", StringType),
        StructField("quantity", IntegerType),
        StructField("price", DoubleType))))),
      StructField("order_status", StringType),
      StructField("order_time", TimestampType),
      StructField("ingest_time", TimestampType)))
    val landClicks = s"$base/landing/clickstream"
    val landOrders = s"$base/landing/orders"
    phase("generator_ingestion_backfill") {
      val ingest = new StreamingIngest(spark)
      ingest.backfill(rawClicks, eventSchema, landClicks,
        s"$base/checkpoint/clickstream", "clickstream",
        arrivalFrom = arrivalFrom)
      ingest.backfill(rawOrders, orderSchema, landOrders,
        s"$base/checkpoint/orders", "orders", arrivalFrom = arrivalFrom)
    }

    // ── phase 3: bronze (batch_id-idempotent append) ──
    def landing(path: String, schema: StructType) = spark.read
      .schema(schema.add("pipeline_ingested_at", TimestampType)
        .add("source_system", StringType)
        .add("ingest_date", StringType).add("batch_id", LongType))
      .parquet(path)
    val bronzeClicks = s"$base/bronze/clickstream"
    val bronzeOrders = s"$base/bronze/orders"
    phase("bronze") {
      val bronze = new BronzeAppend(spark)
      bronze.appendNewPartitions(landing(landClicks, eventSchema),
        bronzeClicks, "batch_id")
      bronze.appendNewPartitions(landing(landOrders, orderSchema),
        bronzeOrders, "batch_id")
    }

    // ── phase 4: "dbt run && dbt test" — 16 models + full check corpus ──
    val pipe = new ReferencePipeline(spark, s"$base/warehouse",
      sliver = sliverOn)
    val checks = phase("dbt") {
      pipe.run(
        spark.read.parquet(bronzeClicks),
        spark.read.parquet(bronzeOrders))
    }

    // ── day-2: INCREMENTAL pass — the reference's steady-state regime ──
    // Append `incHours` more sim-hours and re-run every layer: the
    // streaming checkpoint admits only the new raw files, bronze only the
    // new batch_ids, the staging/fact upserts only their lookback-window
    // sliver (fact_events rewrites only the touched event_date
    // partitions). Dims/metrics recompute fully — they are `table`
    // materializations in the reference (dbt_project.yml:42-51), so the
    // honest incremental number includes them.
    val incHours = sys.env.getOrElse("SPARK_GRAFT_PIPE_INC_HOURS", "2").toInt
    if (incHours > 0) {
      val (incEv, incOrd) = phase("incremental_gen") {
        // the generator's rng is consumed hour by hour, so a longer run
        // is the same data plus new hours (ReferenceFixtures prefix
        // property): replay and keep only the new tail
        val gen = new Generator(seed = 894L)
        var ne = 0L; var no = 0L
        gen.simulateEach(Instant.parse("2024-06-01T00:00:00Z"),
            hours + incHours, sessions,
            sessionSpacingSec = 3600.0 / sessions) { (h, evs, ords) =>
          if (h >= hours) {
            def writeLines(path: String, lines: Iterator[String]): Unit = {
              val w = java.nio.file.Files.newBufferedWriter(
                java.nio.file.Paths.get(path))
              try lines.foreach { l => w.write(l); w.write('\n') }
              finally w.close()
            }
            writeLines(f"$rawClicks/clickstream_$h%02d.jsonl",
              evs.iterator.map(gen.eventJson))
            writeLines(f"$rawOrders/orders_$h%02d.jsonl",
              ords.iterator.map(gen.orderJson))
            ne += evs.size; no += ords.size
          }
        }
        System.err.println(s"   appended $ne events, $no orders")
        (ne, no)
      }
      phase("incremental_ingest") {
        val ingest = new StreamingIngest(spark)
        ingest.backfill(rawClicks, eventSchema, landClicks,
          s"$base/checkpoint/clickstream", "clickstream",
          arrivalFrom = arrivalFrom)
        ingest.backfill(rawOrders, orderSchema, landOrders,
          s"$base/checkpoint/orders", "orders", arrivalFrom = arrivalFrom)
      }
      phase("incremental_bronze") {
        val bronze = new BronzeAppend(spark)
        bronze.appendNewPartitions(landing(landClicks, eventSchema),
          bronzeClicks, "batch_id")
        bronze.appendNewPartitions(landing(landOrders, orderSchema),
          bronzeOrders, "batch_id")
      }
      val incChecks = phase("incremental_dbt") {
        pipe.run(
          spark.read.parquet(bronzeClicks),
          spark.read.parquet(bronzeOrders))
      }
      System.err.println(s"   incremental pass: ${incChecks.size} checks," +
        s" +$incEv events, +$incOrd orders")

      // ── day-3: NO-NEW-DATA pass — the change-gated floor ──
      // Nothing new arrived: slivers are empty, every staging/fact
      // upsert's no-op detection reports unchanged, and the
      // change-gated dims/metrics skip their rebuilds — so this pass
      // should cost ≈ the check corpus alone (the reference's `dbt
      // test` floor), proving steady-state cost tracks actual change,
      // not table count.
      val day3Checks = phase("day3_dbt_no_new_data") {
        pipe.run(
          spark.read.parquet(bronzeClicks),
          spark.read.parquet(bronzeOrders))
      }
      System.err.println(s"   day-3 (no new data): ${day3Checks.size}" +
        " checks, all models change-gated")
    }

    val elapsed = (System.nanoTime() - t0) / 1e9
    val mins = (elapsed / 60).toInt; val secs = (elapsed % 60).toInt
    System.err.println("🎉 Orchestration pipeline completed successfully!")
    System.err.println(
      f"⏱️ Total runtime: ${elapsed}%.0fs (${mins}m ${secs}s)")
    def r1(v: Double) = math.rint(v * 10) / 10
    val phasesJson = phases.map { case (n, s) => "\"" + n + "\":" + r1(s) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"pipeline_e2e","value":${r1(elapsed)},""" +
      s""""unit":"sec","phases":$phasesJson,"hours":$hours,""" +
      s""""sessions_per_hour":$sessions,"events":$nEvents,""" +
      s""""orders":$nOrders,"checks_passed":${checks.size},""" +
      s""""arrival":"$arrivalMode","sliver":$sliverOn}""")
    spark.stop()
  }
}
