package graft

import graft.operators.{ChangeFeed, CommitStore,
  PartitionedSnapshots => PS}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** METADATA-PATH scale harness (round-12 asks #3/#4): where
  * [[ScaleBench]] proves the DATA path over three decades, this
  * measures the two metadata growth axes a 100 TB deployment hits:
  *
  *  1. LIVE-PARTITION count (default 1k/10k/100k): per-plan manifest
  *     read + file-listing/footer-merge cost, single-partition commit
  *     latency (manifest parse + rewrite dominates at high counts),
  *     `history`, manifest-diff CDC, and `vacuum` wall — the O(N)
  *     surfaces Iceberg shards manifests for.
  *  2. VERSION depth on the streaming lineage (default 40/400 epochs):
  *     the full source→transform→sink chain drained with
  *     `maxVersionsPerBatch=1` under `Trigger.AvailableNow` —
  *     epochs/s across a decade of backlog (per-epoch cost must stay
  *     FLAT: the sink's exactly-once replay check is
  *     `Txns.lastEpoch`'s incremental scan cache — amortized O(new
  *     versions) meta reads per steady-state epoch), plus
  *     checkpoint-recovery wall at the deep version count (restart +
  *     one more epoch).
  *
  * Prints ONE JSON line; results land in SCALE.md's metadata section.
  * Run:
  * {{{
  * SPARK_GRAFT_META_DIR=/tmp/graft_meta /opt/spark/bin/spark-submit
  *   --master local[32] --driver-memory 16g
  *   --driver-java-options -XX:ReservedCodeCacheSize=1g
  *   --class graft.MetaScaleBench <jar>
  * }}}
  * Knobs: SPARK_GRAFT_META_MODE=partitions|stream|both,
  * SPARK_GRAFT_META_PARTS=1000,10000,100000,
  * SPARK_GRAFT_META_EPOCHS=40,400. Corpora are generated once per
  * point and reused across runs (a `_gen_ok` marker gates reuse). */
object MetaScaleBench {

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def r2(v: Double): Double = math.rint(v * 100) / 100

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_META_DIR",
      "/tmp/graft_meta")
    val mode = sys.env.getOrElse("SPARK_GRAFT_META_MODE", "both")
    require(Set("partitions", "stream", "both")(mode),
      s"SPARK_GRAFT_META_MODE must be partitions|stream|both, got $mode")
    val partCounts = sys.env.getOrElse("SPARK_GRAFT_META_PARTS",
      "1000,10000,100000").split(",").map(_.trim.toInt).toSeq
    val epochCounts = sys.env.getOrElse("SPARK_GRAFT_META_EPOCHS",
      "40,400").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val store = CommitStore.local

    // ── 1. live-partition decades ──────────────────────────────────
    val partsJson =
      if (mode == "stream") ""
      else partCounts.map { p =>
        val root = s"$base/parts_$p"
        val t = s"$root/t"
        val marker = s"$root/_gen_ok"
        var bulk = -1.0
        if (!store.exists(marker)) {
          store.deleteRecursively(root)
          // one row per partition: partition COUNT is the variable
          // under test, row volume stays trivial so every measured
          // wall is metadata, not data
          val df = spark.range(p.toLong).select(
            col("id").as("k"),
            format_string("p%07d", col("id")).as("d"),
            lit("x").as("v"))
          bulk = timed(PS.write(spark, t, df, "d"))._1
          store.write(marker, Array.emptyByteArray)
          System.err.println(f"[meta] parts=$p bulk_write=$bulk%.1fs")
        }
        def cur = PS.currentVersion(t, store).get
        // one-time plan-from-metadata backfill for a corpus generated
        // before the file-manifest feature (idempotent — ~0 on an
        // already-indexed corpus): the migration cost a real table
        // pays ONCE, against the per-plan cost it removes forever
        val backfillS = timed(PS.indexPlanMeta(spark, t, store))._1
        val manifestRead = (1 to 3).map(_ =>
          timed(PS.manifest(t, cur, store).size)._1).min
        // single-partition upsert: the typical streaming-epoch commit;
        // its latency at high partition counts is dominated by the
        // manifest parse + rewrite (the data write is one tiny file)
        val commit1p = (1 to 3).map { i =>
          timed(PS.upsert(spark, t,
            Seq((i.toLong, f"p$i%07d", "y")).toDF("k", "d", "v"),
            Seq("k"), "d", store = store))._1
        }.min
        // per-plan cost: DataFrame construction over the manifest's
        // owner dirs — includes Spark's file listing + mergeSchema
        // footer reconciliation, the real price of planning a read at
        // this partition count
        val planS = timed(PS.read(spark, t, store).schema)._1
        // SELECTIVE read (round-14): a point predicate over the
        // partition column must plan O(predicate) files, not
        // O(table) — GraftFileIndex.listFiles prunes from the
        // recorded partition values, so both the planned-file count
        // and the end-to-end wall stay flat across partition decades
        // (without it, execution schedules one footer read per live
        // partition and pays at run time the listing cost the
        // metadata path removed from planning)
        val sel = PS.read(spark, t, store)
          .filter(col("d") === "p0000003")
        val selS = (1 to 3).map(_ => timed(sel.count())._1).min
        // execute sel's OWN plan once so its scan metric fills (the
        // timed count() above plans separately), then read the
        // planned-file count — the O(predicate) proof
        val selRows = sel.collect().length
        val selFiles = sel.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.headOption.getOrElse(-1L)
        require(selRows >= 1, s"selective probe lost its row: $selRows")
        // DATA-COLUMN skipping (round-15 stats-at-write): declare k,
        // backfill once (the pay-once migration, measured — footer
        // reads of every live file), then a point predicate over a
        // NON-partition column must plan O(predicate) files from the
        // commit-recorded min/max, flat across partition decades
        val statsBackfillS = timed {
          PS.setStatsColumns(t, Seq("k"), store)
          PS.backfillStats(spark, t, store)
        }._1
        val selK = PS.read(spark, t, store).filter(col("k") === 7L)
        val selKS = (1 to 3).map(_ => timed(selK.count())._1).min
        val selKRows = selK.collect().length
        val selKFiles = selK.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.headOption.getOrElse(-1L)
        require(selKRows >= 1,
          s"data-column probe lost its row: $selKRows")
        val historyS = timed(PS.history(t, store).size)._1
        val v0 = cur
        PS.upsert(spark, t, Seq((0L, "p0000000", "z"))
          .toDF("k", "d", "v"), Seq("k"), "d", store = store)
        val changesS = timed(
          PS.changes(spark, t, v0, cur, Seq("k"), store).count())._1
        val vacuumS = timed(PS.vacuum(t, keep = 1, store))._1
        val manifestBytes = store
          .read(f"$t/_snapshots/v$cur%05d/manifest")
          .map(_.length).getOrElse(0)
        // ── SPJ wall-clock (round-16 stretch): a co-partitioned
        // self-join + partition-column aggregate, with and without
        // preserve-data-grouping — the measured twin of
        // StoragePartitionedJoinSpec's plan pin. Exchange counts
        // prove WHICH plan ran; the wall shows the trade. Skipped at
        // 100k: one task PER partition value over 1-row partitions is
        // pure task overhead — exactly the split-packing trade the
        // session gate exists for (SPJ pays off when per-partition
        // data is large, not when partitions are many and tiny).
        def spjShuffles(
            plan: org.apache.spark.sql.execution.SparkPlan): Int = {
          val self = plan match {
            case _: org.apache.spark.sql.execution.exchange
                .ShuffleExchangeLike => 1
            case _ => 0
          }
          val kids = plan match {
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive
                .QueryStageExec => Seq(q.plan)
            case other => other.children
          }
          self + kids.map(spjShuffles).sum
        }
        val (spjOnS, spjOnX, spjOffS, spjOffX) =
          if (p > 10000) (-1.0, -1, -1.0, -1)
          else {
            def joinDf() = PS.read(spark, t, store).as("a")
              .join(PS.read(spark, t, store).as("b"), "d")
              .groupBy("d").count()
            def measure(): (Double, Int) = {
              val w = (1 to 2).map(_ => timed(joinDf().count())._1).min
              val df = joinDf(); df.count()
              (w, spjShuffles(df.queryExecution.executedPlan))
            }
            val prevT = spark.conf.get(
              "spark.sql.autoBroadcastJoinThreshold")
            try {
              spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "-1")
              val (offS, offX) = measure()
              spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
                "true")
              spark.conf.set("spark.sql.sources.v2.bucketing" +
                ".pushPartValues.enabled", "true")
              spark.conf.set(graft.plans.StatParquetScan
                .PreserveGroupingKey, "true")
              val (onS, onX) = measure()
              (onS, onX, offS, offX)
            } finally {
              spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", prevT)
              spark.conf.unset(
                graft.plans.StatParquetScan.PreserveGroupingKey)
            }
          }
        System.err.println(f"[meta] parts=$p manifest=$manifestRead%.3fs" +
          f" backfill=$backfillS%.2fs" +
          f" commit1p=$commit1p%.2fs plan=$planS%.2fs" +
          f" select1p=$selS%.2fs/${selFiles}f" +
          f" statsbf=$statsBackfillS%.2fs" +
          f" selectk=$selKS%.2fs/${selKFiles}f" +
          f" history=$historyS%.2fs changes=$changesS%.2fs" +
          f" vacuum=$vacuumS%.2fs bytes=$manifestBytes" +
          f" spj=$spjOnS%.2fs/${spjOnX}x-vs-$spjOffS%.2fs/${spjOffX}x")
        s""""p$p":{"bulk_write_s":${r2(bulk)},""" +
          s""""manifest_read_s":${r2(manifestRead)},""" +
          s""""index_backfill_s":${r2(backfillS)},""" +
          s""""commit_1part_s":${r2(commit1p)},""" +
          s""""select_1part_s":${r2(selS)},""" +
          s""""select_1part_files":$selFiles,""" +
          s""""stats_backfill_s":${r2(statsBackfillS)},""" +
          s""""select_datacol_s":${r2(selKS)},""" +
          s""""select_datacol_files":$selKFiles,""" +
          s""""plan_s":${r2(planS)},"history_s":${r2(historyS)},""" +
          s""""changes_s":${r2(changesS)},"vacuum_s":${r2(vacuumS)},""" +
          s""""spj_join_on_s":${r2(spjOnS)},""" +
          s""""spj_join_on_shuffles":$spjOnX,""" +
          s""""spj_join_off_s":${r2(spjOffS)},""" +
          s""""spj_join_off_shuffles":$spjOffX,""" +
          s""""manifest_bytes":$manifestBytes}"""
      }.mkString("\"partitions\":{", ",", "}")

    // ── 2. streaming-lineage version decades ───────────────────────
    // Everything is per-run: the BACKLOG must be committed AFTER the
    // stream's checkpoint exists (a fresh stream bootstraps the
    // CURRENT snapshot in one batch and would swallow a pre-built
    // backlog), so the source is rebuilt each run and the timed drain
    // replays exactly `e` single-version epochs.
    val streamJson =
      if (mode == "partitions") ""
      else epochCounts.map { e =>
        val runId = System.currentTimeMillis()
        val root = s"$base/stream_${e}_$runId"
        val srcT = s"$root/src"
        PS.write(spark, srcT, Seq((0L, "P0", "v0"))
          .toDF("k", "d", "v"), "d", store)
        // the sink is the DSv2 toTable path — every epoch commits a
        // version WITH its txn marker and runs the exactly-once
        // replay check against the sink's growing version count
        val catName = s"msnap${e}_$runId"
        spark.conf.set(s"spark.sql.catalog.$catName",
          "graft.plans.SnapshotSqlCatalog")
        spark.conf.set(s"spark.sql.catalog.$catName.root", root)
        spark.sql(s"CREATE TABLE $catName.dst (k BIGINT, d STRING, " +
          "v_up STRING) PARTITIONED BY (d)")
        PS.upsert(spark, s"$root/dst",
          Seq.empty[(Long, String, String)].toDF("k", "d", "v_up"),
          Seq("k"), "d", store = store)
        val cp = s"$root/_cp"
        def drainOnce(label: String): Double = {
          val (dt, _) = timed {
            val q = ChangeFeed.readStream(spark, srcT,
                maxVersionsPerBatch = Some(1L))
              .filter(col("change_type") =!= "delete")
              .select(col("k"), col("d"), upper(col("v")).as("v_up"))
              .writeStream.option("checkpointLocation", cp)
              .trigger(org.apache.spark.sql.streaming.Trigger
                .AvailableNow())
              .toTable(s"$catName.dst")
            assert(q.awaitTermination(30 * 60 * 1000),
              s"$label of $e epochs did not finish")
          }
          dt
        }
        val bootstrapS = drainOnce("bootstrap") // 1-batch snapshot
        // the version backlog lands AFTER the checkpoint exists…
        val (setupS, _) = timed {
          (1 to e).foreach { i =>
            PS.upsert(spark, srcT,
              Seq((i.toLong % 64, s"P${i % 8}", s"v$i"))
                .toDF("k", "d", "v"), Seq("k"), "d", store = store)
          }
        }
        // …and the timed drain replays it as e single-version epochs
        val drainS = drainOnce("drain")
        val epochsPerS = e / drainS
        // checkpoint recovery at the DEEP version count: restart the
        // checkpointed query over one more source commit — the wall
        // includes offset-log replay + the replay check against ~e
        // sink versions + one applied epoch
        PS.upsert(spark, srcT, Seq((999L, "P0", "late"))
          .toDF("k", "d", "v"), Seq("k"), "d", store = store)
        val recoveryS = drainOnce("recovery")
        val dstVersions = PS.versions(s"$root/dst", store).size
        System.err.println(f"[meta] epochs=$e boot=$bootstrapS%.1fs " +
          f"setup=$setupS%.1fs drain=$drainS%.1fs " +
          f"(${epochsPerS}%.1f eps) recovery=$recoveryS%.1fs " +
          f"dst_versions=$dstVersions")
        s""""e$e":{"bootstrap_s":${r2(bootstrapS)},""" +
          s""""src_commits_s":${r2(setupS)},""" +
          s""""drain_s":${r2(drainS)},""" +
          s""""epochs_per_s":${r2(epochsPerS)},""" +
          s""""recovery_s":${r2(recoveryS)},""" +
          s""""dst_versions":$dstVersions}"""
      }.mkString("\"stream\":{", ",", "}")

    val sections = Seq(partsJson, streamJson).filter(_.nonEmpty)
    println(sections.mkString("{\"metric\":\"meta_scale\",", ",", "}"))
    spark.stop()
  }
}
