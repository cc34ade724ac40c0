package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Snapshot-versioned tables: MVCC + time travel on plain parquet via a
  * MANIFEST-COMMIT protocol — the second half of the concurrent-safety
  * story next to Incremental's single-writer lock (the reference gets
  * both from DuckDB's transactional single file; a parquet lake has to
  * bring its own).
  *
  * Layout: `<table>/_snapshots/v<NNNNN>/` immutable parquet dirs plus a
  * `<table>/_current` pointer file. A write materializes the FULL new
  * snapshot dir first and only then flips the pointer (tmp file +
  * atomic rename) — so a reader that resolved the pointer an instant
  * earlier keeps reading its immutable snapshot, a reader an instant
  * later sees the complete new one, and NOBODY ever observes torn
  * state, even mid-write (Incremental.atomicOverwrite has a brief
  * window where the target dir is mid-swap; here reads never touch a
  * dir that is being written). A crashed writer leaves an orphan
  * snapshot dir that no pointer references — invisible to readers,
  * reclaimed by `vacuum`, and version numbering (max existing + 1)
  * never collides with it.
  *
  * Writers still serialize through the table's single-writer lock: the
  * pointer flip is atomic, but read-merge-write cycles (upsert) must
  * not interleave or the second writer's merge erases the first's rows.
  *
  * Scale notes: the protocol is pure metadata — one pointer file and
  * one rename per commit, no data copying beyond the new snapshot
  * itself; `readVersion` gives O(1) time travel to any retained
  * snapshot; `vacuum` bounds storage. On an object store, `_current`
  * maps to a conditional-put manifest (the Iceberg/Delta commit
  * pattern — e.g. iceberg TableMetadata pointer swap).
  */
object Snapshots {

  private def snapsDir(table: Path): Path = table.resolve("_snapshots")
  private def pointer(table: Path): Path = table.resolve("_current")
  private def versionDir(table: Path, v: Long): Path =
    snapsDir(table).resolve(f"v$v%05d")

  /** Versions with an existing snapshot dir, ascending (orphans incl.). */
  def versions(tablePath: String): Seq[Long] = {
    val d = snapsDir(Paths.get(tablePath))
    if (!Files.exists(d)) Seq.empty
    else {
      val it = Files.list(d).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("v")) buf += name.drop(1).toLong
      }
      buf.sorted.toSeq
    }
  }

  /** The committed version the pointer references, if any. */
  def currentVersion(tablePath: String): Option[Long] = {
    val p = pointer(Paths.get(tablePath))
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** Commit `df` as the next snapshot: full write, THEN pointer flip. */
  def write(spark: SparkSession, tablePath: String, df: DataFrame): Long = {
    val table = Paths.get(tablePath)
    Incremental.withLock(table) {
      val v = versions(tablePath).lastOption.getOrElse(0L) + 1
      df.write.mode(SaveMode.Overwrite)
        .parquet(versionDir(table, v).toString)
      commitPointer(table, v)
      v
    }
  }

  /** Keyed upsert as a new snapshot (read current → merge → commit);
    * readers of the previous version are unaffected until the flip. */
  def upsert(spark: SparkSession, tablePath: String, updates: DataFrame,
      keys: Seq[String]): Long = {
    val table = Paths.get(tablePath)
    Incremental.withLock(table) {
      val merged = currentVersion(tablePath) match {
        case None => updates
        case Some(cur) =>
          spark.read.option("mergeSchema", "true")
            .parquet(versionDir(table, cur).toString)
            .join(updates.select(keys.map(col): _*).distinct(),
              keys, "left_anti")
            .unionByName(updates, allowMissingColumns = true)
            // materialize before writing: the merge reads the current
            // snapshot, which is immutable, so no read-overwrite hazard —
            // but the plan must not lazily re-resolve after the commit
            .localCheckpoint()
      }
      val v = versions(tablePath).lastOption.getOrElse(0L) + 1
      merged.write.mode(SaveMode.Overwrite)
        .parquet(versionDir(table, v).toString)
      commitPointer(table, v)
      v
    }
  }

  /** Read the current committed snapshot. */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    currentVersion(tablePath) match {
      case Some(v) => readVersion(spark, tablePath, v)
      case None => throw new IllegalStateException(
        s"$tablePath has no committed snapshot")
    }

  /** Time travel: read an exact retained version. */
  def readVersion(spark: SparkSession, tablePath: String,
      v: Long): DataFrame = {
    val dir = versionDir(Paths.get(tablePath), v)
    if (!Files.exists(dir)) throw new IllegalStateException(
      s"$tablePath has no snapshot v$v (vacuumed or never committed)")
    spark.read.parquet(dir.toString)
  }

  /** Drop all snapshots except the newest `keep` committed ones (the
    * current version always survives); orphans from crashed writers —
    * dirs above the pointer — are reclaimed too. */
  def vacuum(tablePath: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, "keep must retain at least the current snapshot")
    val table = Paths.get(tablePath)
    Incremental.withLock(table) {
      val cur = currentVersion(tablePath).getOrElse(
        return Seq.empty) // nothing committed → nothing safe to reason about
      val committed = versions(tablePath).filter(_ <= cur)
      val orphans = versions(tablePath).filter(_ > cur)
      val retained = committed.takeRight(keep).toSet + cur
      val drop = (committed.filterNot(retained) ++ orphans).sorted
      drop.foreach(v => deleteRecursively(versionDir(table, v)))
      drop
    }
  }

  /** Change-data-capture between two retained versions: one row per key
    * whose content changed, tagged insert/update/delete — the
    * `table_changes` complement of time travel, and what an incremental
    * consumer reads instead of diffing full snapshots itself. One
    * key-wise full-outer join between the two immutable snapshot dirs;
    * "update" means any non-key column differs (null-safe struct
    * equality, so null→value and value→null both register). */
  def changes(spark: SparkSession, tablePath: String, fromV: Long,
      toV: Long, keys: Seq[String]): DataFrame = {
    val before = readVersion(spark, tablePath, fromV)
    val after = readVersion(spark, tablePath, toV)
    // value columns = the UNION across both versions: upsert evolves
    // schemas (append_new_columns), so a version boundary can add or
    // drop columns — a side missing one reads it as null, exactly like
    // the evolved table itself (rows that only gained a null column do
    // NOT register as updates: null <=> null)
    val valCols = (after.columns ++ before.columns).distinct
      .filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) = {
      val have = df.columns.toSet
      df.select(
        org.apache.spark.sql.functions.struct(keys.map(col): _*).as("__k"),
        org.apache.spark.sql.functions.struct(valCols.map(c =>
          if (have(c)) col(c)
          else org.apache.spark.sql.functions.lit(null).as(c)): _*).as(as))
    }
    packed(before, "__b").join(packed(after, "__a"), Seq("__k"),
        "full_outer")
      .withColumn("change_type",
        org.apache.spark.sql.functions.when(col("__b").isNull, "insert")
          .when(col("__a").isNull, "delete")
          .when(!(col("__b") <=> col("__a")), "update"))
      .filter(col("change_type").isNotNull)
      // deletes carry the last-seen values; inserts/updates the new ones
      // (a plain coalesce would resurrect the OLD value when an update
      // nulls a column)
      .select(keys.map(k => col(s"__k.$k").as(k)) ++
        valCols.map(c => org.apache.spark.sql.functions
          .when(col("__a").isNull, col(s"__b.$c"))
          .otherwise(col(s"__a.$c")).as(c)) :+
        col("change_type"): _*)
  }

  /** Streaming ingestion with versioned commits: every micro-batch
    * upserts as a NEW snapshot, so the table gains MVCC readers and a
    * replayable commit history on top of exactly-once source tracking
    * (the checkpoint). foreachBatch re-runs a batch after a crash
    * between commit and checkpoint — the keyed upsert makes the
    * re-commit idempotent in CONTENT (same keys merge to the same
    * rows); it just burns one extra version number, which vacuum
    * reclaims like any other pre-horizon snapshot. */
  def streamCommit(spark: SparkSession, stream: DataFrame,
      tablePath: String, keys: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch((batch: DataFrame, _: Long) => {
        upsert(spark, tablePath, batch, keys); ()
      })
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Register a snapshot (current, or a pinned version for time-travel
    * reads) as a named catalog view — the metastore face of the
    * versioned table, so SQL consumers address `db.name` while the
    * pointer/manifest mechanics stay invisible. Re-registering after a
    * commit repoints the name; a PINNED registration keeps serving its
    * version even as new commits land (until vacuumed). */
  def registerView(spark: SparkSession, viewName: String,
      tablePath: String, version: Option[Long] = None): Long = {
    val v = version.getOrElse(currentVersion(tablePath).getOrElse(
      throw new IllegalStateException(
        s"$tablePath has no committed snapshot")))
    readVersion(spark, tablePath, v).createOrReplaceTempView(viewName)
    v
  }

  private def commitPointer(table: Path, v: Long): Unit = {
    val tmp = table.resolve("_current.__tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
