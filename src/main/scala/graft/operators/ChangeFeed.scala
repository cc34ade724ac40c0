package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PULL-BASED CHANGE-FEED CONSUMPTION over snapshot tables — the
  * downstream half of CDC ([[PartitionedSnapshots.changes]] /
  * [[Snapshots.changes]] produce the rows; this operator gives a named
  * consumer a durable CURSOR so it can drain them incrementally with
  * exactly-once EFFECT):
  *
  * {{{
  * ChangeFeed.poll(spark, t, "search-indexer") match {
  *   case Some(b) => applyToIndex(b.df); ChangeFeed.commit(t, "search-indexer", b.toVersion)
  *   case None    => ()  // caught up
  * }
  * }}}
  *
  * The contract is the standard outbox/consumer-offset pattern (Kafka
  * consumer groups, Delta streaming's startingVersion): poll returns
  * every change between the consumer's committed cursor and the table's
  * commit pointer; the consumer applies them, THEN commits the batch's
  * `toVersion`. A crash between apply and commit re-delivers the same
  * batch (at-least-once delivery) — pairs with keyed/idempotent apply
  * for exactly-once effect, and the batch content is deterministic on
  * re-poll because both endpoint versions are immutable snapshots.
  *
  * Scale posture: a poll costs what the underlying manifest-diff CDC
  * costs — O(changed partitions) for the partitioned format, never a
  * table scan for an idle feed (identical manifests short-circuit to an
  * empty frame without reading data). The cursor is one tiny sidecar per
  * consumer under `t/_consumers/`, written with the same atomic-rename
  * discipline as every other pointer; many consumers track the same
  * table independently.
  *
  * Vacuum interplay: a consumer that falls behind the retention horizon
  * (its cursor version vacuumed) fails loudly with instructions rather
  * than silently skipping changes — re-bootstrap with [[reset]] +
  * `startFrom = Snapshot`. Run vacuum with `keep` ≥ the slowest
  * consumer's lag.
  */
object ChangeFeed {

  /** Where a consumer with NO committed cursor begins. */
  sealed trait Start
  /** First poll = the full current state tagged `insert` (Delta's
    * initial-snapshot semantics) — the bootstrap for consumers that
    * must materialize the table before tailing it. */
  case object Snapshot extends Start
  /** First poll = an empty batch pinned at the current version — for
    * consumers that only care about changes from now on. */
  case object Latest extends Start
  /** First poll = changes since a specific retained version. */
  final case class FromVersion(v: Long) extends Start

  /** One drained batch: `df` is the change rows (key cols + value cols +
    * `change_type` ∈ insert/update/delete), `(fromVersion, toVersion]`
    * the version range it covers. Commit `toVersion` after applying. */
  final case class Batch(df: DataFrame, fromVersion: Long, toVersion: Long)

  private def consumersDir(t: String) = s"$t/_consumers"
  private def cursorPath(t: String, consumerId: String) = {
    require(consumerId.nonEmpty && !consumerId.contains("/"),
      s"consumerId must be a plain name, got '$consumerId'")
    s"${consumersDir(t)}/$consumerId"
  }

  /** The consumer's committed cursor version, if any. */
  def cursor(t: String, consumerId: String,
      store: CommitStore = CommitStore.local): Option[Long] =
    store.read(cursorPath(t, consumerId)).map { bytes =>
      val s = new String(bytes, "UTF-8").trim
      try s.toLong
      catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"torn/corrupt cursor for consumer '$consumerId' at " +
            s"${cursorPath(t, consumerId)} ('$s') — reset(t, consumerId) " +
            "and re-bootstrap")
      }
    }

  private def keysOf(t: String, keys: Seq[String],
      store: CommitStore): Seq[String] =
    if (keys.nonEmpty) keys
    else PartitionedSnapshots.tableProps(t, store).get("keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .getOrElse(throw new UnsupportedOperationException(
        s"$t records no key columns — pass them to poll(keys = …)"))

  private def changesBetween(spark: SparkSession, t: String, fromV: Long,
      toV: Long, keys: Seq[String], consumerId: String,
      store: CommitStore, preImages: Boolean): DataFrame =
    try {
      if (PartitionedSnapshots.hasManifest(t, toV, store))
        PartitionedSnapshots.changes(spark, t, fromV, toV, keys, store,
          preImages)
      else Snapshots.changes(spark, t, fromV, toV, keys, store, preImages)
    } catch {
      case e: IllegalStateException =>
        throw new IllegalStateException(
          s"consumer '$consumerId' is behind the retention horizon " +
            s"(${e.getMessage}) — reset(t, consumerId) and re-bootstrap " +
            "with startFrom = Snapshot, and vacuum with keep >= the " +
            "slowest consumer's lag", e)
    }

  /** Changes since the consumer's cursor, or None when caught up. Does
    * NOT advance the cursor — call [[commit]] with the batch's
    * `toVersion` after durably applying it. `preImages = true` emits
    * Delta-CDF image pairs for updates (update_preimage /
    * update_postimage — see [[Snapshots.diff]]); [[mirror]] always
    * consumes post-images (its MERGE needs one row per key). */
  def poll(spark: SparkSession, t: String, consumerId: String,
      keys: Seq[String] = Nil, startFrom: Start = Snapshot,
      store: CommitStore = CommitStore.local,
      preImages: Boolean = false): Option[Batch] = {
    val cur = PartitionedSnapshots.currentVersion(t, store).getOrElse(
      throw new IllegalStateException(s"$t has no committed snapshot"))
    cursor(t, consumerId, store) match {
      case Some(c) if c == cur => None
      case Some(c) if c > cur => throw new IllegalStateException(
        s"consumer '$consumerId' cursor v$c is AHEAD of the commit " +
          s"pointer v$cur of $t — the cursor belongs to a different " +
          "table incarnation; reset(t, consumerId) and re-bootstrap")
      case Some(c) =>
        Some(Batch(changesBetween(spark, t, c, cur,
          keysOf(t, keys, store), consumerId, store, preImages), c, cur))
      case None => startFrom match {
        case Snapshot =>
          val snap =
            if (PartitionedSnapshots.hasManifest(t, cur, store))
              PartitionedSnapshots.readVersion(spark, t, cur, store)
            else Snapshots.readVersion(spark, t, cur, store)
          Some(Batch(snap.withColumn("change_type", lit("insert")),
            0L, cur))
        case Latest =>
          // empty by construction (both endpoints are the same version)
          // — shape it from the table without requiring key resolution.
          // The pin is committed HERE (it applies nothing, so there is
          // nothing to durably apply first): a consumer that skips
          // committing empty batches would otherwise re-receive this
          // bootstrap batch forever and never converge to None
          val shape =
            if (PartitionedSnapshots.hasManifest(t, cur, store))
              PartitionedSnapshots.readVersion(spark, t, cur, store)
            else Snapshots.readVersion(spark, t, cur, store)
          commit(t, consumerId, cur, store)
          Some(Batch(shape.limit(0)
            .withColumn("change_type", lit(null).cast("string")),
            cur, cur))
        case FromVersion(v) =>
          Some(Batch(changesBetween(spark, t, v, cur,
            keysOf(t, keys, store), consumerId, store, preImages), v, cur))
      }
    }
  }

  /** STREAMING drain — `spark.readStream` over the table's change
    * feed ([[graft.streaming.ChangeFeedSourceProvider]]): versions are
    * offsets, micro-batches are manifest-diff CDC row sets, the
    * checkpoint replaces the pull cursor. Same bootstrap semantics as
    * [[poll]]'s Snapshot/Latest starts. */
  def readStream(spark: SparkSession, t: String,
      keys: Seq[String] = Nil, preImages: Boolean = false,
      latestOnly: Boolean = false,
      consumerId: Option[String] = None,
      storeName: Option[String] = None,
      maxVersionsPerBatch: Option[Long] = None,
      maxFilesPerBatch: Option[Long] = None,
      schemaTrackingLocation: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("graft-changes").option("path", t)
    if (keys.nonEmpty) r = r.option("keys", keys.mkString(","))
    if (preImages) r = r.option("preImages", "true")
    if (latestOnly) r = r.option("startingVersion", "latest")
    consumerId.foreach(c => r = r.option("consumerId", c))
    // "local" | "hadoop" | a CommitStore.register-ed binding name
    storeName.foreach(s => r = r.option("store", s))
    // backfill pacing: cap each micro-batch at N versions
    maxVersionsPerBatch.foreach(n =>
      r = r.option("maxVersionsPerBatch", n.toString))
    // file pacing: drain the bootstrap snapshot — and any over-budget
    // later span — as ~N-file slices. Floor: the partition is the
    // format's atomic diff unit, so each batch is bounded by
    // max(N, largest single changed partition's files)
    maxFilesPerBatch.foreach(n =>
      r = r.option("maxFilesPerBatch", n.toString))
    // persisted schema pin + recorded drift decisions: a retype's
    // re-bootstrap remedy executes by restart, not checkpoint surgery
    schemaTrackingLocation.foreach(l =>
      r = r.option("schemaTrackingLocation", l))
    r.load()
  }

  /** Durably advance the consumer's cursor to `toVersion` (the polled
    * batch's `toVersion`, AFTER applying it). Forward-only, bounded by
    * the commit pointer; atomic via the same temp+rename discipline as
    * every other pointer. */
  def commit(t: String, consumerId: String, toVersion: Long,
      store: CommitStore = CommitStore.local): Unit = {
    val cur = PartitionedSnapshots.currentVersion(t, store).getOrElse(
      throw new IllegalStateException(s"$t has no committed snapshot"))
    require(toVersion <= cur,
      s"cannot commit cursor v$toVersion beyond the commit pointer v$cur")
    cursor(t, consumerId, store).foreach(c => require(toVersion >= c,
      s"cursor moves forward only: v$c -> v$toVersion refused"))
    store.mkdirs(consumersDir(t))
    Incremental.atomicOverwrite(store, cursorPath(t, consumerId)) { tmp =>
      store.write(tmp, toVersion.toString.getBytes("UTF-8"))
    }
  }

  /** Drop the consumer's cursor — the next poll re-bootstraps via its
    * `startFrom`. */
  def reset(t: String, consumerId: String,
      store: CommitStore = CommitStore.local): Unit = {
    store.delete(cursorPath(t, consumerId)); ()
  }

  /** MIRROR the source table into a downstream snapshot table by
    * draining ONE change batch and applying it as a single MERGE — the
    * incremental-materialization pattern (a replica, a filtered
    * extract's base, a serving copy) without rebuilding the target:
    *
    * {{{
    * // each call: poll → merge (insert/update/delete in one commit) →
    * // commit the cursor; None when already caught up
    * ChangeFeed.mirror(spark, src, "replica", dst, partCol = Some("d"))
    * }}}
    *
    * Crash-safe the same way every consumer is: the cursor commits
    * AFTER the merge, so a crash in between re-delivers the batch and
    * the keyed merge re-applies it idempotently in CONTENT (one extra
    * version number, vacuumable). Deletes on the source become target
    * deletes via the merge's matched-delete clause; a delete for a row
    * the target never had is skipped. First call bootstraps the target
    * from the batch's insert rows. Data cost per call is the CDC cost
    * (changed partitions) + the merge's touched partitions.
    *
    * `partCol = Some(c)` makes the target partitioned-format (the
    * fact-scale choice); `None` a full-copy table (dimension-scale). */
  def mirror(spark: SparkSession, srcT: String, consumerId: String,
      targetT: String, partCol: Option[String] = None,
      keys: Seq[String] = Nil, startFrom: Start = Snapshot,
      store: CommitStore = CommitStore.local): Option[Batch] = {
    val ks = keysOf(srcT, keys, store)
    poll(spark, srcT, consumerId, ks, startFrom, store).map { b =>
      val rows = b.df
      val vals = rows.columns.filterNot(_ == "change_type").toSeq
      val hasTarget =
        PartitionedSnapshots.currentVersion(targetT, store).isDefined
      if (!hasTarget) {
        val boot = rows.filter(col("change_type") =!= "delete")
          .select(vals.map(col): _*)
        partCol match {
          case Some(pc) =>
            PartitionedSnapshots.write(spark, targetT, boot, pc, store)
          case None => Snapshots.write(spark, targetT, boot, store)
        }
      } else if (!rows.isEmpty) {
        val update = vals.filterNot(ks.contains)
          .map(c => c -> PartitionedSnapshots.source(c)).toMap
        val del = Some(PartitionedSnapshots.source("change_type") === "delete")
        val insCond =
          Some(PartitionedSnapshots.source("change_type") =!= "delete")
        partCol match {
          case Some(pc) =>
            PartitionedSnapshots.merge(spark, targetT, rows, ks, pc,
              whenMatchedUpdate = update, whenMatchedDelete = del,
              insertNotMatched = true, insertCond = insCond,
              store = store)
          case None =>
            Snapshots.merge(spark, targetT, rows, ks,
              whenMatchedUpdate = update, whenMatchedDelete = del,
              insertNotMatched = true, insertCond = insCond,
              store = store)
        }
      }
      commit(srcT, consumerId, b.toVersion, store)
      b
    }
  }

  /** Vacuum that RESPECTS consumer lag: widens `keep` so every version
    * a registered consumer still needs (its cursor and everything
    * after) survives — the retention-horizon failure in [[poll]]
    * becomes unreachable for consumers that commit through this API,
    * at the cost of disk held until the slowest consumer advances.
    * A table with no registered consumers vacuums exactly like
    * [[PartitionedSnapshots.vacuum]]/[[Snapshots.vacuum]]. Returns the
    * reclaimed versions. */
  def safeVacuum(t: String, keep: Int = 1,
      store: CommitStore = CommitStore.local,
      txnRetainMs: Option[Long] = None): Seq[Long] = {
    val cur = PartitionedSnapshots.currentVersion(t, store).getOrElse(
      return Seq.empty)
    val floor = consumers(t, store).values.reduceOption(_ min _)
    // keep counts back from the pointer; a cursor at v needs v retained
    // (the next poll diffs FROM it), so the window must reach v
    val needed = floor.map(v => (cur - v + 1).toInt.max(keep))
      .getOrElse(keep)
    val isPartitioned = PartitionedSnapshots.currentVersion(t, store)
      .exists(v => PartitionedSnapshots.hasManifest(t, v, store))
    if (isPartitioned)
      PartitionedSnapshots.vacuum(t, needed, store, txnRetainMs)
    else Snapshots.vacuum(t, needed, store, txnRetainMs)
  }

  /** All consumers tracking `t` with their committed cursors — the lag
    * report vacuum policy should consult. */
  def consumers(t: String, store: CommitStore = CommitStore.local)
      : Map[String, Long] =
    store.list(consumersDir(t))
      // the atomic-overwrite discipline parks x.__old / x.__tmp next to
      // the cursor; only plain names are consumers
      .filterNot(_.contains(".__"))
      .map(name => name -> cursor(t, name, store))
      .collect { case (n, Some(v)) => n -> v }
      .toMap
}
