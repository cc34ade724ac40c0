package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Keyed streaming state on Spark 4's `transformWithState` (the
  * arbitrary-state API v2): typed per-key state cells with a store-level
  * TTL, replacing the single-blob GroupState of `mapGroupsWithState`.
  *
  * Four operators, one per state-API facility:
  *
  *  - `firstSeen` (ValueState + TTL) — cross-batch exact dedup with
  *    TTL-BOUNDED state. The watermark-based
  *    `dropDuplicatesWithinWatermark` bounds state by EVENT time, which
  *    needs a trustworthy event-time column; this bounds it by
  *    PROCESSING time — the contract for an infinite corpus stream
  *    whose keys (content hashes) have no event time at all. A key
  *    admits one row, then suppresses repeats until the TTL lapses;
  *    state is one boolean per live key, evicted by the store itself.
  *  - `runningTotals` (ValueState) — per-key running (count, sum)
  *    emitted every time a key appears in a micro-batch (Update mode):
  *    the incremental keyed accumulator shape, two numbers per key.
  *  - `categoryCounts` (MapState) — per-(key, category) histogram where
  *    updating one category touches ONE state cell.
  *  - `closedWindows` (event-time timers) — gap-based session closing:
  *    the API-v2 form of StatefulSessions' flatMapGroupsWithState
  *    timeout.
  *
  * Scale notes: state lives in the RocksDB state store (transformWithState
  * requires the RocksDB provider), hash-partitioned by key exactly like a
  * keyed aggregation — 1000 executors hold 1/1000th of the keys, and TTL
  * eviction happens inside the store with no driver involvement. All
  * processors keep O(1) state per key; only the session closer buffers
  * a key's rows transiently WITHIN one micro-batch (it must see them in
  * event-time order to split on the gap) — persistent state never
  * grows with input.
  */
object TtlState {

  final case class Keyed(key: String, value: Double)
  final case class Totals(key: String, n: Long, total: Double)

  /** Admit the first row per key; suppress repeats while the key's state
    * cell is alive (forever under TTLConfig.NONE, else until the TTL
    * lapses without the store being rewritten). */
  class FirstSeenProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Keyed, Keyed] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, ttl)

    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timers: TimerValues): Iterator[Keyed] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        // duplicates can share one micro-batch too: admit exactly one
        rows.take(1)
      }
  }

  /** Per-key running (n, total), emitted for every key present in the
    * current micro-batch. */
  class RunningTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Keyed, Totals] {
    @transient private var acc: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Totals]("acc",
        Encoders.product[Totals], ttl)

    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timers: TimerValues): Iterator[Totals] = {
      val prev = if (acc.exists()) acc.get() else Totals(key, 0L, 0.0)
      val next = rows.foldLeft(prev)((s, r) =>
        Totals(key, s.n + 1, s.total + r.value))
      acc.update(next)
      Iterator(next)
    }
  }

  final case class Cat(key: String, category: String)
  final case class CatCount(key: String, category: String, n: Long)

  /** Per-key categorical histogram on MapState: one map cell per
    * (key, category), emitting the updated counts for the categories a
    * batch touched. The MapState point: updating ONE category reads and
    * writes ONE cell, where a ValueState holding the whole histogram
    * would rewrite the full map per event — the difference between O(1)
    * and O(categories) state I/O per row at 100 TB. */
  class CategoryCountsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Cat, CatCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[Cat],
        timers: TimerValues): Iterator[CatCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { r =>
        val cur = if (counts.containsKey(r.category))
          counts.getValue(r.category) else 0L
        counts.updateValue(r.category, cur + 1L)
        touched += r.category
      }
      touched.iterator.map(c => CatCount(key, c, counts.getValue(c)))
    }
  }

  /** Running per-(key, category) counts; one Update row per touched
    * category per batch. */
  def categoryCounts(spark: SparkSession, in: Dataset[Cat],
      ttl: Option[Duration]): Dataset[CatCount] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .transformWithState(new CategoryCountsProcessor(ttlConfig(ttl)),
        modeFor(ttl), OutputMode.Update())
  }

  final case class Stamped(key: String, ts: java.sql.Timestamp)
  final case class ClosedWindow(key: String, n_events: Long,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)
  // top-level (object-scope) so Encoders.product can reach it — an
  // inner class of the processor has no encodable outer scope
  final case class SessionAcc(n: Long, first: Long, last: Long)

  /** Gap-based session closing on transformWithState EVENT-TIME TIMERS —
    * the API-v2 form of StatefulSessions' flatMapGroupsWithState
    * timeout: fold events into O(1) per-key state, (re)register a timer
    * at last-seen + gap, and emit the closed session from
    * handleExpiredTimer when the WATERMARK passes it. Timer state lives
    * in the store next to the value cell — partitioned, restart-
    * restored, nothing driver-side. */
  class SessionCloseProcessor(gapMs: Long)
      extends StatefulProcessor[String, Stamped, ClosedWindow] {
    @transient private var acc: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessionAcc]("acc",
        Encoders.product[SessionAcc], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Stamped],
        timers: TimerValues): Iterator[ClosedWindow] = {
      // Input rows are processed BEFORE expired timers within a batch,
      // so a new event arriving after an old session's horizon would
      // re-arm the timer and absorb that session (measured) — the gap
      // split must therefore happen inline: a row beyond last + gap
      // closes the open session here; timers only cover the
      // no-further-input case.
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedWindow]
      var cur = if (acc.exists()) Some(acc.get()) else None
      rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
        val t = r.ts.getTime
        cur = cur match {
          case Some(s) if t > s.last + gapMs =>
            out += ClosedWindow(key, s.n,
              new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last))
            Some(SessionAcc(1L, t, t))
          case Some(s) => Some(SessionAcc(s.n + 1,
            math.min(s.first, t), math.max(s.last, t)))
          case None => Some(SessionAcc(1L, t, t))
        }
      }
      cur.foreach { s =>
        acc.update(s)
        // one live timer per key: re-arm to the new session horizon
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.last + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedWindow] = {
      if (!acc.exists()) Iterator.empty
      else {
        val s = acc.get()
        acc.clear()
        Iterator(ClosedWindow(key, s.n,
          new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last)))
      }
    }
  }

  /** Closed sessions by inactivity gap, driven by event-time timers and
    * the stream's watermark (set a watermark on `in` upstream). */
  def closedWindows(spark: SparkSession, in: Dataset[Stamped],
      gap: Duration): Dataset[ClosedWindow] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .transformWithState(new SessionCloseProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private def ttlConfig(ttl: Option[Duration]): TTLConfig =
    ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)

  /** TTL needs ProcessingTime mode — but ProcessingTime mode makes the
    * engine schedule micro-batches CONTINUOUSLY even with no input (and
    * even under Trigger.AvailableNow), because processing time always
    * advances and expiring TTL state is itself work. So the mode is
    * opt-in via the ttl argument: without TTL the query runs in
    * TimeMode.None and idles between input batches like any stateful
    * query; with TTL, callers get the always-running contract. */
  private def modeFor(ttl: Option[Duration]): TimeMode =
    if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()

  /** First occurrence per key, state TTL-bounded (None = keep forever). */
  def firstSeen(spark: SparkSession, in: Dataset[Keyed],
      ttl: Option[Duration]): Dataset[Keyed] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor(ttlConfig(ttl)),
        modeFor(ttl), OutputMode.Update())
  }

  /** Running per-key totals, one Update row per touched key per batch. */
  def runningTotals(spark: SparkSession, in: Dataset[Keyed],
      ttl: Option[Duration]): Dataset[Totals] = {
    import spark.implicits._
    in.groupByKey(_.key)
      .transformWithState(new RunningTotalsProcessor(ttlConfig(ttl)),
        modeFor(ttl), OutputMode.Update())
  }
}
