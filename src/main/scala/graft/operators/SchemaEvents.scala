package graft.operators

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** AUDIT LOG of table-schema WIDENINGS — who added which columns, when,
  * and with which commit (round-13 sink-side symmetry ask: the CDC
  * source records its schema pins in `schemaTrackingLocation`; the
  * write side now records its evolutions too, so a fleet operator can
  * answer "who widened this shared table" without diffing footers).
  *
  * Storage: one immutable file per event under
  * `<table>/_schema_history/`, named `<tsMs>-<nonce>` — concurrent
  * recorders (two streams evolving different columns in the same
  * instant) never contend on a read-modify-write, and the log needs no
  * lock. Each file is two lines: a `ts \t actor \t source \t version`
  * header and the added columns as a single-line [[StructType]] JSON
  * (no hand-rolled type parsing — struct types carry commas and colons
  * that would break any delimiter scheme).
  *
  * Recorded by:
  *  - `ALTER TABLE … ADD COLUMN` ([[PartitionedSnapshots.addColumn]]):
  *    actor `alter`, no version (a declared-schema change burns none);
  *  - the streaming sink's first applied epoch that lands new columns
  *    ([[graft.plans.SnapshotStreamingWrite]]): actor `stream`, source
  *    = the query id, version = the epoch's committed version.
  *
  * Batch upsert/append widenings (unionByName with missing columns)
  * are deliberate non-events: they are driver-visible one-off calls,
  * not long-running writers a fleet operator audits blind. Surfaced
  * via `CALL <cat>.system.schema_history('<table>')`. The log lives
  * outside `_snapshots`, so vacuum never reclaims it; DROP TABLE
  * removes it with the table dir.
  *
  * ON-DISK FORMAT v2 (round 14): versionless-but-complete events write
  * `none` in the version slot (v1 wrote `-`, conflating them with
  * staged claims), and [[rollUp]] compacts filled events into
  * `_segment-*` files, deleting the originals. A v1 reader of a shared
  * table drops `none` events as torn and never reads segments — if a
  * fleet still runs v1 readers against shared tables, upgrade the
  * readers BEFORE any v2 writer records an event (the data path is
  * unaffected; only this audit log changed shape). */
object SchemaEvents {

  final case class Event(tsMs: Long, actor: String, source: String,
      version: Option[Long], added: Seq[StructField])

  private def dir(t: String) = s"$t/_schema_history"

  /** Append one widening event (its own unique file — lock-free).
    * atomicWrite, not a plain write: addColumn records AFTER its
    * widening commits, so a crash (or a reader racing a non-atomic
    * filesystem PUT) mid-record would tear the event and [[all]]
    * would silently skip it — losing the ALTER's audit entry even
    * though the widening landed, contradicting all()'s rationale that
    * a torn event implies the widening never committed. The `.__tmp-`
    * staging leftovers atomicWrite can leave are already filtered by
    * [[all]]. */
  def record(t: String, actor: String, source: String,
      version: Option[Long], added: Seq[StructField],
      store: CommitStore = CommitStore.local): Unit = {
    if (added.isEmpty) return
    val ts = System.currentTimeMillis()
    val name = s"$ts-${java.util.UUID.randomUUID().toString.take(8)}"
    // versionless-but-COMPLETE events write "none", not the staged
    // path's "-": only "-" marks an in-flight claim fillVersion may
    // still patch, and only those must stay loose (un-compactable) —
    // an ALTER's event is immutable from birth and rolls up normally
    val body =
      s"$ts\t$actor\t$source\t${version.fold("none")(_.toString)}\n" +
        StructType(added.toArray).json
    store.mkdirs(dir(t))
    store.atomicWrite(s"${dir(t)}/$name", body.getBytes("UTF-8"))
    // opportunistic compaction — never fail the recorder for it
    scala.util.Try(rollUp(t, store = store))
    ()
  }

  private def unfilled(t: String, name: String,
      store: CommitStore): Boolean =
    store.read(s"${dir(t)}/$name").exists { b =>
      val lines = new String(b, "UTF-8").split('\n')
      lines.nonEmpty && scala.util.Try(
        lines(0).split('\t')(3) == "-").getOrElse(false)
    }

  /** Durable TWO-PHASE record for recorders whose widening and event
    * cannot land atomically (the streaming sink): phase 1 creates the
    * event under a caller-chosen DETERMINISTIC name BEFORE the
    * widening commits — `createNew`, so a replayed epoch finds the
    * still-unfilled entry and reuses it — with the version unknown;
    * [[fillVersion]] patches the version in once the commit lands.
    * Crash between the phases leaves the full audit entry
    * (who/what/when) minus the version; crash before phase 1 means
    * the widening did not land either (the epoch replays and retries
    * both). A name whose event is already FILLED belongs to an
    * earlier completed widening (the same query re-adding the same
    * columns after a rebuild dropped them) — history is immutable, so
    * the new widening records under a fresh derived name. Returns the
    * name actually used (pass it to [[fillVersion]]/[[discardStaged]]). */
  def stage(t: String, name: String, actor: String, source: String,
      added: Seq[StructField],
      store: CommitStore = CommitStore.local): String = {
    val ts = System.currentTimeMillis()
    val body = (s"$ts\t$actor\t$source\t-\n" +
      StructType(added.toArray).json).getBytes("UTF-8")
    store.mkdirs(dir(t))
    if (store.createNew(s"${dir(t)}/$name", body) ||
        unfilled(t, name, store)) name
    else {
      // re-widening (the deterministic name is FILLED): reuse an
      // existing UNFILLED derived entry before minting one — a
      // crash/replay loop must converge on a single staged claim, not
      // leave one ghost per attempt (the derived names are
      // timestamped, so only reuse makes the replay idempotent)
      store.list(dir(t)).sorted
        .filter(f => f.startsWith(s"$name-r") && !f.contains(".__tmp-"))
        .find(f => unfilled(t, f, store))
        .getOrElse {
          val fresh = s"$name-r$ts"
          // a lost createNew race here means another attempt of the
          // SAME logical event won the name (it encodes the source
          // and the added-column set) — reusing it is correct
          store.createNew(s"${dir(t)}/$fresh", body)
          fresh
        }
    }
  }

  /** Phase 2 of [[stage]]: record the committed version on the staged
    * event (atomic — readers see the old content or the new, never a
    * torn file). No-op if the event is missing, unreadable, or
    * ALREADY FILLED — a completed audit entry is immutable; rewriting
    * its version would falsify history. */
  def fillVersion(t: String, name: String, version: Long,
      store: CommitStore = CommitStore.local): Unit =
    if (unfilled(t, name, store)) {
      store.read(s"${dir(t)}/$name").foreach { b =>
        val lines = new String(b, "UTF-8").split('\n')
        if (lines.length >= 2) scala.util.Try {
          val h = lines(0).split('\t')
          store.atomicWrite(s"${dir(t)}/$name",
            (s"${h(0)}\t${h(1)}\t${h(2)}\t$version\n" +
              lines.drop(1).mkString("\n")).getBytes("UTF-8"))
        }
      }
      // the fill is what turns a staged event compactable
      scala.util.Try(rollUp(t, store = store))
      ()
    }

  /** Remove a STAGED (still-unfilled) event whose widening is now
    * known to never land — a permanently refused epoch must not leave
    * a ghost claim in the audit log. Filled entries are never touched. */
  def discardStaged(t: String, name: String,
      store: CommitStore = CommitStore.local): Unit =
    if (unfilled(t, name, store)) {
      store.delete(s"${dir(t)}/$name")
      ()
    }

  private def parseBody(b: Array[Byte]): Option[Event] = {
    val lines = new String(b, "UTF-8").split('\n')
    if (lines.length < 2) None
    else scala.util.Try {
      val h = lines(0).split('\t')
      Event(h(0).toLong, h(1), h(2),
        // "-" = staged/unfilled, "none" = complete but versionless
        // (pre-roll-up events on disk use "-" for both; they parse
        // the same and simply stay loose)
        Some(h(3)).filter(v => v != "-" && v != "none").map(_.toLong),
        DataType.fromJson(lines(1)).asInstanceOf[StructType]
          .fields.toSeq)
    }.toOption
  }

  /** Roll-up threshold: a table widened by thousands of stream
    * restarts must not make `schema_history` an O(events) small-read
    * storm on an object store. */
  private[operators] val RollThreshold = 64

  /** Compact FILLED events into one immutable SEGMENT file once the
    * loose tail crosses `threshold` — `all()` then reads segments +
    * tail instead of one GET per event. Unfilled events are in-flight
    * claims (the sink's two-phase window) and never compact. The
    * segment embeds each member's original filename, the name is
    * content-addressed from the member list (two concurrent roll-ups
    * of the same set converge on one segment via createNew), and the
    * originals delete only AFTER the segment lands — a crash between
    * leaves duplicates, which `all()` dedupes by original name.
    * Segments are never re-rolled: at fleet-restart cadence each
    * holds >= threshold events, so the segment count stays dozens
    * where the event count would be thousands. Returns true if a
    * segment was written. Called opportunistically by [[record]] and
    * [[fillVersion]]; safe to call any time. */
  def rollUp(t: String, threshold: Int = RollThreshold,
      store: CommitStore = CommitStore.local): Boolean = {
    val loose = store.list(dir(t)).sorted
      .filterNot(n => n.contains(".__tmp-") || n.startsWith("_segment-"))
    if (loose.size < threshold) return false
    // ONE read per loose file — the unfilled verdict derives from the
    // body just read (a separate unfilled() probe would pay a second
    // GET per file on EVERY record() call for as long as staged claims
    // hold the filled count under threshold)
    val members = loose.flatMap { n =>
      store.read(s"${dir(t)}/$n").map(b => n -> new String(b, "UTF-8"))
    }.filterNot { case (_, c) =>
      c.split('\n').headOption.exists(l =>
        scala.util.Try(l.split('\t')(3) == "-").getOrElse(false))
    }
    if (members.size < threshold) return false
    val body = members.map { case (n, c) => s"=== $n\n$c" }
      .mkString("\n")
    // identity = first + last member, count, and an ordered hash —
    // two roll-ups of the SAME set converge on one name (createNew
    // makes the write once-only); a DIFFERENT set colliding would
    // need identical endpoints, count and hash, so the delete below
    // can never orphan content the landed segment lacks
    val id = Integer.toHexString(
      scala.util.hashing.MurmurHash3.orderedHash(members.map(_._1)))
    val seg =
      s"_segment-${members.head._1}-${members.last._1}-${members.size}-$id"
    val segPath = s"${dir(t)}/$seg"
    // stage + rename, NOT a direct create: a crash mid-write would
    // leave a PARTIAL file under the final name, and the retry —
    // seeing the name exist — would delete the originals against a
    // truncated segment. The rename publishes only complete content;
    // a loser of the concurrent-roll-up race (same name = same member
    // set by construction) just discards its staging file, and the
    // `.__tmp-` leftovers of a crash are invisible to [[all]].
    if (!store.exists(segPath)) {
      val tmp =
        s"$segPath.__tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      // delete in FINALLY: the loser of the concurrent-roll-up race can
      // see its rename THROW (the winner landed the segment between the
      // exists check and the rename on stores where a taken destination
      // is an error, not a false) — without the finally, its staging
      // file would leak under _schema_history forever
      try {
        store.write(tmp, body.getBytes("UTF-8"))
        store.rename(tmp, segPath, replaceExisting = false)
      } finally store.delete(tmp)
    }
    members.foreach { case (n, _) => store.delete(s"${dir(t)}/$n") }
    true
  }

  /** Every recorded widening, oldest first (by recorded timestamp —
    * staged events carry deterministic names, so filename order is
    * not chronological). Unreadable/torn files are skipped (an event
    * write is a single small PUT; a torn one means a crashed recorder
    * whose widening never committed either). Loose files read BEFORE
    * segments: a roll-up deletes originals only after its segment
    * landed, so an event vanishing mid-read is guaranteed present in
    * a segment read afterwards — never lost, and duplicates (the
    * crash-between window) dedupe by original name. */
  def all(t: String, store: CommitStore = CommitStore.local): Seq[Event] = {
    val entries = store.list(dir(t)).sorted
      // atomicWrite stages "<name>.__tmp-<uuid>" in this directory; a
      // crash between the stage and the rename leaves the tmp behind,
      // and its body would parse as a valid DUPLICATE event
      .filterNot(_.contains(".__tmp-"))
    val looseNames = entries.filterNot(_.startsWith("_segment-"))
    val loose: Seq[(String, Event)] = looseNames.flatMap { f =>
      store.read(s"${dir(t)}/$f").flatMap(parseBody).map(f -> _)
    }
    // segments listed FRESH after the loose reads (see scaladoc)
    val segs = store.list(dir(t)).sorted.filter(_.startsWith("_segment-"))
      .flatMap { sg =>
        store.read(s"${dir(t)}/$sg").toSeq.flatMap { b =>
          new String(b, "UTF-8").split("(?m)^=== ").toSeq
            .filter(_.nonEmpty).flatMap { chunk =>
              val nl = chunk.indexOf('\n')
              if (nl < 0) None
              else parseBody(chunk.drop(nl + 1).getBytes("UTF-8"))
                .map(chunk.take(nl).trim -> _)
            }
        }
      }
    val seen = scala.collection.mutable.Set.empty[String]
    (loose ++ segs).flatMap { case (n, e) =>
      if (seen.add(n)) Some(e) else None
    }.sortBy(_.tsMs)
  }
}
