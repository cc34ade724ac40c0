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
  * removes it with the table dir. */
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
    val body = s"$ts\t$actor\t$source\t${version.fold("-")(_.toString)}\n" +
      StructType(added.toArray).json
    store.mkdirs(dir(t))
    store.atomicWrite(s"${dir(t)}/$name", body.getBytes("UTF-8"))
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
    if (unfilled(t, name, store))
      store.read(s"${dir(t)}/$name").foreach { b =>
        val lines = new String(b, "UTF-8").split('\n')
        if (lines.length >= 2) scala.util.Try {
          val h = lines(0).split('\t')
          store.atomicWrite(s"${dir(t)}/$name",
            (s"${h(0)}\t${h(1)}\t${h(2)}\t$version\n" +
              lines.drop(1).mkString("\n")).getBytes("UTF-8"))
        }
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

  /** Every recorded widening, oldest first (by recorded timestamp —
    * staged events carry deterministic names, so filename order is
    * not chronological). Unreadable/torn files are skipped (an event
    * write is a single small PUT; a torn one means a crashed recorder
    * whose widening never committed either). */
  def all(t: String, store: CommitStore = CommitStore.local): Seq[Event] =
    store.list(dir(t)).sorted
      // atomicWrite stages "<name>.__tmp-<uuid>" in this directory; a
      // crash between the stage and the rename leaves the tmp behind,
      // and its body would parse as a valid DUPLICATE event
      .filterNot(_.contains(".__tmp-"))
      .flatMap { f =>
      store.read(s"${dir(t)}/$f").flatMap { b =>
        val lines = new String(b, "UTF-8").split('\n')
        if (lines.length < 2) None
        else scala.util.Try {
          val h = lines(0).split('\t')
          Event(h(0).toLong, h(1), h(2),
            Some(h(3)).filter(_ != "-").map(_.toLong),
            DataType.fromJson(lines(1)).asInstanceOf[StructType]
              .fields.toSeq)
        }.toOption
      }
    }.sortBy(_.tsMs)
}
