package graft.plans

import graft.operators.{CommitStore, PartitionedSnapshots, Snapshots}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `table_changes` TABLE-VALUED FUNCTION — the SQL face of snapshot CDC
  * (the complement of `VERSION AS OF` time travel):
  *
  * {{{
  * SELECT * FROM table_changes('snap.sales', 1, 3)   -- between versions
  * SELECT * FROM table_changes('snap.sales', 2)      -- from v2 to current
  * SELECT * FROM table_changes('/path/to/dim', 1, 2, 'id')  -- explicit keys
  * SELECT * FROM table_changes('snap.sales',         -- timestamp bounds
  *   TIMESTAMP '2026-08-14 08:00:00', TIMESTAMP '2026-08-14 09:00:00')
  * SELECT * FROM table_changes('snap.sales', 1, 3, true) -- Delta-CDF
  *   -- image parity: updates split into update_preimage/update_postimage
  * }}}
  *
  * Injected via `SparkSessionExtensions.injectTableFunction`, so the call
  * lowers at ANALYSIS time to the same lazy plan the operator API builds —
  * [[PartitionedSnapshots.changes]] for the partitioned format (manifest
  * diff first: only partitions whose owner changed are read at all) or
  * [[Snapshots.changes]] for full-copy tables. Nothing materializes on the
  * driver; the TVF result is an ordinary distributed relation tagged with
  * a `change_type` column (insert / update / delete).
  *
  * Table resolution: a `cat.name` first segment naming a configured
  * [[SnapshotSqlCatalog]] (`spark.sql.catalog.<cat>.root`) resolves under
  * that root; anything else is a filesystem path. Keys come from the
  * table's recorded layout (`_table` props, maintained by every keyed
  * writer); tables without recorded keys (e.g. full-copy dims) take them
  * as an explicit fourth argument.
  */
object TableChanges {

  private def strLit(e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"table_changes: expected string literal, got $other")
  }

  /** A version bound: an integer literal is a version number; a
    * TIMESTAMP literal resolves through publish-time time travel
    * ([[PartitionedSnapshots.versionAt]] — the version current AS OF
    * that instant), mirroring `TIMESTAMP AS OF`. */
  private def versionArg(e: Expression, t: String,
      store: CommitStore): Long = e match {
    // a DATE literal is ALSO an Int at this layer — without the guard
    // it would silently read as a tiny version number
    case Literal(_, org.apache.spark.sql.types.DateType) =>
      throw new IllegalArgumentException(
        "table_changes: DATE bounds are ambiguous — use a TIMESTAMP " +
          "literal (resolved via publish-time time travel) or an " +
          "integer version")
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, org.apache.spark.sql.types.TimestampType) =>
      PartitionedSnapshots.versionAt(t, v / 1000L, store).getOrElse(
        throw new IllegalStateException(
          s"table_changes: $t has no version published at or before " +
            s"timestamp micros=$v"))
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      "table_changes: expected an integer version or TIMESTAMP " +
        s"literal, got $other")
  }

  /** `cat.ns….name` under a configured snapshot catalog root (with
    * that catalog's CommitStore binding, mirroring
    * [[SnapshotSqlCatalog.initialize]]), else a filesystem path used
    * verbatim on the local binding. */
  private def resolvePath(spark: SparkSession, name: String)
      : (String, CommitStore) = {
    val parts = name.split('.')
    if (parts.length < 2) (name, CommitStore.local)
    else spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
      .map { root =>
        val s = spark.conf
          .getOption(s"spark.sql.catalog.${parts.head}.store")
          .map(CommitStore.resolve).getOrElse(CommitStore.local)
        ((root +: parts.tail.toSeq).mkString("/"), s)
      }
      .getOrElse((name, CommitStore.local))
  }

  def build(exprs0: Seq[Expression]): LogicalPlan = {
    // Delta-CDF image parity rides an optional TRAILING boolean:
    // `table_changes(t, 1, 3, true)` / `(…, 'k1,k2', true)` — true
    // splits each update into update_preimage / update_postimage rows
    // (same columns; see Snapshots.diff)
    val preImages = exprs0.lastOption.collect {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType)
          if exprs0.size >= 3 => b
    }
    val exprs = if (preImages.isDefined) exprs0.dropRight(1) else exprs0
    if (exprs.size < 2 || exprs.size > 4)
      throw new IllegalArgumentException(
        "table_changes(table, from_version[, to_version[, keys_csv]]" +
          "[, with_preimages])")
    val spark = SparkSession.active
    val (t, store) = resolvePath(spark, strLit(exprs.head))
    val fromV = versionArg(exprs(1), t, store)
    val toV =
      if (exprs.size >= 3) versionArg(exprs(2), t, store)
      else PartitionedSnapshots.currentVersion(t, store).getOrElse(
        throw new IllegalStateException(
          s"table_changes: $t has no committed snapshot"))
    val keys: Seq[String] =
      if (exprs.size == 4)
        strLit(exprs(3)).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else PartitionedSnapshots.tableProps(t, store).get("keys")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty)
        .getOrElse(throw new UnsupportedOperationException(
          s"table_changes: $t records no key columns — pass them " +
            "explicitly: table_changes(table, from, to, 'k1,k2')"))
    val pre = preImages.getOrElse(false)
    val df =
      if (PartitionedSnapshots.hasManifest(t, toV, store))
        PartitionedSnapshots.changes(spark, t, fromV, toV, keys, store,
          pre)
      else Snapshots.changes(spark, t, fromV, toV, keys, store, pre)
    df.queryExecution.logical
  }
}
