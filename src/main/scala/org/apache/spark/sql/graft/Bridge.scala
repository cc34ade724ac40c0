package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]` (ExpressionUtils); placing
  * this shim inside the sql package namespace is the standard pattern
  * third-party extension libraries use to expose native expressions as
  * user-facing Columns.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-analyzed logical plan (the `private[sql]`
    * Dataset.ofRows) — lets a command node re-enter the DataFrame API
    * with the plan Spark resolved for it (e.g. the USING side of an
    * intercepted MERGE INTO). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Mark a batch DataFrame as a STREAMING micro-batch result — what a
    * V1 `Source.getBatch` must return (the engine asserts
    * `isStreaming`). Same mechanism the Kafka/Delta sources use:
    * re-enter through `internalCreateDataFrame(rdd, schema,
    * isStreaming = true)` over the plan's lazy RDD — nothing executes
    * until the micro-batch runs. */
  def asStreaming(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Spark's own `StructType.asNullable` (`private[spark]`): every
    * field, element and value nullable — the shape Spark serves every
    * file-based schema in. Exposed here so callers track Spark's exact
    * nullability rule instead of re-implementing the recursion. */
  def asNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = s.asNullable

  /** Nullability-insensitive type equality (the `private[sql]`
    * `DataType.equalsIgnoreNullability`) — the right comparison for
    * write-compatibility checks, where a struct differing only in a
    * nested nullable flag is still the same storable type. */
  def sameTypeIgnoreNullability(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)

  /** WRITE-compatible type equality (the `private[sql]`
    * `DataType.equalsIgnoreCompatibleNullability`): `from` can be
    * stored into `to` — same types, and `from` is nullable only where
    * `to` tolerates nulls. The ONE-directional check a write gate
    * needs: a non-null stream field may land in a nullable table
    * column, but a nullable stream field must not land in a column the
    * table declares non-null (readers trusting the declaration would
    * see impossible nulls). */
  def writeCompatible(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType
      .equalsIgnoreCompatibleNullability(from, to)

  /** The reliable-checkpoint directory backing a checkpointed frame
    * (None for cache- or localCheckpoint-backed frames, whose blocks
    * the ContextCleaner reclaims on GC). `Dataset.checkpoint` wraps
    * the checkpointed internal RDD in a (`private[sql]`) `LogicalRDD`
    * leaf; that RDD's `getCheckpointFile` names the `rdd-<id>`
    * directory — which lets an iterative operator free RETIRED
    * rounds' files eagerly. The ContextCleaner deletes checkpoint
    * FILES only under
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false), so without eager deletion a per-round checkpoint loop
    * accumulates one directory per round for the life of the
    * session. */
  def checkpointFile(df: org.apache.spark.sql.DataFrame): Option[String] =
    // ROOT match only, never a lineage walk: a frame whose analyzed
    // plan merely CONTAINS a LogicalRDD (e.g. a cached iteration over
    // a caller-checkpointed input) must not surface the caller's
    // checkpoint as its own — a cleanup acting on it would delete
    // files the caller still needs
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getCheckpointFile
      case _ => None
    }

  /** Distributed map over a file list with the session's hadoop conf
    * available on executors — the footer-harvesting shape (read
    * parquet metadata for many files in parallel, no data pages).
    * Lives here because `SerializableConfiguration` is
    * `private[spark]`; the closure `f` must be serializable.
    *
    * The SESSION conf (`sessionState.newHadoopConf()`), not the bare
    * `sparkContext.hadoopConfiguration`: session-scoped filesystem
    * settings (per-session `fs.s3a` credentials, a `SET`-configured
    * endpoint) must reach the executors, or every footer open against
    * such a store throws and callers silently fall back to their slow
    * path. */
  def mapFilesWithConf[T](spark: org.apache.spark.sql.SparkSession,
      files: Seq[String], parallelism: Int)(
      f: (String, org.apache.hadoop.conf.Configuration) => T)(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    val ser = new org.apache.spark.util.SerializableConfiguration(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.newHadoopConf())
    spark.sparkContext
      .parallelize(files, math.max(1, parallelism))
      .map(x => f(x, ser.value)).collect()
  }

  /** Register a native expression on an ALREADY-built session (for
    * sessions created without `withExtensions`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
