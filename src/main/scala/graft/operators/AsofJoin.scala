package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join as an operator API — the time-series join Spark lacks
  * natively (DuckDB `ASOF JOIN`, kdb `aj`, Pandas `merge_asof`): each
  * LEFT row is matched with the LATEST right row at-or-before (or
  * strictly-before) its time on the same key. q28 is the catalog
  * instance of this composition; this operator generalizes it to caller
  * frames and arbitrary carried columns.
  *
  * Composition (the scale path — no per-row range probe, no broadcast
  * of either side): tag both inputs, UNION, and carry ONE struct of all
  * right value columns forward with `last(struct, ignoreNulls)` over
  * (key, time, side) — ONE shuffle on the key, cost identical to a
  * window aggregate over the union. The single struct is what makes the
  * carry ATOMIC: a struct built from a right row is non-null even when
  * every field in it is null, so `last(_, ignoreNulls)` always forwards
  * the complete latest right row — per-column carries would instead mix
  * a stale non-null value from an older row with the latest row's other
  * columns whenever a right value column contains nulls. The naive
  * formulations are strictly worse at scale: a range-condition join
  * plans a per-row probe (broadcast-NLJ or worse), and join-then-rank
  * shuffles |left|·avg-matches rows.
  *
  * Contract: `right` must be unique per (keys, rightTime) — pre-reduce
  * with a groupBy/max like q28 if it is not (ambiguous same-instant
  * rows would make the carried value partition-order-dependent).
  * Inclusive (default) matches rightTime <= leftTime; exclusive
  * strictly before. Right value columns must not collide with left
  * column names; `rightTime` is carried as `<rightTime>__asof`.
  */
object AsofJoin {

  def joinAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      inclusive: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    val rightVals = right.columns.toSeq.diff(keys :+ rightTime)
    val collisions = rightVals.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"right value columns collide with left: $collisions")
    val leftVals = left.columns.toSeq.diff(keys :+ leftTime)

    // side tag orders same-instant rows: inclusive → the right row sorts
    // BEFORE the left row it may match (0 < 1); exclusive → after
    val (rightKind, leftKind) = if (inclusive) (0, 1) else (1, 0)
    val carried = rightVals :+ s"${rightTime}__asof"
    // ONE struct per right row: non-null even when its fields are null,
    // so last(ignoreNulls) forwards the whole latest row atomically
    val taggedRight = right
      .withColumn(s"${rightTime}__asof", col(rightTime))
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        lit(rightKind).as("__kind")) ++
        leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carried.map(col): _*).as("__carry"): _*)
    val carryType = taggedRight.schema("__carry").dataType
    val taggedLeft = left
      .select((keys.map(col) :+ col(leftTime).as("__t") :+
        lit(leftKind).as("__kind")) ++
        leftVals.map(col) :+
        lit(null).cast(carryType).as("__carry"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = taggedRight.unionByName(taggedLeft)
      .select(
        (keys.map(col) :+ col("__t") :+ col("__kind")) ++
          leftVals.map(col) :+
          last(col("__carry"), ignoreNulls = true).over(w)
            .as("__carry"): _*)
      .filter(col("__kind") === leftKind)
      .withColumnRenamed("__t", leftTime)
      .drop("__kind")
    // restore the caller's left column order, carried columns expanded
    // from the (atomic) struct and appended
    joined.select(left.columns.toSeq.map(col) ++
      carried.map(c => col("__carry").getField(c).as(c)): _*)
  }
}
