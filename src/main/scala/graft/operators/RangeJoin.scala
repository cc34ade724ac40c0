package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large × large RANGE (interval) joins by GRID BUCKETING — the scale
  * path q37's scaladoc promises. Spark plans a non-equi join as a
  * BroadcastNestedLoopJoin when one side broadcasts, and a cartesian
  * O(N·M) disaster when neither does; engines with native range joins
  * (Databricks' range-join hint, postgres GiST) all implement the same
  * idea this operator spells out on plain Spark:
  *
  * overlay a uniform grid of width `bucketWidth` on the join dimension,
  * assign each POINT row to its cell, replicate each INTERVAL row to the
  * cells its [lo, hi) span overlaps (ceil((hi-lo)/w)+1 copies — bounded
  * replication, choose w near the typical interval length), equi-join on
  * the cell key (hash shuffle both sides — no broadcast, no NLJ), and
  * re-check the exact predicate to discard same-cell non-overlaps.
  *
  * Cost model at 100 TB: shuffle = |points| + |intervals|·avg_span/w
  * rows on a dense integer key, then a hash join per cell — vs N·M
  * predicate evaluations for the nested loop. Skewed cells (one hot
  * grid cell) are ordinary join skew: AQE skew-split or q14 salting
  * applies unchanged because the join is now an equi-join.
  *
  * For interval × interval overlap joins use [[overlapJoin]]: both sides
  * replicate to their spans' cells, dedup on the pair key (an
  * overlapping pair meets in every shared cell; `groupBy` the pair keys
  * or dedup downstream).
  */
object RangeJoin {

  /** Data-derived bucket width: ~the 75th-percentile interval span, so
    * a typical interval replicates to ≤2 cells and a typical cell meets
    * few intervals. Callers with domain knowledge (calendar days, price
    * bands) should pass their natural width instead; this is the
    * stats-based default for unknown span distributions (one approx-
    * quantile pass over the SPANS only — no payload read). */
  def autoWidth(intervals: DataFrame, lo: Column, hi: Column): Double = {
    val q = intervals.select((hi - lo).cast("double").as("__span"))
      .na.drop().stat.approxQuantile("__span", Array(0.75), 0.01)
    require(q.nonEmpty, "autoWidth needs at least one non-null interval")
    math.max(q(0), java.lang.Double.MIN_NORMAL)
  }

  /** points ⋈ intervals on `lo <= pt < hi` (half-open, the SQL band-join
    * convention). `pt`, `lo`, `hi` are expressions over the respective
    * inputs; both frames may be arbitrarily large. Output columns =
    * points ++ intervals (caller projects).
    *
    * `equiKeys` names columns present on BOTH sides that must also match
    * (the SCD2 point-in-time shape: `dim_key` equal AND date in
    * validity). They JOIN rather than post-filter, so the shuffle key is
    * (cell, keys) and a cell shared by a million keys hashes apart
    * instead of pairing up — without them the per-cell candidate set is
    * the full cross of both sides' cell residents. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pt: Column, lo: Column, hi: Column, bucketWidth: Double,
      equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val cellOfPt = floor(pt / lit(bucketWidth))
    val p = points.withColumn("__cell", cellOfPt)
    // interval [lo, hi) overlaps cells floor(lo/w) .. floor(hi/w) (hi
    // exclusive, but a point equal to hi's cell start still shares the
    // cell floor((hi-ε)/w) ≤ floor(hi/w) — one extra copy, re-checked)
    val i = intervals.withColumn("__cell",
      explode(sequence(floor(lo / lit(bucketWidth)),
        floor(hi / lit(bucketWidth)))))
    p.join(i, "__cell" +: equiKeys)
      .filter(lo <= pt && pt < hi)
      .drop("__cell")
  }

  /** intervals ⋈ intervals on span overlap ([aLo, aHi) ∩ [bLo, bHi) ≠ ∅).
    * Pairs meeting in several shared cells are emitted ONCE: the match is
    * kept only in the FIRST shared cell (max of the two span starts'
    * cells) — the standard dedup trick that keeps the join spill-free
    * instead of a distinct over the full output. */
  def overlapJoin(a: DataFrame, b: DataFrame,
      aLo: Column, aHi: Column, bLo: Column, bHi: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val ra = a.withColumn("__cell",
      explode(sequence(floor(aLo / w), floor(aHi / w))))
    val rb = b.withColumn("__cell",
      explode(sequence(floor(bLo / w), floor(bHi / w))))
    ra.join(rb, "__cell")
      .filter(aLo < bHi && bLo < aHi)
      // emit only in the first cell both spans occupy
      .filter(col("__cell") === greatest(floor(aLo / w), floor(bLo / w)))
      .drop("__cell")
  }
}
