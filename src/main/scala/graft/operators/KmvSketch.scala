package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-Minimum-Values distinct sketch with SET-OPERATION estimates — the
  * mergeable sketch family HLL cannot replace: an HLL union is exact, but
  * HLL has no intersection, so segment-overlap questions ("how many users
  * are in BOTH cohorts?") need either a full distinct-pair join or a
  * sketch that supports intersections. A KMV sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002; the K'th
  * Minimum Value estimator popularized by the DataSketches theta family)
  * keeps the k lexicographically smallest element hashes per group:
  *
  *  - distinct estimate  = (k-1) / R_k  where R_k is the k-th smallest
  *    hash normalized to [0,1) — here in count form
  *    (k-1) * 2^48 / v_k with v_k the first 12 hex digits of the k-th
  *    hash, so the only double op is one final division of exact ints;
  *  - union sketch       = k smallest of the concatenated sketches
  *    (mergeable, associative — partition-parallel);
  *  - intersection       = over the union's k survivors, the fraction ρ
  *    present in BOTH input sketches is an unbiased Jaccard estimate, and
  *    est∩ = ρ · est∪ (the standard theta-sketch set-algebra identity).
  *
  * Everything is DETERMINISTIC: hashes are md5 hex strings (engine-
  * portable), the k-smallest set is an order statistic, and the estimator
  * is a ratio of exact integers — so unlike HLL the estimates themselves
  * hash-match a DuckDB oracle bit-for-bit (catalog q61).
  *
  * Scale: building sketches is one shuffle of DISTINCT (group, hash)
  * pairs, and the rank-≤-k filter gets Spark's WindowGroupLimit pushdown
  * (per-partition top-k BEFORE the exchange), so the shuffle carries at
  * most k rows per group per input partition — at 100 TB the sketch table
  * is KB-sized per group and set algebra runs on sketches, never on data.
  * Sketches persist as plain arrays, so incremental corpora fold new
  * batches by re-merging (same carrier as [[SketchDistinct]] for HLL).
  *
  * Reference anchor: the reference's funnel/overlap marts recompute
  * COUNT(DISTINCT) per segment pair from scratch (dbt_project/models/
  * marts/, e.g. fact_daily_sales.sql's distinct buyers); this is the
  * sketch path that answers the same questions from KB of state.
  */
object KmvSketch {

  /** 2^48 as a double: the hash-value range of the 12-hex-digit prefix. */
  private val HashSpace = 281474976710656.0

  /** md5-hex element hash — lexicographic order == numeric order. */
  def elemHash(c: Column): Column = md5(c.cast("string"))

  /** Per-group KMV sketch over DISTINCT elements of `elem`:
    * (group, sk: k-smallest hashes ascending). The rank-≤-k filter is the
    * ONLY window, so WindowGroupLimit pushes a per-partition top-k ahead
    * of the exchange — adding any whole-partition window here (e.g. a
    * riding exact count) would force every distinct hash through the
    * shuffle and defeat the sketch. */
  def sketch(df: DataFrame, group: String, elem: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.select(col(group), elemHash(elem).as("h")).distinct()
    val w = Window.partitionBy(col(group)).orderBy(col("h").asc)
    hashes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(group))
      .agg(sort_array(collect_list(col("h"))).as("sk"))
  }

  /** [[sketch]] plus the exact distinct count per group (for gates and
    * oracles): a second map-side-combinable aggregate over the same
    * distinct pairs, joined on the group-count-sized result. */
  def sketchWithExact(df: DataFrame, group: String, elem: Column,
      k: Int): DataFrame = {
    val hashes = df.select(col(group), elemHash(elem).as("h")).distinct()
    val exact = hashes.groupBy(col(group)).agg(count(lit(1)).as("n_exact"))
    sketch(df, group, elem, k).join(exact, group)
  }

  /** Distinct estimate from a sketch array: exact size when the sketch
    * holds fewer than k hashes (we saw everything), else (k-1)·2^48/v_k.
    * `get` (0-based, null out-of-range) rather than `element_at`, which
    * under ANSI mode (the Spark 4 default) throws on a short array. */
  def estimate(sk: Column, k: Int): Column = {
    val vk = conv(substring(get(sk, lit(k - 1)), 1, 12), 16, 10).cast("double")
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / vk)
  }

  /** Merged (union) sketch of two sketch arrays: k smallest of the
    * distinct union — associative and commutative, so fold in any order. */
  def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** All within-group pairs of a (group, sk) sketch table with
    * union/intersection/Jaccard estimates — works on sketches alone
    * (e.g. a [[KmvRollup]] table where the raw data is long gone). The
    * sketch table is group-count-sized, so the self-join is broadcast-
    * trivial; no pass over the underlying data happens here — that is
    * the point. */
  def overlapEstimates(sketches: DataFrame, group: String,
      k: Int): DataFrame = {
    val a = sketches.select(col(group).as("ga"), col("sk").as("ska"))
    val b = sketches.select(col(group).as("gb"), col("sk").as("skb"))
    val u = merge(col("ska"), col("skb"), k)
    // survivors of the union sketch present in BOTH inputs
    val common = size(array_intersect(array_intersect(u, col("ska")), col("skb")))
    val estU = estimate(u, k)
    val rho = common.cast("double") / size(u).cast("double")
    a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        estU.as("est_union"),
        (rho * estU).as("est_inter"),
        rho.as("jaccard_est"))
  }

  /** Directional CONTAINMENT estimates |A∩B|/|A| and |A∩B|/|B| from
    * sketches alone — the asymmetric overlap question (d15's signal at
    * the sketch tier): is cohort A essentially a subset of cohort B?
    * est∩ comes from [[overlapEstimates]]; the denominators are the
    * per-group estimates, so everything remains deterministic ratios
    * of order statistics. */
  def containmentEstimates(sketches: DataFrame, group: String,
      k: Int): DataFrame = {
    val ests = overlapEstimates(sketches, group, k)
    val e = sketches.select(col(group), estimate(col("sk"), k).as("est"))
    ests
      .join(e.select(col(group).as("ga"), col("est").as("est_a")), "ga")
      .join(e.select(col(group).as("gb"), col("est").as("est_b")), "gb")
      .select(col("ga"), col("gb"),
        (col("est_inter") / col("est_a")).as("cont_a_in_b"),
        (col("est_inter") / col("est_b")).as("cont_b_in_a"))
  }

  /** [[overlapEstimates]] over a [[sketchWithExact]] table, with the
    * exact per-group counts riding along (n_a/n_b) for gates. */
  def pairwiseOverlap(sketches: DataFrame, group: String, k: Int): DataFrame = {
    val ests = overlapEstimates(sketches, group, k)
    val n = sketches.select(col(group), col("n_exact"))
    ests
      .join(n.select(col(group).as("ga"), col("n_exact").as("n_a")), "ga")
      .join(n.select(col(group).as("gb"), col("n_exact").as("n_b")), "gb")
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"),
        col("est_union"), col("est_inter"), col("jaccard_est"))
  }
}
