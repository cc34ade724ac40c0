package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history: merge a full dimension
  * snapshot into a versioned history table where each key carries
  * (valid_from, valid_to] ranges and `valid_to IS NULL` marks the current
  * version — the warehouse-standard way to keep dimension attributes
  * queryable AS OF any past date (the reference's dims are Type 1
  * overwrite-only; Type 2 is the missing half of the dimension family,
  * and q28's as-of join is exactly how facts would look versions up).
  *
  * Scale shape: ONE full-outer join of current rows vs the snapshot on
  * the key (both sides shuffle on the key once — at 100 TB both are
  * dimension-sized, orders of magnitude under the facts), attribute
  * comparison via null-safe equality, and the closed history is appended
  * untouched (never rejoined). Deterministic: no RNG, row identity is
  * (key, valid_from).
  */
object Scd2 {

  /** First load: every snapshot row opens at `asOf`. */
  def init(snapshot: DataFrame, asOf: java.sql.Timestamp): DataFrame =
    snapshot
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("timestamp"))

  /** Merge `snapshot` (the complete dimension as of `asOf`) into
    * `history`: unchanged keys stay open; changed keys close the old
    * version at `asOf` and open the new one; keys absent from the
    * snapshot close (soft delete); new keys open. Re-merging the same
    * snapshot is a no-op. */
  def merge(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
            asOf: java.sql.Timestamp): DataFrame = {
    val attrs = snapshot.columns.filterNot(keys.contains).toSeq
    val closed = history.filter(col("valid_to").isNotNull)
    val current = history.filter(col("valid_to").isNull)
      .withColumn("__c", lit(1))
    val snapR = attrs.foldLeft(snapshot)((df, c) =>
      df.withColumnRenamed(c, s"${c}__new"))
      .withColumn("__s", lit(1))

    val cmp = current.join(snapR, keys, "full_outer")
    val same = attrs.map(c => col(c) <=> col(s"${c}__new"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val inBoth = col("__c").isNotNull && col("__s").isNotNull

    val keep = Seq("valid_from", "valid_to")
    // unchanged current rows pass through open
    val unchanged = cmp.filter(inBoth && same)
      .select((keys ++ attrs ++ keep).map(col): _*)
    // changed or deleted: close the old version at asOf
    val closedNow = cmp
      .filter(col("__c").isNotNull && (col("__s").isNull || !same))
      .select((keys ++ attrs :+ "valid_from").map(col): _*)
      .withColumn("valid_to", lit(asOf))
    // changed or brand-new: open the snapshot version at asOf
    val opened = cmp
      .filter(col("__s").isNotNull && (col("__c").isNull || !same))
      .select((keys.map(col) ++
        attrs.map(c => col(s"${c}__new").as(c))): _*)
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("timestamp"))

    closed.select((keys ++ attrs ++ keep).map(col): _*)
      .unionByName(unchanged)
      .unionByName(closedNow)
      .unionByName(opened)
  }

  /** The dimension as of `ts`: the version whose validity covers it. */
  def asOf(history: DataFrame, ts: java.sql.Timestamp): DataFrame =
    history.filter(col("valid_from") <= lit(ts) &&
      (col("valid_to").isNull || col("valid_to") > lit(ts)))
}
