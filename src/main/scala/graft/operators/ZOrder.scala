package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) curve utilities: map N numeric dimensions onto one
  * space-filling-curve key whose sort order preserves multi-dimensional
  * locality. Sorting files by the z-value gives every file a narrow range
  * in EVERY clustered dimension (not just the leading one, as a
  * lexicographic sort does), so parquet row-group min/max stats prune
  * scans filtered on ANY of the dimensions — the standard multi-dim
  * layout technique for 100 TB tables (Delta/Iceberg expose the same idea
  * as OPTIMIZE ZORDER BY).
  *
  * Everything is pure column arithmetic (shift/mask/or) — codegen'd,
  * deterministic, no UDF.
  */
object ZOrder {

  /** Scale a numeric column into the [0, 2^bits) integer grid given its
    * (collected-to-literal) min/max. Degenerate ranges map to 0. */
  def scale(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(mask), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(mask.toDouble))
        .cast("long")))
  }

  /** Interleave the low `bits` bits of already-scaled non-negative integer
    * columns into one Morton key: bit j of dimension k lands at position
    * j*N + (N-1-k), so dims.head owns the most-significant bit of each
    * group (bits*N must fit a long: N ≤ 64/bits). */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits exceeds a long")
    val n = dims.size
    dims.zipWithIndex.flatMap { case (d, k) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(d, j).bitwiseAND(lit(1L)), j * n + (n - 1 - k))
      }
    }.reduce(_ bitwiseOR _)
  }
}
