package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) math over `array<float>` columns, built from
  * codegen'd higher-order functions — no UDFs, no driver loops.
  *
  * Determinism design: every reduction is a SEQUENTIAL left-to-right double
  * fold (`aggregate` starts at 0.0 and adds elements in array order), which
  * DuckDB mirrors exactly with `list_reduce` — same element order, same
  * IEEE double ops, bit-identical results. Do NOT route these through
  * decimal casts: converting full-precision doubles to decimal rounds
  * differently across engines (Spark rounds the shortest decimal
  * representation, DuckDB the exact binary expansion).
  *
  * Scale notes: these are narrow per-row (or per-pair) expressions. The
  * pairing strategy around them decides scale: brute-force top-k is a
  * broadcast-join of the (small) query set against the corpus — no shuffle
  * of the big side; bucketed LSH/IVF variants shuffle only on short bucket
  * keys (see SimilarityQ).
  */
object VectorFns {

  /** Sequential left-to-right sum of an array<double>. (Kept for generic
    * arrays; vector hot paths use the native DotProduct expression.) */
  def seqSum(xs: Column): Column =
    aggregate(xs, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float arrays: native Catalyst expression (tight
    * loop, codegen'd) computing the same in-order double accumulation as
    * zip_with+aggregate — see DotProduct for why. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** L2 norm. sqrt is correctly rounded → engine-portable. */
  def norm(a: Column): Column = sqrt(DotProduct(a, a))

  /** Cosine similarity; null if either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0 || nb === 0, lit(null)).otherwise(d / (na * nb))
  }

  /** Axis-aligned LSH bucket key: sign bits of the vector at `dims`
    * positions (0-based), e.g. "1011…". Deterministic, engine-portable, and
    * a genuine random-hyperplane LSH when dims are fixed a priori. */
  def signBucket(a: Column, dims: Seq[Int]): Column =
    concat(dims.map(d =>
      when(a.getItem(d) >= 0, lit("1")).otherwise(lit("0"))): _*)
}
