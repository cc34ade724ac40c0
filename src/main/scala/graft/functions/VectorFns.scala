package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector (embedding) math over `array<float>` columns, built from
  * codegen'd higher-order functions — no UDFs, no driver loops.
  *
  * Determinism design: IEEE double multiply/divide/sqrt of identical inputs
  * is bit-identical across engines, but SUM ORDER is not — so every
  * reduction goes through an exact DECIMAL(38,18) accumulator (addition is
  * associative there), then one correctly-rounded cast back to double.
  * That makes cosine similarity hash-comparable against a DuckDB oracle and
  * invariant to Spark's partial-aggregation order at any parallelism.
  *
  * Scale notes: these are narrow per-row (or per-pair) expressions. The
  * pairing strategy around them decides scale: brute-force top-k is a
  * broadcast-join of the (small) query set against the corpus — no shuffle
  * of the big side; bucketed LSH/IVF variants shuffle only on short bucket
  * keys (see SimilarityQ).
  */
object VectorFns {

  private val Dec = DecimalType(38, 18)

  /** Exact sum of an array<double> via decimal accumulation → double. */
  def decArraySum(xs: Column): Column =
    aggregate(xs, lit(0).cast(Dec), (acc, x) => acc + x.cast(Dec))
      .cast("double")

  /** Dot product of two float arrays (element-wise double products, exact
    * decimal sum). */
  def dot(a: Column, b: Column): Column =
    decArraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. sqrt is correctly rounded → engine-portable. */
  def norm(a: Column): Column =
    sqrt(decArraySum(transform(a, x => x.cast("double") * x.cast("double"))))

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
