package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark implementation plus (usually) a DuckDB
  * oracle SQL string the driver hash-compares against.
  *
  * Determinism contract (SURVEY.md §7.4):
  *  - every query ends in a total-order sort over a unique key set;
  *  - oracle ORDER BY always spells NULLS FIRST/LAST explicitly where a
  *    sort key is nullable (DuckDB defaults to NULLS LAST on ASC, Spark to
  *    NULLS FIRST);
  *  - double aggregates: INPUT columns (all clean ≤2-decimal values in the
  *    test data) are cast to DECIMAL(12,2) BEFORE any arithmetic, so every
  *    product/sum is exact and order-independent in both engines; one final
  *    correctly-rounded cast back to DOUBLE. Casting computed doubles to
  *    decimal is NOT safe (engines round double→decimal differently);
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Dsl {
  /** Exact decimal view of a clean ≤2-decimal-digit double column
    * (money, quantity, rate). The double→DECIMAL(12,2) conversion is exact
    * in both engines because the stored double is the nearest double to a
    * 2-decimal value. */
  def d2(c: Column): Column = c.cast(DecimalType(12, 2))
  def d2Sql(e: String): String = s"CAST(($e) AS DECIMAL(12,2))"

  /** Exact decimal view of a rate-like column in [0, 10) with ≤2 decimals
    * (discount, tax). Narrow so products stay under DECIMAL(38,*) in both
    * engines. */
  def dr(c: Column): Column = c.cast(DecimalType(4, 2))
  def drSql(e: String): String = s"CAST(($e) AS DECIMAL(4,2))"

  /** Order-insensitive, engine-exact sum of a clean double column. */
  def decSum(c: Column): Column = sum(d2(c)).cast("double")
  def decSumSql(e: String): String =
    s"CAST(SUM(${d2Sql(e)}) AS DOUBLE)"

  /** Exact sum of an already-exact decimal expression (products of d2
    * columns etc.), cast once to double. */
  def decSumExpr(e: Column): Column = sum(e).cast("double")
  def decSumExprSql(e: String): String = s"CAST(SUM($e) AS DOUBLE)"

  /** Deterministic average: exact decimal sum, one double division. */
  def decAvg(c: Column): Column = decSum(c) / count(c).cast("double")
  def decAvgSql(e: String): String =
    s"(${decSumSql(e)} / CAST(COUNT($e) AS DOUBLE))"

  /** Null-guarded ratio of two bigint counts as double. */
  def rate(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(num.cast("double") / den.cast("double"))
  def rateSql(num: String, den: String): String =
    s"(CASE WHEN ($den) = 0 THEN NULL ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END)"
}
