package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions for SQL use:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql config: spark.sql.extensions=graft.plans.GraftExtensions
  * spark.sql("SELECT dot_product(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * This is the (c)-tier extension point from the build contract
  * (SparkSessionExtensions); graft needs no custom planner strategies for
  * parity (SURVEY §4 conclusion) so only expressions are injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Register everything on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
}
