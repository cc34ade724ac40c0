package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static probe core: deserialize-and-estimate, with a tiny per-thread
  * memo on the sketch BYTES — the probe side of `count_min_sketch` is
  * typically "one sketch row x top-k keys", so the same byte array
  * arrives for every probe in a task and deserializing once per task
  * (not once per row) keeps the scalar expression cheap. Identity check
  * first: the memo only ever holds one entry. */
object SketchNative {
  private val last = new ThreadLocal[
    (Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]

  def cmsProbe(bytes: Array[Byte], key: Long): Long = {
    val cached = last.get()
    val cms =
      if (cached != null && (cached._1 eq bytes)) cached._2
      else {
        val fresh = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        last.set((bytes, fresh))
        fresh
      }
    cms.estimateCount(key)
  }
}

/** `cms_probe(sketch, key)` — point estimate of `key`'s count from a
  * serialized CountMinSketch (the binary Spark's own `count_min_sketch`
  * aggregate produces). This closes the SQL loop on CMS: build the
  * sketch in SQL, probe it in SQL — previously the probe was a
  * driver-side API (`CountMinSketch.estimateCount`), which kept q44
  * out of the SQL-parity surface. Deterministic: CMS counters are
  * order-insensitive additions, so equal (eps, confidence, seed) over
  * equal rows give byte-equal sketches and equal estimates. */
case class CmsProbeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"cms_probe expects (BINARY, BIGINT), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(sketch: Any, key: Any): Any =
    SketchNative.cmsProbe(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.SketchNative.cmsProbe($s, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsProbeExpr =
    copy(left = newLeft, right = newRight)
}
