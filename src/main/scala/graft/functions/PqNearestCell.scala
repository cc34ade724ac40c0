package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-codebook-cell assignment for product quantization: given a
  * subvector and its subspace index, return the cell whose centroid
  * minimizes squared L2 — computed as argmax of (v·c − |c|²/2), ties to
  * the LOWEST cell id (identical to ProductQuantizer's original
  * row_number(ORDER BY score DESC, cell ASC) = 1 selection).
  *
  * Why an Expression and not a join: the codebook is driver-sized by
  * definition (m·k centroids of dims/m floats — a few KB), but the
  * relational argmin fanned every (vector, sub) row out ×k through a
  * broadcast join and then reduced it back through a sort/aggregate —
  * N·m·k intermediate rows shuffled or sorted per fit round and per
  * encode pass (the round-16 before-plan's dominant cost). Embedding the
  * codebook as a literal turns assignment into ONE tight per-row loop
  * (k·width multiply-adds), whole-stage-codegen'd, zero fan-out, zero
  * exchange — the same play as DotProduct replacing per-element lambdas.
  *
  * Float semantics are bit-identical to the join form: each dot is the
  * same sequential left-to-right double accumulation DotProduct computes,
  * and the half-norms are precomputed with that same fold (see
  * ProductQuantizer.toArrays), so score comparisons — and therefore cell
  * assignments — cannot drift.
  *
  * `cents(sub)(cell)` is the centroid; `halves(sub)(cell)` its |c|²/2.
  * Both arrays ride the closure into generated code via addReferenceObj.
  */
case class PqNearestCell(left: Expression, right: Expression,
    cents: Array[Array[Array[Float]]], halves: Array[Array[Double]])
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == IntegerType &&
      (right.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"pq_nearest_cell requires (int, array<float>), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = IntegerType

  @inline private def assign(sub: Int, v: ArrayData): Int =
    PqNearestCell.assign(cents(sub), halves(sub), v)

  override def nullSafeEval(s: Any, a: Any): Any =
    assign(s.asInstanceOf[Int], a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents,
      "float[][][]")
    val halvesRef = ctx.addReferenceObj("pqHalves", halves,
      "double[][]")
    nullSafeCodeGen(ctx, ev, (s, a) => {
      s"""
         |${ev.value} = graft.functions.PqNearestCell.assignJava(
         |  $centsRef[$s], $halvesRef[$s], $a);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestCell =
    copy(left = newLeft, right = newRight)
}

object PqNearestCell {
  /** Tight argmax loop shared by interpreted and generated code paths. */
  def assignJava(cents: Array[Array[Float]], halves: Array[Double],
      v: ArrayData): Int = assign(cents, halves, v)

  def assign(cents: Array[Array[Float]], halves: Array[Double],
      v: ArrayData): Int = {
    var best = Double.NegativeInfinity
    var bestCell = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * cv(i).toDouble
        i += 1
      }
      val score = acc - halves(c)
      // strictly-greater keeps the earliest (lowest) cell on ties —
      // the row_number(score DESC, cell ASC) = 1 tiebreak
      if (score > best) { best = score; bestCell = c }
      c += 1
    }
    bestCell
  }

  def apply(sub: Column, vec: Column, cents: Array[Array[Array[Float]]],
      halves: Array[Array[Double]]): Column =
    Bridge.toColumn(PqNearestCell(Bridge.toExpression(sub),
      Bridge.toExpression(vec), cents, halves))
}
