package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native loops for BPE (byte-pair-encoding) vocabulary training — the
  * merge-apply step has no clean higher-order-function spelling (merging
  * ADJACENT array elements needs a stateful scan; `aggregate` over a
  * struct accumulator interprets per element and generates large code),
  * so it is one tight Java loop behind a static call, same pattern as
  * [[TextNative]].
  */
object BpeNative {

  /** One greedy left-to-right merge pass: every adjacent (a, b) becomes
    * the single symbol a+b. The standard BPE apply step (Sennrich et al.
    * 2016): after "aaa" with merge (a,a) → ["aa","a"], never ["a","aa"]. */
  def mergePass(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[Any](n)
    var i = 0
    var m = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(a)) {
        val nxt = syms.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(b)) {
          out(m) = UTF8String.concat(a, b)
          m += 1
          i += 2
        } else { out(m) = cur; m += 1; i += 1 }
      } else { out(m) = cur; m += 1; i += 1 }
    }
    if (m == n) syms.copy()
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], m))
  }

  /** Encode a word with an ordered merge list: split to chars + "</w>",
    * then apply each merge in training order. Merge count is bounded by
    * the trained vocab, so cost per word is O(merges · len). */
  def encodeWord(word: UTF8String, merges: Array[UTF8String]): ArrayData = {
    val s = word.toString
    var syms: Array[String] = new Array[String](s.length + 1)
    var i = 0
    while (i < s.length) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
    syms(s.length) = "</w>"
    var mi = 0
    while (mi < merges.length) {
      val m = merges(mi).toString
      val sp = m.indexOf(' ')
      val a = m.substring(0, sp)
      val b = m.substring(sp + 1)
      val ab = a + b
      var n = syms.length
      if (n >= 2) {
        val out = new Array[String](n)
        var j = 0
        var k = 0
        while (j < n) {
          if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
            out(k) = ab; k += 1; j += 2
          } else { out(k) = syms(j); k += 1; j += 1 }
        }
        if (k != n) syms = java.util.Arrays.copyOf(out, k)
      }
      mi += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): AnyRef))
  }
}

/** `array<string>` symbols → symbols with adjacent (a, b) merged. */
case class BpeMergeExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(syms: Any): Any =
    BpeNative.mergePass(syms.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", UTF8String.fromString(a))
    val bRef = ctx.addReferenceObj("bpeB", UTF8String.fromString(b))
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeNative.mergePass($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeExpr = copy(child = newChild)
}

/** `string` word → BPE tokens under an ordered merge list ("a b" strings;
  * symbols never contain spaces, so the single-space split is lossless). */
case class BpeEncodeExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  @transient private lazy val mergeArr: Array[UTF8String] =
    merges.map(UTF8String.fromString).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(word: Any): Any =
    BpeNative.encodeWord(word.asInstanceOf[UTF8String], mergeArr)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeNative.encodeWord($c, $ref)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr = copy(child = newChild)
}

object BpeExprs {
  def mergePass(syms: Column, a: String, b: String): Column =
    Bridge.toColumn(BpeMergeExpr(Bridge.toExpression(syms), a, b))
  def encode(word: Column, merges: Seq[String]): Column =
    Bridge.toColumn(BpeEncodeExpr(Bridge.toExpression(word), merges))
}
