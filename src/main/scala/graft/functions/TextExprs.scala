package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the corpus-hashing hot paths.
  *
  * Why: the higher-order-function formulations (4 × `transform(md5(...))`
  * chains for the MinHash signature; per-window `transform(sequence(...),
  * md5(substr(...)))` + `array_sort` for the rolling fingerprint) are
  * correct but costly in two ways at once: every lambda element is an
  * interpreted call, and the generated projection code is large enough
  * that C2 compilation of it dominated one-shot bench runs (8-36 s of JIT
  * per query, see PLANS.md round 2). Each expression below is one tight
  * Java loop behind a single static call — tiny generated code, no
  * per-element interpretation — computing BYTE-IDENTICAL results to the
  * built-in formulation, so the DuckDB oracles are unchanged.
  */
object TextNative {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MinHash signature: 16 8-hex-char minhashes from 4 seeded md5s per
    * element (seed-major, chunk-minor order), replicating exactly
    * `array_min(transform(sh, e => substring(md5(concat(lit(s"$seed:"), e)),
    * 1 + 8*c, 8)))` for seed, c in 0..3. Empty input → 16 nulls (array_min
    * of an empty array is null); null elements are skipped like array_min
    * skips nulls. */
  def minhashSig(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[String](16)
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val e = sh.getUTF8String(i).getBytes
        var seed = 0
        while (seed < 4) {
          val prefixed = new Array[Byte](e.length + 2)
          prefixed(0) = ('0' + seed).toByte
          prefixed(1) = ':'
          System.arraycopy(e, 0, prefixed, 2, e.length)
          val hex = md5Hex(prefixed)
          var c = 0
          while (c < 4) {
            val cand = hex.substring(8 * c, 8 * c + 8)
            val idx = seed * 4 + c
            if (mins(idx) == null || cand.compareTo(mins(idx)) < 0)
              mins(idx) = cand
            c += 1
          }
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
        .asInstanceOf[Array[Any]])
  }

  /** Word k-shingles from a token array, replicating the staggered-slice
    * + zip_with formulation element-for-element. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i < n - k + 1) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var anyNull = false
      while (j < k) {
        if (j > 0) sb.append(' ')
        if (toks.isNullAt(i + j)) anyNull = true
        else sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      // a null token nulls the shingle, like concat() in the HOF form
      out(i) = if (anyNull) null else UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rolling-hash fingerprint: md5 over every `width`-char window of
    * `text`, fingerprint = `k` smallest hex strings (duplicates kept)
    * joined with "|" — replicating exactly `concat_ws("|",
    * slice(array_sort(transform(sequence(1, greatest(length(text)-width+1,
    * 1)), i => md5(substr(text, i, width)))), 1, k))`. */
  def rollingFp(text: UTF8String, width: Int, k: Int): UTF8String = {
    val n = math.max(text.numChars() - (width - 1), 1)
    val top = new Array[String](k)
    var filled = 0
    var i = 0
    while (i < n) {
      // substringSQL is 1-based and clamps at the end like substr
      val window = text.substringSQL(i + 1, width)
      val hex = md5Hex(window.getBytes)
      // insertion into the sorted top-k (k is tiny)
      if (filled < k) {
        top(filled) = hex
        filled += 1
        var j = filled - 1
        while (j > 0 && top(j).compareTo(top(j - 1)) < 0) {
          val t = top(j); top(j) = top(j - 1); top(j - 1) = t
          j -= 1
        }
      } else if (hex.compareTo(top(k - 1)) < 0) {
        top(k - 1) = hex
        var j = k - 1
        while (j > 0 && top(j).compareTo(top(j - 1)) < 0) {
          val t = top(j); top(j) = top(j - 1); top(j - 1) = t
          j -= 1
        }
      }
      i += 1
    }
    UTF8String.fromString(top.take(filled).mkString("|"))
  }
}

/** `array<string>` tokens → word k-shingles ("a b c" for k=3), one loop.
  * Replicates TextFns.shingles (k staggered slices + zip_with concat):
  * fewer than k tokens → empty array; null elements joined as the slices
  * would (never occurs for tokenizer output, which drops nulls). */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(toks: Any): Any =
    TextNative.shingles(toks.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative.shingles($c, $k)")
  override protected def withNewChildInternal(
      newChild: Expression): ShinglesExpr = copy(child = newChild)
}

/** `array<string>` shingle set → 16-element MinHash signature. */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(sh: Any): Any =
    TextNative.minhashSig(sh.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNative.minhashSig($c)")
  override protected def withNewChildInternal(
      newChild: Expression): MinhashSigExpr = copy(child = newChild)
}

/** Text → rolling-md5 fingerprint string (k smallest window hashes). */
case class RollingFpExpr(child: Expression, width: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp requires string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any): Any =
    TextNative.rollingFp(text.asInstanceOf[UTF8String], width, k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNative.rollingFp($c, $width, $k)")
  override protected def withNewChildInternal(
      newChild: Expression): RollingFpExpr = copy(child = newChild)
}

object TextExprs {
  def minhashSig(sh: Column): Column =
    Bridge.toColumn(MinhashSigExpr(Bridge.toExpression(sh)))
  def rollingFp(text: Column, width: Int, k: Int): Column =
    Bridge.toColumn(RollingFpExpr(Bridge.toExpression(text), width, k))
  def shingles(toks: Column, k: Int): Column =
    Bridge.toColumn(ShinglesExpr(Bridge.toExpression(toks), k))
}
