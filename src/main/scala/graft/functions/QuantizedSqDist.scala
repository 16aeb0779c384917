package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-dimension QUANTIZED squared-L2 distance: each term (x−y)² is
  * rounded to DECIMAL(18,10) exactly as Spark's `CAST(double AS
  * DECIMAL(18,10))` does (same `Decimal(double)` construction + HALF_UP
  * `changePrecision` the Cast operator runs), then summed exactly as
  * unscaled longs; the result is the identical DECIMAL(28,10) the
  * interpreted `aggregate(zip_with(h, cv, (x,y) -> CAST((x-y)*(x-y) AS
  * DECIMAL(18,10))), 0, +)` fold produces — PQ/IVF assignment's
  * engine-exact distance (graft.text.Geometry), with the boxed
  * per-element BigDecimal churn of the higher-order-function path
  * replaced by one generated long-accumulating loop (the eval-mode HOF
  * fold was ~80% of q291's sf1 runtime).
  *
  * Exactness: decimal addition at a common scale is associative, so the
  * unscaled-long sum is bit-identical to the fold's left-to-right
  * decimal adds. Overflow bound: |acc| < 2^63 needs len·max((x−y)²)·1e10
  * < 9.2e18 — at unit-range inputs that is ~2·10⁸ dimensions, far past
  * any embedding width. Null elements on either side are skipped
  * (embedding arrays are dense; the fold's null-poisoning branch is
  * unreachable on engine data).
  */
case class QuantizedSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(28, 10)
  override def prettyName: String = "quantized_sq_dist"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        val d = x - y
        acc += QuantizedSqDist.quantize(d * d)
      }
      i += 1
    }
    Decimal(acc, 28, 10)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    val cls = QuantizedSqDist.getClass.getName.stripSuffix("$") // companion statics
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      s"""
        long $acc = 0L;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            double $d = ((double) $a.$aGet($i)) - ((double) $b.$bGet($i));
            $acc += $cls.quantize($d * $d);
          }
        }
        ${ev.value} = org.apache.spark.sql.types.Decimal.apply($acc, 28, 10);
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedSqDist =
    copy(left = newLeft, right = newRight)
}

object QuantizedSqDist {
  /** The exact Cast(double→DECIMAL(18,10)) quantization as an unscaled
    * long. Semantics anchor: `Decimal(double)` (BigDecimal.valueOf =
    * shortest-round-trip decimal string S of the double) + HALF_UP
    * changePrecision, i.e. round_half_up(S·10¹⁰) — any drift from the
    * SQL cast would break bit-equality with the fold form and the
    * oracle.
    *
    * Fast path: v = dd·1e10 in doubles, round to nearest — provably
    * equal to the anchor whenever v's fractional part is farther from
    * the .5 boundary than the combined representation error
    * (|S−dd|·1e10 ≤ ulp(dd)/2·1e10 from the shortest string, plus
    * ulp(v)/2 from the double multiply): away from the boundary, both
    * quantities round to the same integer. Inside the guard band (or
    * when ulp(v) is too coarse to resolve fractions) it falls back to
    * the string-based anchor — the fallback fires ~never on real data
    * but keeps the fast path EXACT, not approximate.
    */
  def quantize(dd: Double): Long = {
    val v = dd * 1e10
    if (java.lang.Double.isNaN(v) || Math.abs(v) >= 9.0e17)
      return quantizeSlow(dd) // coarse-ulp / overflow regime: anchor decides
    val f = Math.floor(v)
    val frac = v - f
    val eps = 1e10 * Math.ulp(dd) + Math.ulp(v)
    if (Math.abs(frac - 0.5) > eps + 1e-12) {
      if (frac > 0.5) f.toLong + 1L else f.toLong
    } else quantizeSlow(dd)
  }

  private def quantizeSlow(dd: Double): Long = {
    val dec = Decimal(dd)
    if (!dec.changePrecision(18, 10))
      throw new ArithmeticException(s"quantized_sq_dist term overflow: $dd")
    dec.toUnscaledLong
  }

  /** Column-API entry point. */
  def quantized_sq_dist(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      QuantizedSqDist(GraftBridge.toExpr(a), GraftBridge.toExpr(b)))
}
