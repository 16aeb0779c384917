package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `CAST(x AS DECIMAL(18, scale))` with a fast integer path for DOUBLE
  * input — the repo-wide `graft.Num.dec` quantizer behind every exact
  * decimal sum. Spark's own Cast builds a `BigDecimal.valueOf(d)`
  * (Double.toString + parse) per row; on hot aggregates that string
  * round-trip IS the scan cost (q344's four EM passes spent most of
  * their sf1 time in it). The fast path rounds d·10^scale in double
  * space — provably equal to the string-anchored Cast outside a guard
  * band around scale-level half-way points (shortest-round-trip string
  * error ≤ ulp(d)/2, multiply error ≤ ulp(v)/2; away from a .5 boundary
  * by more than their sum, both round to the same integer, and HALF_UP
  * equals round-to-nearest off the boundary) — the QuantizedSqDist
  * argument generalized to any scale.
  *
  * Everything outside the proven regime delegates to the REAL Cast
  * expression on the same child: non-double input types entirely
  * (analysis, eval, and codegen), and per-value fallback for
  * non-finite / near-boundary / overflow-adjacent doubles — so the
  * semantics anchor is Cast itself, never a reimplementation.
  */
case class DecCast(child: Expression, scale: Int) extends UnaryExpression {

  override def dataType: DataType = DecimalType(18, scale)
  override def prettyName: String = "dec_cast"
  override def nullable: Boolean = true

  @transient private lazy val fallback: Cast = Cast(child, DecimalType(18, scale))

  private def isDouble: Boolean = child.dataType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = fallback.checkInputDataTypes()

  // error semantics mirror the fallback Cast's eval mode: LEGACY/TRY
  // yield NULL on NaN/Infinity/overflow, ANSI throws — decided once per
  // plan exactly like Cast itself decides at construction
  private lazy val nullOnError: Boolean =
    fallback.evalMode != org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI

  override def eval(input: InternalRow): Any =
    if (isDouble) {
      val v = child.eval(input)
      if (v == null) null
      else {
        val u = DecCast.quantize(v.asInstanceOf[Double], scale, nullOnError)
        if (u == null) null else Decimal(u.longValue(), 18, scale)
      }
    } else fallback.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isDouble) {
      val cls = DecCast.getClass.getName.stripSuffix("$")
      nullSafeCodeGen(ctx, ev, d => {
        val u = ctx.freshName("unscaled")
        s"""
          java.lang.Long $u = $cls.quantize($d, $scale, $nullOnError);
          if ($u == null) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = org.apache.spark.sql.types.Decimal.apply(
              $u.longValue(), 18, $scale);
          }
        """
      })
    } else fallback.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): DecCast =
    copy(child = newChild)
}

object DecCast {

  private val pow10: Array[Double] = Array.tabulate(19)(i => math.pow(10, i))

  /** Cast(double → DECIMAL(18, scale)) as a boxed unscaled long. Fast
    * path = nearest-rounding of d·10^scale with the boundary guard band
    * proved in the class doc; anything uncertain (NaN/Inf, coarse-ulp
    * regime, near-boundary, overflow-adjacent) takes the exact Decimal
    * path. NaN/Infinity/overflow follow the caller's Cast eval mode:
    * `nullOnError` (LEGACY/TRY) returns null, ANSI throws — exactly the
    * branch Cast itself takes.
    */
  def quantize(dd: Double, scale: Int, nullOnError: Boolean): java.lang.Long = {
    val v = dd * pow10(scale)
    if (java.lang.Double.isNaN(v) || Math.abs(v) >= 9.0e17)
      return quantizeSlow(dd, scale, nullOnError)
    val f = Math.floor(v)
    val frac = v - f
    val eps = pow10(scale) * Math.ulp(dd) + Math.ulp(v)
    if (Math.abs(frac - 0.5) > eps + 1e-12) {
      if (frac > 0.5) f.toLong + 1L else f.toLong
    } else quantizeSlow(dd, scale, nullOnError)
  }

  private def quantizeSlow(dd: Double, scale: Int,
      nullOnError: Boolean): java.lang.Long = {
    // NaN/Infinity → NULL in BOTH eval modes (measured: Spark 4's ANSI
    // Cast double→decimal nulls non-finite input and only throws on
    // numeric overflow)
    if (java.lang.Double.isNaN(dd) || java.lang.Double.isInfinite(dd))
      return null
    val dec = Decimal(dd)
    if (!dec.changePrecision(18, scale)) {
      if (nullOnError) return null
      throw new ArithmeticException(
        s"dec_cast overflow: $dd does not fit DECIMAL(18,$scale) (ANSI)")
    }
    dec.toUnscaledLong
  }

  /** Column-API entry point (graft.Num.dec routes through this). */
  def dec_cast(c: Column, scale: Int): Column =
    GraftBridge.toColumn(DecCast(GraftBridge.toExpr(c), scale))
}
