package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All B Poisson-bootstrap replicate weights from one concatenated md5
  * hex string in a single native pass: replicate r (0-based) reads hex
  * chars 2r and 2r+1, and each char contributes
  * `[value &lt; 4] + [value mod 4 == 0]` — two Bernoulli(1/4) bit-pair
  * trials — so the element is an exact Binomial(4, 1/4) draw in 0..4.
  *
  * Bit-identical to (and replacing) the per-replicate
  * `substr -&gt; substring -&gt; isin('0','1','2','3') +
  * isin('0','4','8','c')` column chain in q225: that layout re-ran ~10
  * interpreted string ops per (row, replicate) — B×row times per
  * corpus — where this pass reads each of the 2B hash bytes exactly
  * once and emits the weight vector for a map-side `posexplode`.
  */
case class BootstrapWeights(child: Expression, b: Int)
  extends UnaryExpression {

  require(b >= 1, "bootstrap_weights: b must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bootstrap_weights"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    require(bytes.length >= 2 * b,
      s"bootstrap_weights: need ${2 * b} hex chars, got ${bytes.length}")
    val out = new Array[Long](b)
    var r = 0
    while (r < b) {
      var w = 0L
      var j = 2 * r
      val end = j + 2
      while (j < end) {
        val c = bytes(j)
        // lowercase md5 hex: '0'-'9' -> 0-9, 'a'-'f' -> 10-15
        val v = if (c <= '9') c - '0' else c - 'a' + 10
        if (v < 4) w += 1L       // top bit-pair zero  <=> char in 0-3
        if ((v & 3) == 0) w += 1L // bottom bit-pair zero <=> char in 0,4,8,c
        j += 1
      }
      out(r) = w
      r += 1
    }
    new GenericArrayData(out)
  }

  // real codegen (not CodegenFallback): a fallback here would knock the
  // whole ×B Generate stage out of whole-stage codegen, forcing the 6M+
  // exploded rows through interpreted projection — measured ~2.3 s of
  // q225's 3 s at sf0.1
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      s"""
      byte[] $bytes = $c.getBytes();
      if ($bytes.length < ${2 * b}) {
        throw new IllegalArgumentException(
          "bootstrap_weights: need ${2 * b} hex chars, got " + $bytes.length);
      }
      long[] $out = new long[$b];
      for (int $r = 0; $r < $b; $r++) {
        long $w = 0L;
        for (int $j = 2 * $r; $j < 2 * $r + 2; $j++) {
          int $v = $bytes[$j] <= '9' ? $bytes[$j] - '0' : $bytes[$j] - 'a' + 10;
          if ($v < 4) $w++;
          if (($v & 3) == 0) $w++;
        }
        $out[$r] = $w;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(c: Expression): BootstrapWeights =
    copy(child = c)
}

object BootstrapWeights {
  def bootstrap_weights(c: Column, b: Int): Column =
    GraftBridge.toColumn(BootstrapWeights(GraftBridge.toExpr(c), b))
}
