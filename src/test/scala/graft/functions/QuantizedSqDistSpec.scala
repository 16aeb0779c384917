package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native quantized_sq_dist must be bit-identical to the interpreted
  * `aggregate(zip_with(...))` decimal fold it replaced in PQ/IVF
  * assignment (graft.text.Geometry) — same per-term CAST AS
  * DECIMAL(18,10) quantization, same exact sum — and its long fast path
  * must agree with the string-anchored Cast semantics everywhere,
  * including adversarial values parked near scale-10 rounding
  * boundaries.
  */
class QuantizedSqDistSpec extends SparkSpec {
  import spark.implicits._
  import QuantizedSqDist.quantized_sq_dist

  private val foldSql =
    """aggregate(zip_with(a, b, (x, y) ->
      |    CAST((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)
      |         AS DECIMAL(18,10))),
      |  CAST(0 AS DECIMAL(28,10)),
      |  (acc, v) -> CAST(acc + v AS DECIMAL(28,10)))""".stripMargin

  test("quantized_sq_dist equals the interpreted decimal fold bit-for-bit") {
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Seq.tabulate(64)(d => ((i * 31 + d * 7) % 97).toFloat / 97f - 0.5f),
        Seq.tabulate(64)(d => ((i * 17 + d * 13) % 89).toDouble / 89.0 - 0.5))
    }.toDF("id", "a", "b")
    val both = rows.select(
      quantized_sq_dist(col("a"), col("b")).as("native"),
      expr(foldSql).as("fold")).collect()
    both.foreach { r =>
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) == 0,
        s"mismatch: ${r.getDecimal(0)} vs ${r.getDecimal(1)}")
    }
  }

  test("distance to the zero vector equals the squared-norm decimal fold (q279 seed)") {
    // q279's round-1 seed ranks by the exact decimal squared norm; the
    // rewrite computes it as quantized_sq_dist(e, zeros). x−0.0 == x
    // bit-exactly for every finite float (and (−0.0)² == 0.0), so every
    // per-term quantize sees the identical double as the norm fold's
    // CAST(x·x AS DECIMAL(18,10)).
    val normFold =
      """aggregate(a, CAST(0 AS DECIMAL(28,10)),
        |  (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |                             AS DECIMAL(18,10)) AS DECIMAL(28,10)))"""
        .stripMargin
    val rows = ((0 until 200).map { i =>
      (i.toLong,
        Seq.tabulate(64)(d => ((i * 31 + d * 7) % 97).toFloat / 97f - 0.5f))
    } :+ ((200L, Seq(-0.0f, 0.0f, Float.MinPositiveValue, -1.5f)))).toDF("id", "a")
    val both = rows.select(
      quantized_sq_dist(col("a"),
        array_repeat(lit(0.0d), size(col("a")))).as("native"),
      expr(normFold).as("fold")).collect()
    both.foreach { r =>
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) == 0,
        s"mismatch: ${r.getDecimal(0)} vs ${r.getDecimal(1)}")
    }
  }

  test("the long fast path agrees with the Cast anchor on boundary-adjacent terms") {
    // k + 0.5 half-way points at scale 10, the exact .5, and values one
    // double-ulp to each side — the band where the fast path must defer
    // to the string-based anchor rather than guess.
    val seeds = Seq(0.0, 1e-10, 0.5e-10, 1.5e-10, 0.00000000005,
      0.12345678765, 1.0000000000499999, 1.00000000005, 1.3333333333,
      0.1, 1.0 / 3.0, 2.0 / 3.0, 0.7499999999999, 89.99999999995)
    val vals = seeds.flatMap(v => Seq(v, Math.nextUp(v), Math.nextDown(v)))
    vals.foreach { v =>
      val dd = v // quantize sees the already-squared term; drive it directly
      val anchor = {
        val dec = org.apache.spark.sql.types.Decimal(dd)
        assert(dec.changePrecision(18, 10))
        dec.toUnscaledLong
      }
      assert(QuantizedSqDist.quantize(dd) == anchor,
        s"fast path diverged from Cast anchor at $dd")
    }
  }
}
