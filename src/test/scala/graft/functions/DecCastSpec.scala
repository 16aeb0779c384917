package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.SparkSpec

/** graft.Num.dec's native quantizer must be bit-identical to the Cast it
  * replaced — across scales, signs, magnitudes, adversarial
  * boundary-parked values, and non-double input types (where it must
  * delegate to the real Cast wholesale).
  */
class DecCastSpec extends SparkSpec {
  import spark.implicits._
  import DecCast.dec_cast

  test("dec_cast equals CAST(double AS DECIMAL(18,s)) bit-for-bit across scales") {
    val vals = (0 until 2000).map { i =>
      val base = ((i * 2654435761L) % 1000003).toDouble / 97.0
      if (i % 2 == 0) base else -base
    } ++ Seq(0.0, -0.0, 1e11, -1e11, 123456789012.345678, 0.005, -0.005,
      2.5, -2.5, 0.125, 1.0 / 3.0, 2.0 / 3.0)
    for (s <- Seq(0, 2, 6, 10, 12)) {
      // keep each scale's inputs inside DECIMAL(18,s) range — overflow is
      // a loud error by design (engine corpora never overflow dec())
      val df = vals.filter(v => math.abs(v) < 8e17 / math.pow(10, s)).toDF("x")
      val rows = df.select(
        dec_cast(col("x"), s).as("native"),
        col("x").cast(DecimalType(18, s)).as("cast")).collect()
      rows.foreach { r =>
        assert((r.isNullAt(0) && r.isNullAt(1)) ||
          r.getDecimal(0).compareTo(r.getDecimal(1)) == 0,
          s"scale $s: ${r.get(0)} vs ${r.get(1)}")
      }
    }
  }

  test("the quantizer agrees with the Cast anchor on boundary-parked values") {
    val seeds = Seq(0.005, 0.015, 2.5, 3.5, -0.005, -2.5, 0.123455,
      1.0000005, 99999.005, 0.0000000000005, 1.5e-13)
    val vals = seeds.flatMap(v => Seq(v, Math.nextUp(v), Math.nextDown(v)))
    for (s <- Seq(2, 6, 12); v <- vals) {
      val anchor = {
        val d = org.apache.spark.sql.types.Decimal(v)
        assert(d.changePrecision(18, s)); d.toUnscaledLong
      }
      assert(DecCast.quantize(v, s, nullOnError = true) == anchor,
        s"quantize($v, $s) diverged from the Cast anchor")
    }
  }

  test("NaN / Infinity / overflow follow the session Cast semantics") {
    // measured Spark 4 ANSI Cast double→decimal: NaN/Infinity → NULL
    // (both eval modes); numeric overflow → throw under ANSI. The
    // AgglomerateSpec burrows fixture feeds NaN through dec() and
    // expects NULL — the native path must take the same branches.
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x")
    val rows = df.select(
      dec_cast(col("x"), 6).as("native"),
      col("x").cast(DecimalType(18, 6)).as("cast")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1),
        s"non-finite must null on both paths: native=${r.get(0)} cast=${r.get(1)}")
    }
    // overflow: both paths error under this session's ANSI mode
    val big = Seq(1e15).toDF("x")
    intercept[Exception](big.select(col("x").cast(DecimalType(18, 6))).collect())
    intercept[Exception](big.select(dec_cast(col("x"), 6)).collect())
  }

  test("non-double inputs delegate to the real Cast") {
    val df = Seq((1L, 7, BigDecimal("3.14159")), (2L, -9, BigDecimal("-0.005")))
      .toDF("l", "i", "d")
    val rows = df.select(
      dec_cast(col("l"), 2).as("nl"), col("l").cast(DecimalType(18, 2)).as("cl"),
      dec_cast(col("i"), 4).as("ni"), col("i").cast(DecimalType(18, 4)).as("ci"),
      dec_cast(col("d"), 2).as("nd"), col("d").cast(DecimalType(18, 2)).as("cd")).collect()
    rows.foreach { r =>
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) == 0)
      assert(r.getDecimal(2).compareTo(r.getDecimal(3)) == 0)
      assert(r.getDecimal(4).compareTo(r.getDecimal(5)) == 0)
    }
  }
}
