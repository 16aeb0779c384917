package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` weighted mean — the Dataset-typed aggregation API
  * (SURVEY.md §2.8 M3/M4's Spark-native shape), completing the engine's
  * third aggregate surface next to codegen'd builtins and the
  * `TypedImperativeAggregate` customs (top_k_by, vec_sum). Exactness
  * follows the repo's decimal rule: the buffer carries BigDecimal sums
  * (value quantized to scale 2 exactly like `CAST(value AS
  * DECIMAL(18,2))` — BigDecimal addition is associative, so partial
  * merges are order-independent), and only the final ratio happens in
  * double. Plans as a two-phase ObjectHashAggregate: partial buffers
  * merge map-side, |groups| rows shuffle.
  */
object WeightedMeanAgg {

  final case class EvW(event_type: String, value: Double, w: Long)

  /** Buffer carries UNSCALED integer sums as BigInt (encoded as
    * DecimalType(38,0) — all 38 digits usable as integer headroom; a
    * BigDecimal field would encode as the default (38,18) and waste 18
    * digits on unused fractional scale, capping exact sums at 1e20).
    * swx accumulates Σ w·round(value·100): integer, exact, associative.
    */
  final case class WmBuf(sw: BigInt, swx: BigInt)

  val weightedMean: Aggregator[EvW, WmBuf, Double] =
    new Aggregator[EvW, WmBuf, Double] {
      override def zero: WmBuf = WmBuf(BigInt(0), BigInt(0))
      override def reduce(b: WmBuf, e: EvW): WmBuf = {
        // same quantization as the dec(value, 2) cast: HALF_UP at scale 2
        // on the exact binary expansion, kept as the unscaled integer
        val unscaled = BigInt(BigDecimal(e.value)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .underlying.unscaledValue)
        WmBuf(b.sw + e.w, b.swx + unscaled * e.w)
      }
      override def merge(a: WmBuf, b: WmBuf): WmBuf =
        WmBuf(a.sw + b.sw, a.swx + b.swx)
      override def finish(b: WmBuf): Double =
        if (b.sw == 0) Double.NaN
        // BigDecimal(swx, 2) re-attaches the scale EXACTLY, so each
        // toDouble is one correctly-rounded cast and the division is one
        // correctly-rounded op — the same three steps as the oracle
        else BigDecimal(b.swx, 2).toDouble / BigDecimal(b.sw).toDouble
      override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
