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
  final case class WmBuf(sw: BigDecimal, swx: BigDecimal)

  val weightedMean: Aggregator[EvW, WmBuf, Double] =
    new Aggregator[EvW, WmBuf, Double] {
      override def zero: WmBuf = WmBuf(BigDecimal(0), BigDecimal(0))
      override def reduce(b: WmBuf, e: EvW): WmBuf = {
        // same quantization as the dec(value, 2) cast: HALF_UP at scale 2
        val v = BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        WmBuf(b.sw + e.w, b.swx + v * e.w)
      }
      override def merge(a: WmBuf, b: WmBuf): WmBuf =
        WmBuf(a.sw + b.sw, a.swx + b.swx)
      override def finish(b: WmBuf): Double =
        if (b.sw == 0) Double.NaN
        // both toDouble casts and the division are correctly rounded —
        // deterministic against an oracle that does the same three steps
        else b.swx.toDouble / b.sw.toDouble
      override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
