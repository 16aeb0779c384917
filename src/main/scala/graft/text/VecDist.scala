package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Exact-decimal squared-L2 distance between two float-array columns,
  * evaluated as one codegen'd zip_with/aggregate fold. Value-identical
  * to the exploded per-dim `SUM(CAST((x-y)*(x-y) AS DECIMAL(18,s)))`
  * (same addends, exact decimal arithmetic, order-independent), but
  * with no dims-explode and no 8M-row aggregation shuffle — the
  * corpus×anchors frame stays |corpus|·|anchors| rows instead of
  * |corpus|·|anchors|·dims. The accumulator is DECIMAL(28,s): wide
  * enough that the add never hits Spark's precision-38 scale-reduction
  * cliff, narrow enough to stay exact.
  */
object VecDist {
  def d2(a: String, b: String, scale: Int): Column = expr(
    s"""aggregate(
       |  zip_with($a, $b, (x, y) ->
       |    CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
       |         * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(18,$scale))),
       |  CAST(0 AS DECIMAL(28,$scale)),
       |  (acc, v) -> CAST(acc + v AS DECIMAL(28,$scale)))""".stripMargin)

  /** Squared-L2 distance as a PURE-DOUBLE ordered fold — the fast path
    * for anchor-distance queries: higher-order functions run
    * interpreted, where per-element Decimal allocation dominates; plain
    * double adds are ~10× cheaper. Deterministic because the fold order
    * is the array (dim) order on both engines — the DuckDB twin is
    * `list_reduce(list_prepend(0.0, list(term ORDER BY dim)), +)`,
    * which performs the bit-identical IEEE add sequence.
    */
  def d2Fold(a: String, b: String): Column = expr(
    s"""aggregate(
       |  zip_with($a, $b, (x, y) ->
       |    (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
       |      * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
}
