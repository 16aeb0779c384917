package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.VecDist

/** The native squared_l2 expression must be bit-identical to the
  * interpreted VecDist.d2Fold it replaced on the anchor-distance hot
  * paths — same left-to-right IEEE add sequence, only the evaluation
  * engine differs.
  */
class SquaredL2Spec extends SparkSpec {
  import spark.implicits._
  import SquaredL2.squared_l2

  test("squared_l2 equals the interpreted d2Fold bit-for-bit") {
    val rows = (0 until 50).map { i =>
      (i.toLong,
        Seq.tabulate(64)(d => ((i * 31 + d * 7) % 97).toFloat / 97f),
        Seq.tabulate(64)(d => ((i * 17 + d * 13) % 89).toFloat / 89f))
    }.toDF("id", "a", "b")
    val both = rows.select(
      squared_l2(col("a"), col("b")).as("native"),
      VecDist.d2Fold("a", "b").as("fold")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("squared_l2 of identical vectors is exactly zero") {
    val rows = Seq((1L, Seq.fill(8)(0.123f))).toDF("id", "a")
    val r = rows.select(squared_l2(col("a"), col("a"))).collect()(0)
    assert(r.getDouble(0) == 0.0)
  }
}
