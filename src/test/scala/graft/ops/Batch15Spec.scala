package graft.ops

import graft.SparkSpec

/** Laws for QTE, Cook's distance and the permutation null. */
class Batch15Spec extends SparkSpec {
  import spark.implicits._

  test("quantileTreatment: placebo arms on the corpus give small shifts at the median") {
    val r = Inference.quantileTreatment(
      graft.Tables.events(spark, sf("sf0.01"))).collect()
      .map(x => x.getAs[Long]("quantile_pct") -> x.getAs[Double]("qte")).toMap
    assert(r.size == 9)
    // a hash coin is independent of value: the median shift is tiny
    // relative to the value scale (values are O(100))
    assert(math.abs(r(50L)) < 20.0, s"placebo median QTE: ${r(50L)}")
  }

  test("cooksDistance: a planted outlier day dominates the influence ranking") {
    val rows = (1 to 80).map { d =>
      val price = if (d == 70) 900000.0 else 10000.0 + d * 10.0
      val day = java.time.LocalDate.of(1995, 1, 1).plusDays(d - 1)
      (d.toLong, 1, price, 0.0,
        java.sql.Timestamp.valueOf(day.atStartOfDay()))
    }.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
      "l_shipdate").withColumn("l_quantity", org.apache.spark.sql.functions.lit(1.0))
    val r = Modeling.cooksDistance(rows).collect()
    assert(r(0).getAs[java.sql.Date]("day").toString == "1995-03-11",
      s"outlier day 70 must top the list: ${r(0)}")
    assert(r(0).getAs[Double]("cook_d") > 10 * r(1).getAs[Double]("cook_d"))
  }

  test("permutationNull: real correlation exceeds every permuted one on trended data") {
    // daily revenue strongly tracks daily quantity by construction
    val rows = (1 to 60).flatMap { d =>
      val day = java.time.LocalDate.of(1995, 1, 1).plusDays(d - 1)
      (1 to d % 10 + 1).map { i =>
        (d * 100L + i, 1, 100.0 * (d % 10 + 1), 0.0,
          java.sql.Timestamp.valueOf(day.atStartOfDay()), (d % 10 + 1).toDouble)
      }
    }.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
      "l_shipdate", "l_quantity")
    val r = Inference.permutationNull(rows).collect()
      .map(x => x.getAs[Long]("perm") -> x.getAs[Double]("corr")).toMap
    val nullMax = (1 to 5).map(p => math.abs(r(p.toLong))).max
    assert(r(0L) > nullMax,
      s"real corr ${r(0L)} must beat the null band $nullMax")
  }
}
