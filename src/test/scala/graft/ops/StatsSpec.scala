package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 statistics/analytics operator laws: growth ratios, basket
  * lift, Welch t-test, day-of-week seasonality, triangle counting.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("momGrowth ratios reproduce the revenue series and cover all orders") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val rows = Analytics.momGrowth(orders).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.count())
    // first month has no prior: growth null; later months obey the ratio
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_growth")))
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        val expected = (cur.getAs[Double]("rev") - prev.getAs[Double]("rev")) /
          prev.getAs[Double]("rev")
        assert(math.abs(cur.getAs[Double]("mom_growth") - expected) < 1e-12)
      case _ =>
    }
  }

  test("basketLift computes support and lift on a known basket fixture") {
    // baskets: o1{A,B} o2{A,B} o3{A} o4{B} => n_ab=2, n_a=3, n_b=3, N=4
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (4L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "A"), (20L, "B")).toDF("p_partkey", "p_brand")
    val r = Analytics.basketLift(li, part).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_ab") == 2L)
    assert(math.abs(r(0).getAs[Double]("support") - 0.5) < 1e-15)
    assert(math.abs(r(0).getAs[Double]("lift") - 8.0 / 9.0) < 1e-15)
  }

  test("welchTtest: identical samples give t=0; a shifted sample gives the known sign") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(t: String, vs: Seq[Double]) = vs.map(v => (t, base, v))
    val events = (ev("aa", (1 to 20).map(_.toDouble)) ++
        ev("bb", (1 to 20).map(_.toDouble)) ++
        ev("cc", (1 to 20).map(_ + 10.0))) // cc mean is 10 higher
      .toDF("event_type", "ts", "value")
    val r = Analytics.welchTtest(events).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("t_stat")).toMap
    assert(math.abs(r(("aa", "bb"))) < 1e-12)       // identical: t = 0
    assert(r(("aa", "cc")) < -5.0 && r(("bb", "cc")) < -5.0) // cc larger
  }

  test("dowSeasonality: per-dow masses recombine to the type mean (ratio weighted mean = 1)") {
    val rows = Analytics.dowSeasonality(Tables.events(spark, sf("sf0.001"))).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val n = g.map(_.getAs[Long]("n")).sum.toDouble
      val wavg = g.map(r => r.getAs[Long]("n") * r.getAs[Double]("dow_avg")).sum / n
      val tavg = g.head.getAs[Double]("type_avg")
      assert(math.abs(wavg - tavg) < 1e-9, s"mass law violated: $wavg vs $tavg")
      val wratio = g.map(r => r.getAs[Long]("n") * r.getAs[Double]("seasonal_ratio")).sum / n
      assert(math.abs(wratio - 1.0) < 1e-9)
    }
  }

  test("triangleCount finds the planted triangle and ignores the dangling edge") {
    // nation graph: 1-2, 2-3, 1-3 (triangle) + 3-4 (dangling)
    val supplier = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 3)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((1L, 2), (2L, 3), (3L, 1), (4L, 4)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("o_orderkey", "o_custkey")
    // edges via (supplier nation, customer nation) pairs: (1,2),(2,3),(3,1),(3,4)
    val li = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("l_orderkey", "l_suppkey")
    val r = Analytics.triangleCount(li, orders, supplier, customer).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_triangles") == 1L)
  }
}
