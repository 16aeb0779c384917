package graft.ops

import graft.SparkSpec

/** Laws for the fitting operators: GMM component recovery on planted
  * bimodal data; V-optimal SSE monotonicity and exact split recovery.
  */
class FitSpec extends SparkSpec {
  import spark.implicits._

  private def ev(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gmmEm: planted far-apart clusters are recovered with the right weight") {
    // 60 points at ~100, 40 points at ~400: EM must place one mean near
    // each cluster and weight the upper component ~0.4
    val vals = Seq.tabulate(60)(i => 100.0 + (i % 5)) ++
      Seq.tabulate(40)(i => 400.0 + (i % 5))
    val r = Fit.gmmEm(ev(vals)).collect()(0)
    val (mu1, mu2, pi2) = (r.getAs[Double]("mu1"), r.getAs[Double]("mu2"),
      r.getAs[Double]("pi2"))
    assert(mu1 < mu2)
    assert(math.abs(mu1 - 102) < 10, s"lower mean: $mu1")
    assert(math.abs(mu2 - 402) < 10, s"upper mean: $mu2")
    assert(math.abs(pi2 - 0.4) < 0.05, s"upper weight: $pi2")
  }

  test("voptHistogram: SSE non-increasing in bucket count; 2 buckets nail 2 clusters") {
    val r = Fit.voptHistogram(
      graft.Tables.orders(spark, sf("sf0.001"))).collect()
    assert(r.length == 8)
    val sse = r.sortBy(_.getAs[Long]("r")).map(_.getAs[Double]("sse_dollars2"))
    sse.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-6, s"SSE grew: $a -> $b")
      case _ =>
    }
    // planted: two constant clusters -> 2 buckets reach zero SSE
    val two = Seq.fill(50)(100.0) ++ Seq.fill(50)(4000.0)
    val orders = two.zipWithIndex.map { case (p, i) =>
      (i.toLong, 1L, "O", p,
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val p = Fit.voptHistogram(orders).collect()
      .map(x => x.getAs[Long]("r") -> x.getAs[Double]("sse_dollars2")).toMap
    assert(p(1L) > 0)
    assert(p(2L) == 0.0, s"two buckets must separate two constants: $p")
  }
}
