package graft.ops

import graft.SparkSpec

/** Invariant laws for the multiple-testing / robust-inference operators
  * (StatTests): planted-effect detection for BH-FDR, spread-separation
  * for Brown-Forsythe, monotone/tied series for Mann-Kendall, and
  * closed-form concentration bounds for HHI.
  */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 01:30:00")
  private val t1 = java.sql.Timestamp.valueOf("2024-01-01 02:30:00")

  test("bhFdr rejects a strongly shifted cell and ranks it first") {
    // 2 types x 2 hours; one cell shifted +100 against an otherwise flat corpus
    val rows =
      (1 to 50).map(i => ("aa", t0, 10.0 + (i % 5))) ++
      (1 to 50).map(i => ("aa", t1, 10.0 + (i % 5))) ++
      (1 to 50).map(i => ("bb", t0, 10.0 + (i % 5))) ++
      (1 to 50).map(i => ("bb", t1, 110.0 + (i % 5)))
    val r = StatTests.bhFdr(rows.toDF("event_type", "ts", "value")).collect()
    assert(r.length == 4)
    val first = r.head // ordered by rank
    assert(first.getAs[String]("event_type") == "bb" && first.getAs[Long]("hr") == 2L)
    assert(first.getAs[Boolean]("rejected"))
    assert(first.getAs[Double]("p") < 1e-6)
  }

  test("leveneTest separates equal-spread from unequal-spread groups") {
    def ev(t: String, vs: Seq[Double]) = vs.map(v => (t, t0, v))
    val equal = (ev("aa", (1 to 40).map(_.toDouble)) ++
      ev("bb", (1 to 40).map(_ + 100.0))) // same spread, shifted location
      .toDF("event_type", "ts", "value")
    val fEq = StatTests.leveneTest(equal).collect()(0).getAs[Double]("f_bf")
    // location shift is invisible to the median-centered deviations
    assert(math.abs(fEq) < 1e-9)
    val unequal = (ev("aa", (1 to 40).map(_.toDouble)) ++
      ev("bb", (1 to 40).map(i => i * 10.0)))
      .toDF("event_type", "ts", "value")
    val fNe = StatTests.leveneTest(unequal).collect()(0).getAs[Double]("f_bf")
    assert(fNe > 10.0)
  }

  test("mannKendall: monotone series trends up; constant series is all ties") {
    val d0 = java.sql.Timestamp.valueOf("2020-01-15 00:00:00").toLocalDateTime
    def order(prio: String, m: Int, price: Double) =
      (prio, java.sql.Timestamp.valueOf(d0.plusMonths(m.toLong)), price)
    val rows = (0 until 24).map(m => order("up", m, 100.0 + m)) ++
      (0 until 24).map(m => order("flat", m, 100.0))
    val df = rows.toDF("o_orderpriority", "o_orderdate", "o_totalprice")
    val r = StatTests.mannKendall(df).collect()
      .map(x => x.getAs[String]("prio") -> x).toMap
    val up = r("up")
    assert(up.getAs[Long]("s_stat") == 24L * 23 / 2) // every pair increasing
    assert(up.getAs[Double]("z") > 1.96 && up.getAs[String]("trend") == "up")
    val flat = r("flat")
    assert(flat.getAs[Long]("s_stat") == 0L)
    // all 24 months tied: tie correction zeroes the variance, z degrades to 0
    assert(flat.getAs[Double]("var_s") == 0.0 && flat.getAs[String]("trend") == "none")
  }

  test("hhiConcentration: monopoly gives HHI=1; k equal nations give 1/k") {
    val region = Seq((0L, "R1"), (1L, "R2")).toDF("r_regionkey", "r_name")
    val nation = Seq((0L, "n1", 0L), (1L, "n2", 1L), (2L, "n3", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((10L, 0L), (11L, 1L), (12L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val orders = Seq((1L, 10L, 50.0, d), (2L, 11L, 30.0, d), (3L, 12L, 30.0, d))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val r = StatTests.hhiConcentration(orders, customer, nation, region)
      .collect().map(x => x.getAs[String]("r_name") -> x).toMap
    assert(r("R1").getAs[Double]("hhi") == 1.0)
    assert(r("R1").getAs[Double]("effective_n") == 1.0)
    assert(math.abs(r("R2").getAs[Double]("hhi") - 0.5) < 1e-12)
    assert(math.abs(r("R2").getAs[Double]("effective_n") - 2.0) < 1e-9)
  }
}
