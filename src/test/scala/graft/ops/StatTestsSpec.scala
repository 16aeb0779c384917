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

  test("maseForecast: linear series gives naive error c and seasonal error 12c") {
    val d0 = java.sql.Timestamp.valueOf("2020-01-15 00:00:00").toLocalDateTime
    val rows = (0 until 26).map(m =>
      ("x", java.sql.Timestamp.valueOf(d0.plusMonths(m.toLong)), 100.0 + 7 * m))
    val r = StatTests.maseForecast(
      rows.toDF("o_orderpriority", "o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("n_eval") == 14L)
    assert(math.abs(r.getAs[Double]("mae_naive") - 7.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae_seasonal") - 84.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mase") - 1.0 / 12.0) < 1e-6) // output rounds to 6dp
  }

  test("cramersV: a type-determines-day table yields V=1") {
    // each type occurs on exactly one distinct day => perfect association
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val rows = for {
      (t, di) <- Seq("aa", "bb", "cc").zipWithIndex
      i <- 1 to 30
    } yield (t, java.sql.Timestamp.valueOf(days(di) + " 10:00:00"), i.toDouble)
    val r = StatTests.cramersV(rows.toDF("event_type", "ts", "value")).collect()(0)
    assert(r.getAs[Long]("r") == 3L && r.getAs[Long]("c") == 3L)
    assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-9)
  }

  test("overdispersion: constant per-user counts give zero variance and burstiness -1") {
    val rows = for (u <- 1L to 20L; i <- 1 to 3)
      yield ("aa", t0, u, i.toDouble)
    val r = StatTests.overdispersion(
      rows.toDF("event_type", "ts", "user_id", "value")).collect()(0)
    assert(r.getAs[Double]("var_k") == 0.0)
    assert(r.getAs[Double]("fano") == 0.0)
    assert(r.getAs[Double]("burstiness") == -1.0)
  }

  test("markovEntropy: a deterministic alternating chain has zero entropy rate") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").toLocalDateTime
    val rows = for (u <- 1L to 5L; i <- 0 until 10) yield
      (i * 10 + u, java.sql.Timestamp.valueOf(base.plusMinutes(i.toLong)), u,
        if (i % 2 == 0) "aa" else "bb", 1.0)
    val r = StatTests.markovEntropy(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")).collect()(0)
    assert(r.getAs[Double]("entropy_rate") == 0.0)
    assert(r.getAs[Double]("perplexity") == 1.0)
  }

  test("cronbachAlpha: identical items are perfectly reliable (alpha=1)") {
    // every user responds identically on both items => total var = k^2 sigma^2
    val rows = for (u <- 1L to 10L; t <- Seq("aa", "bb"))
      yield (t, t0, u, u.toDouble)
    val r = StatTests.cronbachAlpha(
      rows.toDF("event_type", "ts", "user_id", "value")).collect()(0)
    assert(r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-9)
  }

  test("kmSurvival steps down by the classic product-limit fractions") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").toLocalDateTime
    def ev(u: Long, h: Long, t: String) =
      (u * 100 + h, java.sql.Timestamp.valueOf(base.plusHours(h)), u, t, 1.0)
    // 4 users start at h=0; conversions at h=1,2,3; user 4 never converts (censored at h=5)
    val rows = Seq(
      ev(1, 0, "view"), ev(1, 1, "purchase"),
      ev(2, 0, "view"), ev(2, 2, "purchase"),
      ev(3, 0, "view"), ev(3, 3, "purchase"),
      ev(4, 0, "view"), ev(4, 5, "view"))
    val r = StatTests.kmSurvival(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(x => x.getAs[Long]("dur") -> x.getAs[Double]("survival")).toMap
    assert(math.abs(r(1L) - 0.75) < 1e-9) // 1 - 1/4
    assert(math.abs(r(2L) - 0.50) < 1e-9) // 3/4 * (1 - 1/3)
    assert(math.abs(r(3L) - 0.25) < 1e-9) // 1/2 * (1 - 1/2)
  }

  test("lorenzDeciles on 10 customers spending 1..10 reproduces exact shares") {
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val orders = (1L to 10L).map(c => (c, c, c.toDouble, d))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val r = StatTests.lorenzDeciles(orders).collect()
    assert(r.length == 10)
    assert(r.forall(_.getAs[Long]("n_customers") == 1L))
    val top = r.last
    assert(math.abs(top.getAs[Double]("share") - 10.0 / 55.0) < 1e-6)
    assert(top.getAs[Double]("cum_share") == 1.0)
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
