package graft.ops

import graft.{SparkSpec, Tables}

/** Laws for the experimentation/evaluation operators: CUPED identities
  * on a planted perfectly-correlated pre-period, attribution picks on a
  * planted touch sequence, and gains-table conservation.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("cupedPreflight: arms partition users; planted y=2x gives theta=2, rho2=1") {
    val r = Experiment.cupedPreflight(Tables.events(spark, sf("sf0.001"))).collect()(0)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == r.getAs[Long]("n_users"))
    val vr = r.getAs[Double]("variance_reduction")
    assert(vr >= 0 && vr <= 1 + 1e-9)
    // planted: every user has pre value x and post value exactly 2x
    val ev = (1 to 40).flatMap { u =>
      Seq(
        (u.toLong * 2, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
          u.toLong, "view", u * 1.5, "{}"),
        (u.toLong * 2 + 1, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
          u.toLong, "view", u * 3.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = Experiment.cupedPreflight(ev).collect()(0)
    assert(math.abs(p.getAs[Double]("cuped_theta") - 2.0) < 1e-6)
    assert(math.abs(p.getAs[Double]("variance_reduction") - 1.0) < 1e-6)
  }

  test("funnelAttribution: planted view->click->purchase credits view first, click last") {
    val ev = Seq(
      (1L, "2024-01-10 00:00:00", 7L, "view", 0.0),
      (2L, "2024-01-11 00:00:00", 7L, "click", 0.0),
      (3L, "2024-01-12 00:00:00", 7L, "purchase", 50.0),
      // a touch OUTSIDE the 7-day lookback must not attribute
      (4L, "2024-01-01 00:00:00", 8L, "click", 0.0),
      (5L, "2024-01-12 00:00:00", 8L, "purchase", 10.0)
    ).map { case (id, ts, u, t, v) =>
      (id, java.sql.Timestamp.valueOf(ts), u, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Experiment.funnelAttribution(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_purchases"))
      .toMap
    assert(rows(("first_touch", "view")) == 1L)
    assert(rows(("last_touch", "click")) == 1L)
    assert(!rows.contains(("last_touch", "view")))
    // user 8's purchase has no in-window touch: absent from both models
    assert(rows.values.sum == 2L)
  }

  test("bradleyTerry: a dominant item earns the top strength; strengths normalize") {
    // user 1 fires 5 'view', 3 'click', 1 'error' EVERY day: view beats all
    val ev = (0 until 20).flatMap { day =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(day)
      def burst(t: String, n: Int, base: Int) = (0 until n).map(k =>
        (day.toLong * 100 + base + k, java.sql.Timestamp.valueOf(d.atTime(9, 0)),
          1L, t, 1.0, "{}"))
      burst("view", 5, 0) ++ burst("click", 3, 10) ++ burst("error", 1, 20)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Experiment.bradleyTerry(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(rows("view") > rows("click") && rows("click") > rows("error"),
      s"dominance order must hold: $rows")
    assert(math.abs(rows.values.sum - 1.0) < 1e-3,
      "normalized strengths must sum to ~1")
  }

  test("gainsTable: deciles partition the orders; capture reaches 1.0; lift decreasing-ish") {
    val rows = Experiment.gainsTable(Tables.orders(spark, sf("sf0.001"))).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n")).sum == 1500L)
    val last = rows.maxBy(_.getAs[Long]("decile"))
    assert(math.abs(last.getAs[Double]("capture_rate") - 1.0) < 1e-9)
    assert(math.abs(last.getAs[Double]("cum_lift") - 1.0) < 1e-9)
    val captures = rows.sortBy(_.getAs[Long]("decile"))
      .map(_.getAs[Double]("capture_rate"))
    captures.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-12, "capture must be cumulative")
      case _ =>
    }
  }
  test("propensityMatching: matched pairs = min(arm sizes) per decile") {
    val r = Experiment.propensityMatching(
      graft.Tables.events(spark, sf("sf0.001"))).collect()
    assert(r.length == 10)
    r.foreach { x =>
      assert(x.getAs[Long]("n_matched") ==
        math.min(x.getAs[Long]("n_t"), x.getAs[Long]("n_c")))
    }
  }

}
