package graft.ops

import graft.SparkSpec

/** Laws for the modeling diagnostics and reliability/absorption ops. */
class ModelingSpec extends SparkSpec {
  import spark.implicits._

  test("ridgePath: coefficients shrink monotonically toward zero as λ grows") {
    val r = Modeling.ridgePath(
      graft.Tables.lineitem(spark, sf("sf0.001"))).collect()
      .sortBy(_.getAs[Double]("lambda_rel"))
    assert(r.length == 5)
    val b = r.map(x => math.abs(x.getAs[Double]("beta_qty"))
      + math.abs(x.getAs[Double]("beta_disc")))
    b.sliding(2).foreach {
      case Array(a0, a1) => assert(a1 <= a0 + 1e-9, s"no shrinkage: $a0 -> $a1")
      case _ =>
    }
    val r2 = r.map(_.getAs[Double]("r2_fit"))
    assert(r2.head >= r2.last - 1e-9, "OLS fit must be >= heavily shrunk fit")
  }

  test("woeIv: a perfectly separating score concentrates goods in one bin") {
    // top decile all purchases, rest all views -> top-bin WoE >> 0
    val rows = (1 to 100).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        if (i > 90) "purchase" else "view", i.toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Modeling.woeIv(rows).collect()
      .map(x => x.getAs[Long]("bin") -> x).toMap
    assert(r(10L).getAs[Long]("n_good") == 10L)
    assert(r(10L).getAs[Double]("woe") > 2.0)
    assert(r(1L).getAs[Long]("n_good") == 0L)
    assert(r(1L).getAs[Double]("woe") < 0.0)
  }

  test("absorbingSteps: a deterministic 2-state chain matches the closed form") {
    // view -> purchase always: E(view) = 1 exactly; error -> view ->
    // purchase: E(error) = 2
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = (0 until 40).flatMap { u =>
      Seq((u * 10L + 1, ts("2024-01-01 00:00:01"), u.toLong, "error", 0.0, "{}"),
        (u * 10L + 2, ts("2024-01-01 00:00:02"), u.toLong, "view", 0.0, "{}"),
        (u * 10L + 3, ts("2024-01-01 00:00:03"), u.toLong, "purchase", 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Walks.absorbingSteps(rows).collect()
      .map(x => x.getAs[String]("event_type") ->
        x.getAs[Double]("expected_steps")).toMap
    assert(r("view") == 1.0)
    assert(r("error") == 2.0)
  }

  test("sloBurn: a planted bad hour pages; quiet hours do not appear") {
    val ts = (h: Int, i: Int) => java.sql.Timestamp.valueOf(
      f"2024-01-01 $h%02d:${i % 60}%02d:00")
    // hours 0-9: 100 events, 0 errors; hour 10: 100 events, 50 errors
    val rows = (0 until 10).flatMap(h => (0 until 100).map(i =>
        (h * 1000L + i, ts(h, i), 1L, "view", 0.0, "{}"))) ++
      (0 until 100).map(i =>
        (10000L + i, ts(10, i), 1L, if (i < 50) "error" else "view", 0.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Series.sloBurn(df).collect()
    // only the bad hour (paged AND worst) is reported
    assert(r.length == 1)
    assert(r(0).getAs[Long]("page") == 1L)
    assert(r(0).getAs[Double]("burn_1h") == 50.0) // 50% errors / 1% budget
  }
}
