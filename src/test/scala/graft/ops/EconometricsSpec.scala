package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Closed-form laws for the econometric battery (q409-q413). */
class EconometricsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, typ: String, dollars: Double) =
    (day.toLong * 100 + typ.hashCode.toLong.abs % 100,
      Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 1L, typ, dollars, "{}")

  private def frame(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("friedmanKendall: perfect concordance yields W = 1 exactly") {
    // every block ranks A < B < C identically => q_ppm = 2n*1e6, w_ppm = 1e6
    val rows = for (d <- 1 to 10; (t, v) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)))
      yield ev(d, t, v)
    val r = Econometrics.friedmanKendall(frame(rows)).collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_blocks") == 10L)
    assert(r.getAs[Long]("q_ppm") == 20L * 1000000L)
    assert(r.getAs[Long]("w_ppm") == 1000000L)
  }

  test("friedmanKendall: all-tied blocks yield Q = 0") {
    val rows = for (d <- 1 to 6; t <- Seq("A", "B", "C")) yield ev(d, t, 5.0)
    val r = Econometrics.friedmanKendall(frame(rows)).collect().head
    assert(r.getAs[Long]("q_ppm") == 0L)
  }

  test("maxDrawdown: peak-to-trough depth on a pinned series") {
    // daily series 10, 30, 12, 25: peak 30, trough 12 => dd 18 (1800 cents)
    val rows = Seq(ev(1, "A", 10.0), ev(2, "A", 30.0), ev(3, "A", 12.0),
      ev(4, "A", 25.0))
    val r = Econometrics.maxDrawdown(frame(rows)).collect().head
    assert(r.getAs[Long]("max_dd_cents") == 1800L)
    assert(r.getAs[Long]("peak_cents") == 3000L)
    assert(r.getAs[java.sql.Date]("trough_day").toString == "2024-01-03")
    assert(r.getAs[Long]("depth_ppm") == 600000L)
  }

  test("yuleWalker: alternating series has r1 near -1 and phi1 negative") {
    val rows = (1 to 20).map(d => ev(d, "A", if (d % 2 == 0) 10.0 else 20.0))
    val r = Econometrics.yuleWalker(frame(rows)).collect().head
    assert(r.getAs[Long]("r1_ppm") < -900000L)
    assert(r.getAs[Long]("phi1_ppm") < 0L)
  }

  test("breuschPagan: exact-linear series has zero residuals and LM = 0") {
    val rows = (1 to 15).map(d => ev(d, "A", d * 7.0))
    val r = Econometrics.breuschPagan(frame(rows)).collect().head
    assert(r.getAs[Long]("slope_milli") == 7000L)
    assert(r.getAs[Long]("lm_stat_ppm") == 0L)
  }

  test("chowTest: identical linear halves show no break (f near 0)") {
    // pure line: split SSR == pooled SSR == 0 => ssr_split = 0 => f NULL;
    // add a small symmetric residual pattern so SSRs are positive & equal
    val rows = (1 to 16).map(d => ev(d, "A", d * 2.0 + (if (d % 2 == 0) 1.0 else 0.0)))
    val r = Econometrics.chowTest(frame(rows)).collect().head
    val fp = r.getAs[Long]("f_ppm")
    assert(r.getAs[Long]("ssr_split_milli") > 0L)
    // pooled and split fits are near-identical: F stays tiny
    assert(math.abs(fp) < 400000L, s"f_ppm = $fp")
  }
}
