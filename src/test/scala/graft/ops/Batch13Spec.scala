package graft.ops

import graft.SparkSpec

/** Laws for churn labels, group k-fold and the segmented trend. */
class Batch13Spec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("churnLabels: a user active in week 1 only churns; week-over-week stayer does not") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),  // w1
      (2L, ts("2024-01-08 10:00:00"), 1L, "view", 1.0, "{}"),  // w2: stays
      (3L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"))  // w1 only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Training.churnLabels(rows).collect()
      .map(x => x.getAs[Int]("week") -> x).toMap
    assert(out(1).getAs[Long]("n_active_users") == 2L)
    assert(out(1).getAs[Long]("n_churned") == 1L) // user 2 churns
    assert(out(2).getAs[Long]("n_churned") == 1L) // user 1's panel ends
  }

  test("groupKfold: group folds have zero leakage, row folds leak") {
    // 21 users (21 is coprime to 5): consecutive event ids of one user
    // land in different row folds, so row folds must leak
    val rows = (1 to 420).map { i =>
      (i.toLong, ts("2024-01-01 00:00:00"), (i % 21).toLong, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Training.groupKfold(rows).collect()
      .map(x => x.getAs[String]("scheme") -> x).toMap
    assert(r("group_fold").getAs[Long]("straddling_users") == 0L)
    assert(r("group_fold").getAs[Long]("leaky_rows_bp") == 0L)
    assert(r("row_fold").getAs[Long]("straddling_users") == 21L)
  }

  test("segmentedTrend: a planted kink is found at the right decile") {
    // 100 days: flat at 10 k$ until day 60, then steep rise
    val withDates = (1 to 100).map { d =>
      val price = if (d <= 60) 10000.0 else 10000.0 + (d - 60) * 5000.0
      val day = java.time.LocalDate.of(1995, 1, 1).plusDays(d - 1)
      (d.toLong, 1L, "O", price,
        java.sql.Timestamp.valueOf(day.atStartOfDay()), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val r = Series.segmentedTrend(withDates).collect()(0)
    assert(r.getAs[Int]("n_days") == 100)
    assert(r.getAs[Int]("break_t") == 60,
      s"kink at day 60 must win: ${r.getAs[Int]("break_t")}")
    assert(r.getAs[Double]("slope_right_kd") > r.getAs[Double]("slope_left_kd"))
    assert(r.getAs[Double]("gain_pct") > 50.0)
  }
}
