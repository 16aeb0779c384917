package graft.ops

import graft.SparkSpec

/** Laws for position bias, class-balance weights, leakage audit and
  * the salt advisor. */
class Batch14Spec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("positionBias: planted clicks only at position 1 give zero examination downstream") {
    val rows = (1 to 50).flatMap { u =>
      Seq(
        (u * 10L + 1, ts("2024-01-01 10:00:00"), u.toLong, "click", 0.0, "{}"),
        (u * 10L + 2, ts("2024-01-01 10:01:00"), u.toLong, "view", 0.0, "{}"),
        (u * 10L + 3, ts("2024-01-01 10:02:00"), u.toLong, "view", 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Ranking.positionBias(rows).collect()
      .map(x => x.getAs[Long]("pos") -> x).toMap
    assert(r(1L).getAs[Double]("examination_ratio") == 1.0)
    assert(r(2L).getAs[Double]("examination_ratio") == 0.0)
    assert(r(1L).getAs[Long]("clicks") == 50L)
  }

  test("classBalanceWeights: rare classes get larger weights; weights sum to k") {
    val rows = ((1 to 900).map(i => (i.toLong, "view")) ++
      (1 to 100).map(i => (1000L + i, "purchase")))
      .map { case (e, t) => (e, ts("2024-01-01 00:00:00"), 1L, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Ranking.classBalanceWeights(rows).collect()
      .filter(_.getAs[Double]("beta") == 0.999)
      .map(x => x.getAs[String]("label") -> x.getAs[Double]("weight")).toMap
    assert(r("purchase") > r("view"),
      s"rare class must weigh more: $r")
    assert(math.abs(r.values.sum - 2.0) < 1e-6, s"weights sum to k: $r")
  }

  test("leakageAudit: the all-time feature shows inflated correlation on the corpus") {
    val r = Training.leakageAudit(
      graft.Tables.events(spark, sf("sf0.01"))).collect()(0)
    assert(r.getAs[Long]("n_panel_rows") > 0)
    // leakage_gain is |corr_alltime| - |corr_past|; the all-time feature
    // sees post-label weeks, so it should not be LESS informative
    assert(!r.getAs[Double]("corr_alltime").isNaN)
    assert(!r.getAs[Double]("corr_past_only").isNaN)
  }

  test("saltAdvisor: the hottest key gets the largest salt factor") {
    // one key with 500 rows, 49 keys with 10 rows
    val rows = ((1 to 500).map(i => (i.toLong, 1L)) ++
      (1 to 490).map(i => (1000L + i, 2L + i % 49)))
      .map { case (e, u) => (e, ts("2024-01-01 00:00:00"), u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Layout.saltAdvisor(rows).collect()
    assert(r(0).getAs[Long]("user_id") == 1L)
    assert(r(0).getAs[Long]("rows_for_key") == 500L)
    // target = 990/32 = 30 -> salt = ceil(500/30) = 17
    assert(r(0).getAs[Long]("salt_factor") == 17L)
    assert(r.forall(x => x.getAs[Long]("salt_factor") >= 1L))
  }

  test("featureHashing: wider dims collide less; counts reconcile") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val r = Ranking.featureHashing(docs).collect()
      .map(x => x.getAs[Long]("dims") -> x).toMap
    val v = r(64L).getAs[Long]("distinct_tokens")
    r.values.foreach { x =>
      assert(x.getAs[Long]("distinct_tokens") == v)
      assert(x.getAs[Long]("colliding_tokens") ==
        v - x.getAs[Long]("buckets_used"))
    }
    assert(r(64L).getAs[Double]("collision_pct") >=
      r(1024L).getAs[Double]("collision_pct"))
  }
}
