package graft.ops

import graft.{SparkSpec, Tables}

/** Laws for the lifecycle audits: KMV falls back to exact below k and
  * stays within sketch error above it; the forget cascade's per-table
  * counts reconcile against independently computed joins.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def ev(users: Seq[(Long, String)]) =
    users.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("kmvDistinct: below-k scopes report the exact count with zero error") {
    val users = (1L to 10L).map(u => u -> "click") ++
      (5L to 12L).map(u => u -> "purchase")
    val r = Lifecycle.kmvDistinct(ev(users)).collect()
      .map(x => x.getAs[String]("scope") ->
        (x.getAs[Long]("exact_distinct"), x.getAs[Double]("kmv_est"))).toMap
    assert(r("click") == ((10L, 10.0)))
    assert(r("purchase") == ((8L, 8.0)))
    assert(r("union:click+purchase") == ((12L, 12.0)))
    assert(r("inter:click*purchase") == ((6L, 6.0)))
  }

  test("kmvDistinct: above-k estimate lands within 3 standard errors") {
    // 500 distinct users, k=32: KMV relative SE ~ 1/sqrt(k-2) ~ 18%
    val users = (1L to 500L).map(u => u -> "click")
    val r = Lifecycle.kmvDistinct(ev(users)).collect()
      .filter(_.getAs[String]("scope") == "click")(0)
    val est = r.getAs[Double]("kmv_est")
    assert(math.abs(est - 500.0) / 500.0 < 0.55, s"KMV estimate: $est")
  }

  test("forgetCascade counts reconcile against direct joins on the corpus") {
    val d = sf("sf0.001")
    val (cust, ord, li, evs) = (Tables.customer(spark, d),
      Tables.orders(spark, d), Tables.lineitem(spark, d),
      Tables.events(spark, d))
    val r = Lifecycle.forgetCascade(cust, ord, li, evs).collect()
      .map(x => x.getAs[String]("table_name") ->
        (x.getAs[Long]("rows_total"), x.getAs[Long]("rows_to_delete"),
          x.getAs[Long]("bp_deleted"))).toMap
    assert(r("customer")._1 == cust.count())
    assert(r("orders")._1 == ord.count())
    assert(r("lineitem")._1 == li.count())
    assert(r("events")._1 == evs.count())
    r.values.foreach { case (total, del, bp) =>
      assert(del <= total)
      assert(bp == del * 10000L / total)
    }
    // the cascade deletes SOMETHING at this SF (the 5% residue class is
    // non-empty over 150 customers) and never the whole table
    assert(r("customer")._2 > 0 && r("customer")._2 < r("customer")._1)
  }
}
