package graft.ops

import graft.{SparkSpec, Tables}

/** Laws for the warehouse audits: planted contract violations are
  * counted exactly; planted out-of-order arrival yields exact lateness.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("dataContract: planted orphan FK, duplicate PK and range breach are counted") {
    val li = Seq(
      (1L, 1, 10.0, 0.05, java.sql.Date.valueOf("1995-01-01")),
      (1L, 1, 20.0, 0.05, java.sql.Date.valueOf("1995-01-02")), // dup PK
      (2L, 1, 99.0, 0.05, java.sql.Date.valueOf("1995-01-03")), // qty>50
      (3L, 1, 10.0, 0.50, java.sql.Date.valueOf("1995-01-04"))) // disc>0.1
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_shipdate")
    val orders = Seq((1L, 7L), (2L, 8L)) // orderkey 3 is an orphan
      .toDF("o_orderkey", "o_custkey")
    val cust = Seq((7L, "a")).toDF("c_custkey", "c_name") // custkey 8 orphan
    val r = Warehouse.dataContract(li, orders, cust).collect()
      .map(x => x.getAs[String]("check") -> x.getAs[Long]("violations")).toMap
    assert(r("lineitem.pk_orderkey_linenumber_unique") == 1L)
    assert(r("lineitem.quantity_in_1_50") == 1L)
    assert(r("lineitem.discount_in_0_0.1") == 1L)
    assert(r("lineitem.fk_orderkey_in_orders") == 1L)
    assert(r("orders.fk_custkey_in_customer") == 1L)
    assert(r("lineitem.shipdate_not_null") == 0L)
  }

  test("dataContract on the corpus: only the known PK duplication fails") {
    // the synthetic lineitem reuses (orderkey, linenumber) pairs by
    // construction, so the PK check MUST flag it; everything else holds
    val sfDir = sf("sf0.001")
    val r = Warehouse.dataContract(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir)).collect()
      .map(x => x.getAs[String]("check") ->
        (x.getAs[Long]("pass"), x.getAs[Long]("violations"))).toMap
    val (pkPass, pkViol) = r("lineitem.pk_orderkey_linenumber_unique")
    assert(pkPass == 0L && pkViol > 0L,
      "PK check must detect the corpus's duplicate (orderkey, linenumber)")
    (r - "lineitem.pk_orderkey_linenumber_unique").foreach {
      case (chk, (pass, _)) => assert(pass == 1L, s"contract violated: $chk")
    }
  }

  test("latenessAudit: a planted late arrival carries its exact microsecond gap") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // arrival order = event_id; event 3 is 90 seconds behind the running max
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 00:05:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 00:03:30"), 1L, "view", 0.0, "{}"),
      (4L, ts("2024-01-01 00:06:00"), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Warehouse.latenessAudit(ev).collect()(0)
    assert(r.getAs[Long]("n_late") == 1L)
    assert(r.getAs[Long]("max_late_us") == 90L * 1000000L)
    assert(r.getAs[Long]("avg_late_us") == 90L * 1000000L / 4)
  }
}
