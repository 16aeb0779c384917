package graft.ops

import graft.{SparkSpec, Tables}

/** Laws for the diagnostics: a planted Simpson reversal, KDE mass and
  * peak placement, and McNemar dominance of the informed model.
  */
class DiagnoseSpec extends SparkSpec {
  import spark.implicits._

  test("simpsonsSlopes: planted within-group negative / pooled positive reversal") {
    // both groups slope -1 internally; group B sits up-and-right of A,
    // so the pooled slope is positive -> reversed = 1 for every group
    val rows =
      (0 to 10).map(i => ("A", i.toDouble, 100.0 - i)) ++
      (0 to 10).map(i => ("B", 20.0 + i, 300.0 - i))
    val li = rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = Diagnose.simpsonsSlopes(li).collect()
    r.foreach { x =>
      assert(math.abs(x.getAs[Double]("slope") + 1.0) < 1e-9)
      assert(x.getAs[Double]("slope_all") > 0)
      assert(x.getAs[Long]("reversed") == 1L)
    }
  }

  test("kdeGrid: densities non-negative; unimodal planted data peaks at its center") {
    val rows = (1 to 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        "view", 250.0 + (i % 21 - 10), "{}") // tight cluster at 250
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Diagnose.kdeGrid(rows).collect()
    assert(r.forall(_.getAs[Double]("density") >= 0))
    val best = r.maxBy(_.getAs[Double]("density"))
    assert(best.getAs[Long]("g") == 250L,
      s"peak should be at 250, was ${best.getAs[Long]("g")}")
  }

  test("mcnemarTest: the value-aware model beats the coin on the real corpus") {
    val r = Diagnose.mcnemarTest(Tables.events(spark, sf("sf0.001"))).collect()
    assert(r.nonEmpty)
    // aggregate discordant counts: informed model wins overall
    val b = r.map(_.getAs[Long]("b")).sum
    val c = r.map(_.getAs[Long]("c")).sum
    assert(b > c, s"A-right-B-wrong ($b) should exceed the reverse ($c)")
  }
}
