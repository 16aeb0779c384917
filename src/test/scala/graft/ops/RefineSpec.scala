package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for the refinement order-statistics operator: agreement with a
  * brute-force sort at small n, duplicate handling, and rank edges.
  */
class RefineSpec extends SparkSpec {
  import spark.implicits._

  test("refinementQuantile equals the brute-force kth smallest on the corpus") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val r = Refine.refinementQuantile(spark, ev).collect()
      .map(x => x.getAs[String]("stat") -> (x.getAs[Long]("k"), x.getAs[Double]("value")))
      .toMap
    val sorted = ev.select(col("value").cast("double")).orderBy("value")
      .collect().map(_.getDouble(0))
    val n = sorted.length
    val k50 = ((n + 1) / 2)
    val k90 = ((9L * n + 9) / 10).toInt
    assert(r("p50")._1 == k50)
    assert(math.abs(r("p50")._2 - sorted(k50 - 1)) < 1e-9)
    assert(math.abs(r("p90")._2 - sorted(k90 - 1)) < 1e-9)
  }

  test("refinementQuantile survives heavy duplicates and constant ranges") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 50k rows, 90% are the constant 7.0 => median hits a massive tie bucket
    val ev = (1 to 50000).map(i => (i.toLong, base, 1L, "t",
        if (i % 10 == 0) i.toDouble else 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Refine.refinementQuantile(spark, ev).collect()
      .map(x => x.getAs[String]("stat") -> x.getAs[Double]("value")).toMap
    assert(r("p50") == 7.0, "median of the 90%-constant stream is the constant")
    // p90 rank = 45009; values: 45000 copies of 7.0 then the 5000 multiples
    // of 10 ascending => p90 is the 9th multiple of 10 = 100... computed brute:
    val sorted = ((1 to 50000).map(i => if (i % 10 == 0) i.toDouble else 7.0)).sorted
    val k90 = (9L * 50000 + 9) / 10
    assert(r("p90") == sorted(k90.toInt - 1))
  }
}
