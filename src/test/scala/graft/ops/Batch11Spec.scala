package graft.ops

import graft.SparkSpec

/** Laws for CSV modes, windowed funnel, CvM/AD and bitmap containers. */
class Batch11Spec extends SparkSpec {
  import spark.implicits._

  test("csvModes: corrupt rows kept+flagged in PERMISSIVE, gone in DROPMALFORMED, checksum identical") {
    val r = Extended.csvModes(spark, sf("sf0.001")).collect()
      .map(x => x.getAs[String]("mode") -> x).toMap
    val p = r("permissive"); val d = r("dropmalformed")
    assert(p.getAs[Long]("n_corrupt") == 7L)
    assert(p.getAs[Long]("n_rows") == d.getAs[Long]("n_rows") + 7L)
    assert(p.getAs[Long]("checksum") == d.getAs[Long]("checksum"),
      "clean-row parsing must not differ across modes")
  }

  test("windowedFunnel: a planted in-window chain converts; out-of-window does not") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: signup -> view (+10m) -> purchase (+10m): converts
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-01 10:20:00"), 1L, "purchase", 0.0, "{}"),
      // user 2: view comes 2h after signup: breaks at step 1
      (4L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0, "{}"),
      (5L, ts("2024-01-01 12:00:00"), 2L, "view", 0.0, "{}"),
      (6L, ts("2024-01-01 12:01:00"), 2L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Insights.windowedFunnel(rows).collect()(0)
    assert(r.getAs[Long]("n_signups") == 2L)
    assert(r.getAs[Long]("n_viewed") == 1L)
    assert(r.getAs[Long]("n_purchased") == 1L)
    assert(r.getAs[Long]("p50_signup_to_view_us") == 600L * 1000000L)
  }

  test("cvmAd: identical distributions give near-zero CvM; shifted give large") {
    def docs(shift: Long) = ((1 to 50).map(i =>
        (i.toLong, "t", "en", "a", 100L + i % 10)) ++
      (1 to 50).map(i => (100L + i, "t", "en", "b", 100L + shift + i % 10)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val same = StatTests.cvmAd(docs(0)).collect()(0).getAs[Double]("cvm_t")
    val far = StatTests.cvmAd(docs(1000)).collect()(0).getAs[Double]("cvm_t")
    assert(same < 0.3, s"identical dists must give small CvM: $same")
    assert(far > 5.0, s"disjoint dists must give large CvM: $far")
  }

  test("bitmapContainers: dense chunks go bitmap, sparse go array; bytes beat raw") {
    // 2 full chunks (65536 dense keys) + 100 sparse keys in a third
    val keys = (0L until 131072L) ++ (200000L until 200100L)
    val orders = keys.map(k => (k, 1L, "O", 1.0,
      java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = Layout.bitmapContainers(orders).collect()
      .map(x => x.getAs[String]("ctype") -> x).toMap
    assert(r("bitmap").getAs[Long]("n_containers") == 2L)
    assert(r("bitmap").getAs[Long]("est_bytes") == 2L * 8200L)
    assert(r("array").getAs[Long]("n_containers") == 1L)
    assert(r("array").getAs[Long]("est_bytes") == 100L * 2 + 8)
    assert(r("bitmap").getAs[Long]("est_bytes") <
      r("bitmap").getAs[Long]("uncompressed_bytes"))
  }
}
