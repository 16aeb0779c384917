package graft.ops

import graft.SparkSpec

/** Laws for RBO, the partition advisor and Yuen's trimmed t. */
class Batch12Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("rboOverlap: identical rankings give rbo_min near 1 - p^20") {
    // 25 distinct tokens with strictly decreasing counts: both sources
    // share the full depth-20 ranking
    val text = (1 to 25).map(i => (f"w$i%02d " * (30 - i)).trim)
      .mkString(" ")
    val r = graft.text.CorpusAudit.rboOverlap(
      docs(Seq((1L, "a", text), (2L, "b", text)))).collect()(0)
    // identical lists: agreement 1 at every depth -> rbo_min = 1 - p^20
    assert(math.abs(r.getAs[Double]("rbo_min")
      - (1.0 - math.pow(0.9, 20))) < 1e-6)
    assert(r.getAs[Double]("rbo_max") >= r.getAs[Double]("rbo_min"))
  }

  test("rboOverlap: disjoint vocabularies give zero overlap") {
    val r = graft.text.CorpusAudit.rboOverlap(
      docs(Seq((1L, "a", "x1 x2 x3 x4 x5"), (2L, "b", "y1 y2 y3 y4 y5"))))
      .collect()(0)
    assert(r.getAs[Long]("overlap_at_20") == 0L)
    assert(r.getAs[Double]("rbo_min") == 0.0)
  }

  test("partitionAdvisor: advised partitions scale with bytes, floor 1") {
    val sfDir = sf("sf0.001")
    val r = Layout.partitionAdvisor(
      graft.Tables.lineitem(spark, sfDir), graft.Tables.orders(spark, sfDir),
      graft.Tables.customer(spark, sfDir), graft.Tables.events(spark, sfDir))
      .collect().map(x => x.getAs[String]("table_name") -> x).toMap
    r.values.foreach { x =>
      assert(x.getAs[Long]("advised_partitions") >= 1L)
      assert(x.getAs[Long]("est_bytes") > x.getAs[Long]("n_rows") * 20)
    }
    assert(r("lineitem").getAs[Long]("est_bytes") >
      r("customer").getAs[Long]("est_bytes"))
  }

  test("yuenT: tail contamination barely moves the trimmed statistic") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(outlier: Double) = ((1 to 100).map(i =>
        (i.toLong, ts, 1L, "click", 10.0 + (i % 7), "{}")) ++
      (1 to 100).map(i => (200L + i, ts, 1L, "error",
        12.0 + (i % 7) + (if (i == 50) outlier else 0.0), "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val clean = StatTests.yuenT(ev(0.0)).collect()(0)
    val dirty = StatTests.yuenT(ev(100000.0)).collect()(0)
    // a single enormous outlier is trimmed away: the trimmed mean moves
    // by at most one window element (vs ~1000 for the raw mean)
    assert(math.abs(clean.getAs[Double]("trimmed_mean_error") -
      dirty.getAs[Double]("trimmed_mean_error")) < 0.2)
    assert(clean.getAs[Double]("yuen_t") < 0.0) // click mean < error mean
  }
}
