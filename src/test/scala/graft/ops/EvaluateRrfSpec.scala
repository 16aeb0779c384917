package graft.ops

import graft.SparkSpec

/** Laws for RRF fusion and the selectivity audit. */
class EvaluateRrfSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFusion: a doc ranked first by both rankers tops the fused list") {
    // doc 1: longest AND most diverse; doc 2 long but repetitive;
    // doc 3 diverse but short
    val docs = Seq(
      (1L, "a b c d e f g h", "en", "web", 100L),
      (2L, "a a a a a a a a", "en", "web", 90L),
      (3L, "x y z", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Evaluate.rrfFusion(docs, top = 3).collect()
    assert(r(0).getAs[Long]("doc_id") == 1L)
    // fused score of the double-winner is 2/(60+1)
    assert(math.abs(r(0).getAs[Double]("rrf_score") - 2.0 / 61.0) < 1e-6)
  }

  test("selectivityAudit: independent planted predicates have q_error 1") {
    // quantity and discount planted fully independent (outer product)
    val rows = for {
      q <- 1 to 40; d <- Seq(0.0, 0.1)
    } yield (1L, 1, q.toDouble, d, 0.0, "N", "O",
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
    val li = rows.toDF("l_orderkey", "l_linenumber", "l_quantity",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Warehouse.selectivityAudit(li).collect()
      .map(x => x.getAs[String]("pair") -> x).toMap
    val qd = r("qty_gt_25 & disc_gt_05")
    assert(qd.getAs[Double]("q_error") == 1.0,
      s"independent predicates must have q_error 1: $qd")
    // flag_r never fires -> actual 0 -> q_error NULL on both engines
    assert(r("qty_gt_25 & flag_r").isNullAt(
      r("qty_gt_25 & flag_r").fieldIndex("q_error")))
  }
}
