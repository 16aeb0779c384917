package graft.ops

import graft.SparkSpec

/** Laws for weak supervision and successive halving. */
class SupervisionSpec extends SparkSpec {
  import spark.implicits._

  test("labelingFunctions: planted docs give exact coverage/conflict counts") {
    // doc 1: lf_table votes 1, lf_long votes 1 (200 chars) -> overlap,
    //        no conflict; doc 2: lf_table votes 1, lf_long votes 0
    //        (100 chars) -> conflict; doc 3: all abstain (150 chars,
    //        dr in dead zone is impossible with distinct words ->
    //        force dr > 0.55 by distinct words, so lf_diverse votes 1)
    val docs = Seq(
      (1L, "table table table table", "en", "web", 200L),
      (2L, "table table table table", "en", "web", 100L),
      (3L, "alpha beta gamma delta", "en", "web", 150L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Supervision.labelingFunctions(docs).collect()
      .map(x => x.getAs[String]("lf") -> x).toMap
    assert(r("lf_table").getAs[Long]("voted") == 2L)
    assert(r("lf_long").getAs[Long]("voted") == 2L)
    // lf_long conflicts on doc 1 (lf_diverse votes 0 vs its 1) AND on
    // doc 2 (lf_table votes 1 vs its 0): 2 of 3 docs
    assert(r("lf_long").getAs[Double]("conflict_pct") ==
      math.rint(200.0 / 3.0 * 1000) / 1000)
    // doc texts: docs 1-2 dr = 0.25 -> lf_diverse votes 0 on both;
    // doc 3 dr = 1.0 -> votes 1
    assert(r("lf_diverse").getAs[Long]("voted") == 3L)
  }

  test("successiveHalving: the best planted arm survives all rounds") {
    val rows = (1 to 1000).flatMap { i =>
      Seq(("good", 10.0 + (i % 3)), ("mid", 5.0), ("bad", 1.0),
        ("worse", 0.5), ("worst", 0.1)).map { case (t, v) =>
        (i.toLong * 10 + t.hashCode % 7, t, v)
      }
    }.zipWithIndex.map { case ((_, t, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Supervision.successiveHalving(rows).collect()
    val kept3 = r.filter(x => x.getAs[Long]("round") == 3L &&
      x.getAs[Long]("kept") == 1L)
    assert(kept3.length == 1 && kept3(0).getAs[String]("arm") == "good")
    // survivor counts per round: 5, 3, 2 arms evaluated
    assert(r.count(_.getAs[Long]("round") == 1L) == 5)
    assert(r.count(_.getAs[Long]("round") == 2L) == 3)
    assert(r.count(_.getAs[Long]("round") == 3L) == 2)
  }
}
