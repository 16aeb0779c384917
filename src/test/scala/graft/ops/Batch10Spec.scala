package graft.ops

import graft.SparkSpec

/** Laws for the hash ring, vocab curve, EB shrinkage and DiD. */
class Batch10Spec extends SparkSpec {
  import spark.implicits._

  test("hashRing: consistent-hash law — every moved key lands on the new node") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val r = Placement.hashRing(docs).collect()
    val total = r.map(_.getAs[Long]("keys_8")).sum
    assert(total == docs.count())
    r.foreach { x =>
      assert(x.getAs[Long]("moved_out") == x.getAs[Long]("moved_to_new"),
        s"moved keys must all go to the added node: $x")
    }
    // keys moved overall ~ 1/9 of corpus (generous band for hash noise)
    val moved = r.map(_.getAs[Long]("moved_out")).sum
    assert(moved > 0 && moved < total / 3, s"moved $moved of $total")
  }

  test("vocabSizeCurve: larger vocab never hurts compression") {
    val r = graft.text.Tokenizer.vocabSizeCurve(
      graft.Tables.documents(spark, sf("sf0.001"))).collect()
      .sortBy(_.getAs[Long]("vocab_k"))
    val cpt = r.map(_.getAs[Double]("chars_per_token"))
    cpt.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9,
        s"chars/token fell with larger vocab: $a -> $b")
      case _ =>
    }
    val oov = r.map(_.getAs[Double]("oov_token_share"))
    oov.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "OOV share must not grow")
      case _ =>
    }
  }

  test("betaBinomialEb: shrinkage pulls small-sample rates toward the prior mean") {
    // 30 users with 100 events at rate 0.2; 1 user with 2 events at rate 1.0
    val rows = (1 to 30).flatMap { u =>
      (1 to 100).map(i => (u * 1000L + i, u.toLong,
        if (i <= 20) "purchase" else "view"))
    } ++ Seq((90001L, 99L, "purchase"), (90002L, 99L, "purchase"))
    val df = rows.map { case (e, u, t) =>
      (e, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Experiment.betaBinomialEb(df).collect()
    // the 2-event outlier moves most
    assert(r(0).getAs[Long]("user_id") == 99L)
    val shrunk = r(0).getAs[Double]("shrunk_rate")
    assert(shrunk < 1.0 && shrunk > 0.2,
      s"outlier must shrink toward the prior mean: $shrunk")
  }

  test("diffInDiff: hash treatment on untreated data gives DiD near zero") {
    val r = Experiment.diffInDiff(
      graft.Tables.events(spark, sf("sf0.01"))).collect()(0)
    val did = r.getAs[Double]("did")
    val se = r.getAs[Double]("se")
    assert(math.abs(did) < 4 * se,
      s"placebo DiD should be within 4 SE of zero: did=$did se=$se")
  }
}
