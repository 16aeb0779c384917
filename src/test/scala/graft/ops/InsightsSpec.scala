package graft.ops

import graft.{SparkSpec, Tables}

/** Invariant laws for the corpus-insight operators (Insights): a
  * singleton-free corpus collapses Chao1 to S_obs, periodic arrivals hit
  * burstiness -1, identical vocabularies overlap at 1, a pure k-bin
  * shift costs EMD = k, a single-type series cross-correlates at 1 with
  * its own aggregate, a star digraph concentrates all HITS authority,
  * perfectly clustered zones scan zero false rows, a certain bigram LM
  * scores zero surprisal, and an alternating series SAXes to one
  * repeated word.
  */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def ts(offsetSec: Long) = new java.sql.Timestamp(t0 + offsetSec * 1000)

  test("chao1Richness: no singletons/doubletons -> chao1 = S_obs, coverage = 1") {
    // every token appears exactly 3x within its source
    val docs = Seq(
      (1L, "apple banana apple banana apple banana", "en", "s1", 1L),
      (2L, "cherry cherry cherry", "en", "s1", 1L),
      (3L, "dog dog dog cat cat cat", "en", "s2", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Insights.chao1Richness(docs).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("n1") == 0L && row.getAs[Long]("n2") == 0L)
      assert(row.getAs[Double]("chao1") == row.getAs[Long]("s_obs").toDouble)
      assert(row.getAs[Double]("coverage") == 1.0)
    }
  }

  test("burstiness: perfectly periodic arrivals -> cv = 0, B = -1") {
    val ev = (0 until 10).map(i =>
      (i.toLong, ts(i * 60L), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Insights.burstiness(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_gaps") == 9L)
    assert(r(0).getAs[Double]("mean_gap_s") == 60.0)
    assert(r(0).getAs[Double]("cv") == 0.0)
    assert(r(0).getAs[Double]("burstiness") == -1.0)
  }

  test("vocabOverlap: identical sources -> weighted Jaccard = 1") {
    val docs = Seq(
      (1L, "a b b c", "en", "s1", 1L),
      (2L, "a b b c", "en", "s2", 1L),
      (3L, "x y", "en", "s3", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Insights.vocabOverlap(docs).collect()
    val same = r.find(x => x.getAs[String]("sa") == "s1" &&
      x.getAs[String]("sb") == "s2").get
    assert(same.getAs[Double]("wjaccard") == 1.0)
    assert(same.getAs[Long]("n_shared") == 3L)
    // disjoint vocabularies share no tokens -> no pair row at all
    assert(!r.exists(x => x.getAs[String]("sb") == "s3"))
  }

  test("histEmd: a pure k-bin shift costs exactly k") {
    val ev = ((0 until 20).map(i => (i.toLong, ts(i), 1L, "a", 0.5, "{}")) ++
      (0 until 20).map(i => (100L + i, ts(i), 1L, "b", 3.5, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Insights.histEmd(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("emd_bins") == 3.0)
  }

  test("crossCorrelation: a single type IS the aggregate -> ccf(0) = 1") {
    val ev = (0 until 10).map(i =>
      (i.toLong, ts(i * 86400L), 1L, "view", 10.0 + (i % 4) * 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Insights.crossCorrelation(ev).collect()
    val lag0 = r.find(_.getAs[Long]("lag") == 0L).get
    assert(math.abs(lag0.getAs[Double]("ccf") - 1.0) <= 1e-6)
    assert(lag0.getAs[Long]("n_pairs") == 10L)
  }

  test("hitsScores: star digraph concentrates all authority in the hub-free center") {
    val supplier = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((10L, 0L)).toDF("c_custkey", "c_nationkey")
    val orders = (1 to 3).map(i => (i.toLong, 10L)).toDF("o_orderkey", "o_custkey")
    val li = (1 to 3).map(i => (i.toLong, i.toLong)).toDF("l_orderkey", "l_suppkey")
    val r = Insights.hitsScores(li, orders, supplier, customer).collect()
    val byN = r.map(x => x.getAs[Long]("nationkey") ->
      (x.getAs[Double]("authority"), x.getAs[Double]("hub"))).toMap
    assert(byN(0L) == ((1.0, 0.0)))
    Seq(1L, 2L, 3L).foreach(n => assert(byN(n) == ((0.0, 0.333333))))
  }

  test("zoneMapAudit: perfectly clustered zones scan zero false rows") {
    val li = Seq(
      (0L, java.sql.Date.valueOf("1995-06-01")),
      (100L, java.sql.Date.valueOf("1995-07-01")),
      (600L, java.sql.Date.valueOf("1996-06-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val r = Insights.zoneMapAudit(li).collect()
    val y95 = r.find(_.getAs[Long]("ship_year") == 1995L).get
    assert(y95.getAs[Long]("n_zones") == 2L)
    assert(y95.getAs[Long]("zones_scanned") == 1L)
    assert(y95.getAs[Long]("rows_scanned") == 2L)
    assert(y95.getAs[Long]("rows_matched") == 2L)
    assert(y95.getAs[Double]("false_scan_fraction") == 0.0)
    assert(y95.getAs[Double]("scan_fraction") == 0.5)
    // a year no zone covers is fully pruned
    val y99 = r.find(_.getAs[Long]("ship_year") == 1999L).get
    assert(y99.getAs[Long]("zones_scanned") == 0L)
    assert(y99.isNullAt(y99.fieldIndex("false_scan_fraction")))
  }

  test("bigramSurprisal: a certain LM (single bigram, V=1) scores zero bits") {
    val docs = (1 to 4).map(i => (i.toLong, "x x x", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Insights.bigramSurprisal(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_docs") == 4L)
    assert(r(0).getAs[Double]("avg_xent_bits") == 0.0)
  }

  test("saxMotifs: balanced alternating series -> all segments neutral, one word") {
    val orders = (0 until 64).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i).toString), if (i % 2 == 0) 100.0 else 300.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val r = Insights.saxMotifs(orders).collect()
    assert(r.length == 32)
    // each 2-day segment holds one low + one high day -> PAA = series mean
    r.foreach { row =>
      assert(row.getAs[Long]("n_days") == 2L)
      assert(row.getAs[Double]("paa_z") == 0.0)
      assert(row.getAs[String]("symbol") == "c")
    }
    val withWord = r.filter(!_.isNullAt(r(0).fieldIndex("word")))
    assert(withWord.length == 29)
    withWord.foreach { row =>
      assert(row.getAs[String]("word") == "cccc")
      assert(row.getAs[Long]("word_support") == 29L)
    }
  }

  test("goodTuring on a hand spectrum: known adjusted counts and unseen mass") {
    import spark.implicits._
    // tokens: a a a b b c -> N1=N2=N3=1, N=6
    val docs = Seq((1L, "a a a b b c", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Insights.goodTuring(docs).collect()
      .map(x => x.getAs[Long]("r") -> x).toMap
    assert(math.abs(r(1L).getAs[Double]("r_star") - 2.0) < 1e-9) // 2*N2/N1
    assert(math.abs(r(2L).getAs[Double]("r_star") - 3.0) < 1e-9) // 3*N3/N2
    assert(r(3L).getAs[Double]("r_star") == 0.0)                 // N4 = 0
    assert(math.abs(r(1L).getAs[Double]("p0_unseen") - 1.0 / 6) < 1e-6)
    assert(r(2L).isNullAt(r(2L).fieldIndex("p0_unseen")))
  }

  test("goodTuring on the corpus: mass conservation sum r*N_r <= N, spectrum positive") {
    val rows = Insights.goodTuring(Tables.documents(spark, sf("sf0.001"))).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      g.foreach { x =>
        assert(x.getAs[Long]("n_r") > 0)
        assert(x.getAs[Double]("r_star") >= 0)
      }
    }
  }
}
