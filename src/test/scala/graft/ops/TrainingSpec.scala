package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariant laws for the training-data pipeline operators: weighted
  * sampling bias, span-corruption accounting, fertility bounds, RAKE
  * scoring laws, clustering-coefficient range, density-outlier
  * consistency.
  */
class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("poissonSample returns exactly k rows per source, ranked by exact priority") {
    val r = Training.poissonSample(Tables.documents(spark, sf("sf0.001"))).collect()
    val bySrc = r.groupBy(_.getString(0))
    assert(bySrc.values.forall(_.length == 5))
    bySrc.values.foreach { g =>
      val prios = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("priority"))
      assert(prios.sameElements(prios.sorted), "rank must follow ascending priority")
    }
    // w_share is a probability fraction
    assert(r.forall { x =>
      val s = x.getAs[Double]("w_share"); s > 0 && s < 1 })
  }

  test("poissonSample favors heavy docs: selection rate of top-weight half >= bottom half") {
    // weights = n_chars; selected docs should skew heavy because priority = u/w
    val docs = Tables.documents(spark, sf("sf0.01"))
    val sel = Training.poissonSample(docs).select("doc_id").as[Long].collect().toSet
    val byW = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val (light, heavy) = byW.splitAt(byW.length / 2)
    val lightRate = light.count(d => sel(d._1)).toDouble / light.length
    val heavyRate = heavy.count(d => sel(d._1)).toDouble / heavy.length
    assert(heavyRate >= lightRate,
      s"weighted sample must favor heavy docs: heavy=$heavyRate light=$lightRate")
  }

  test("spanCorruption accounting: mask_ratio near 15%, spans*mean = masked, max >= mean") {
    val rows = Training.spanCorruption(Tables.documents(spark, sf("sf0.01"))).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("mask_ratio")
      assert(ratio > 0.10 && ratio < 0.20, s"hash mask rate should be ~0.15, got $ratio")
      val masked = r.getAs[Long]("total_masked")
      val spans = r.getAs[Long]("total_spans")
      val mean = r.getAs[Double]("mean_span")
      assert(math.abs(spans * mean - masked) < 0.5 * spans + 1)
      assert(r.getAs[Long]("max_span") >= math.ceil(mean).toLong - 1)
      assert(masked <= r.getAs[Long]("total_tokens"))
    }
  }

  test("spanCorruption on a hand fixture: known mask pattern yields exact span stats") {
    // doc_id=7: mask(pos) = ((pos+1)*1315423911 + 8*2654435761) % 100 < 15
    val text = (0 until 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val expected = (0 until 50).map(p =>
      ((p + 1).toLong * 1315423911L + 8L * 2654435761L) % 100 < 15)
    val nMask = expected.count(identity)
    val nSpans = expected.zip(false +: expected.dropRight(1))
      .count { case (cur, prev) => cur && !prev }
    val r = Training.spanCorruption(docs).collect()(0)
    assert(r.getAs[Long]("total_masked") == nMask)
    assert(r.getAs[Long]("total_spans") == nSpans)
  }

  test("tokenizerFertility: fertility >= 1 on space-joined word text and ratios reconcile") {
    val rows = Training.tokenizerFertility(Tables.documents(spark, sf("sf0.001"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every whitespace word contains at least one pre-tokenizer token
      assert(r.getAs[Double]("fertility") >= 1.0)
      val bpe = r.getAs[Long]("bpe_tokens").toDouble
      assert(math.abs(r.getAs[Double]("tokens_per_doc") -
        bpe / r.getAs[Long]("n_docs")) < 1e-3 + 1e-9 * bpe)
    }
  }

  test("rakeKeywords: degree >= freq law makes every score >= phrase min length 1") {
    val rows = Training.rakeKeywords(Tables.documents(spark, sf("sf0.001"))).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.length <= 8)
      val scores = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sortBy(-(_: Double))), "rank follows score desc")
      // RAKE: word score = degree/freq >= 1 (a word's phrase contains itself),
      // so a phrase of n words scores >= n
      g.foreach { r =>
        assert(r.getAs[Double]("score") >= r.getAs[Long]("n_words").toDouble - 1e-6)
        assert(r.getAs[Long]("n_words") <= 6)
      }
    }
  }

  test("rakeKeywords on a fixture: single repeated phrase scores its word count") {
    // one phrase "alpha beta" twice, separated by stopwords only
    val docs = Seq((1L, "alpha beta the alpha beta", "en", "s0", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Training.rakeKeywords(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("phrase") == "alpha beta")
    assert(r(0).getAs[Long]("n_occ") == 2L)
    // alpha: freq 2, degree 4 (two phrases of len 2) => 2; beta same => score 4
    assert(math.abs(r(0).getAs[Double]("score") - 4.0) < 1e-9)
  }

  test("clusteringCoeff: lcc in [0,1], triangles bounded by wedges, star graph gives 0") {
    val rows = Training.clusteringCoeff(
      Tables.lineitem(spark, sf("sf0.001")), Tables.orders(spark, sf("sf0.001")),
      Tables.supplier(spark, sf("sf0.001")), Tables.customer(spark, sf("sf0.001")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      val tri = r.getAs[Long]("triangles")
      assert(tri <= deg * (deg - 1) / 2)
      if (deg > 1) {
        val lcc = r.getAs[Double]("lcc")
        assert(lcc >= 0.0 && lcc <= 1.0)
        assert(math.abs(lcc - 2.0 * tri / (deg * (deg - 1.0))) < 1e-6)
      } else assert(r.isNullAt(r.fieldIndex("lcc")))
    }
  }

  test("densityOutliers: outliers <= n_vecs and bucket extremes bracket the mean") {
    val rows = Training.densityOutliers(Tables.embeddings(spark, sf("sf0.01"))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("min_bucket") <= r.getAs[Long]("max_bucket"))
      val rate = r.getAs[Double]("outlier_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("harmonicCentrality: a planted path graph 0-1-2-3 gives exact BFS distances") {
    import spark.implicits._
    // edge i-(i+1) realized as supplier-nation i trading with customer-nation i+1
    val li = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("l_orderkey", "l_suppkey")
    val ords = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("o_orderkey", "o_custkey")
    val sup = Seq((10L, 0L), (20L, 1L), (30L, 2L)).toDF("s_suppkey", "s_nationkey")
    val cust = Seq((100L, 1L), (200L, 2L), (300L, 3L)).toDF("c_custkey", "c_nationkey")
    val r = Training.harmonicCentrality(li, ords, sup, cust).collect()
      .map(x => x.getAs[Long]("nationkey") ->
        (x.getAs[Long]("reach3"), x.getAs[Long]("harmonic_ppm"),
          x.getAs[Long]("ecc3"))).toMap
    // node 0: d(1)=1, d(2)=2, d(3)=3 -> 1000000 + 500000 + 333333
    assert(r(0L) == ((3L, 1833333L, 3L)))
    // node 1: d(0)=1, d(2)=1, d(3)=2 -> 1000000 + 1000000 + 500000
    assert(r(1L) == ((3L, 2500000L, 2L)))
  }
}
