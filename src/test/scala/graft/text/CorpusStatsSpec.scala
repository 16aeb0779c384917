package graft.text

import graft.SparkSpec

/** Invariant laws for the corpus-comparison operators (CorpusStats):
  * G² vanishes on identical distributions and fires on planted keyness,
  * PMI matches its closed form on a planted collocation, richness hits
  * its uniform/degenerate bounds, kappa is 1 for perfectly agreeing
  * raters, and DSIR weights separate target-only from raw-only content.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, lang: String, text: String) =
    (id, lang, text, "srcA", text.length.toLong)

  test("llrKeyness: identical distributions give G2=0; target-only token fires") {
    val shared = (1 to 30).map("w" + _).mkString(" ")
    val docs = (Seq(
      doc(1, "en", shared + " onlyen onlyen onlyen onlyen onlyen onlyen onlyen onlyen onlyen onlyen"),
      doc(2, "de", shared)))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.llrKeyness(docs).collect()
    val only = r.find(_.getAs[String]("token") == "onlyen")
    assert(only.isDefined && only.get.getAs[Double]("g2") > 0.0)
    assert(only.get.getAs[String]("leans") == "en")
    assert(only.get.getAs[Long]("k2") == 0L)
  }

  test("pmiCollocations: an always-adjacent pair matches its closed form ln(4)") {
    // corpus = "a b" x 40 docs: cxy=40, cx=cy=40, Nu=80, Nb=40 => pmi=ln(4)
    val docs = (1 to 40).map(i => doc(i.toLong, "en", "a b"))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.pmiCollocations(docs).collect()
    assert(r.length == 1)
    assert(math.abs(r(0).getAs[Double]("pmi") - math.log(4.0)) < 1e-6)
    assert(r(0).getAs[Long]("cxy") == 40L)
  }

  test("lexicalRichness bounds: all-distinct tokens vs one repeated token") {
    val docs = Seq(
      doc(1, "en", (1 to 50).map("u" + _).mkString(" ")), // 50 distinct
      doc(2, "de", Seq.fill(50)("same").mkString(" ")))   // 1 type, f=50
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.lexicalRichness(docs).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    assert(r("en").getAs[Double]("yule_k") == 0.0)
    assert(r("en").getAs[Double]("simpson_d") == 0.0)
    assert(r("en").getAs[Double]("ttr") == 1.0)
    assert(r("de").getAs[Double]("simpson_d") == 1.0)
    assert(math.abs(r("de").getAs[Double]("yule_k") - 10000.0 * (50.0 * 50 - 50) / 2500.0) < 1e-6)
  }

  test("cohensKappa: perfectly agreeing raters with both classes give kappa=1") {
    val long = (1 to 60).map("t" + _).mkString(" ") // 60 tokens
    val short = (1 to 10).map("t" + _).mkString(" ")
    val docs = Seq(
      (1L, "en", long, "srcA", 400L),  // ra=T (chars>300), rb=T (tokens>55)
      (2L, "en", short, "srcA", 100L)) // ra=F, rb=F
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.cohensKappa(docs).collect()(0)
    assert(r.getAs[Double]("po") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
    assert(r.getAs[Long]("n11") == 1L && r.getAs[Long]("n00") == 1L)
  }

  test("dsirWeights: target-only content scores positive, raw-only negative") {
    val docs = ((1 to 10).map(i => doc(i.toLong, "en", "aaaaaaaaaaaa")) ++
      (11 to 20).map(i => doc(i.toLong, "zh", "bbbbbbbbbbbb")))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.dsirWeights(docs).collect()
      .map(x => x.getAs[String]("lang") -> x.getAs[Double]("mean_score")).toMap
    assert(r("en") > 0.0)  // 'aa' bigrams concentrate in the target slice
    assert(r("zh") < 0.0)
  }

  test("negativeSampling: the 3/4 power flattens the head (sample < freq share)") {
    val docs = (1 to 50).map(i =>
        (i.toLong, "en", if (i <= 45) "common common common rare" + i
                         else "x" + i + " y" + i, "web", 20L))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = CorpusStats.negativeSampling(docs, top = 5).collect()
    val head = r(0)
    assert(head.getAs[String]("token") == "common")
    // smoothing must shrink the most frequent token's share
    assert(head.getAs[Double]("sample_ppm") < head.getAs[Double]("freq_ppm"))
  }
}
