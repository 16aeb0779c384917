package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Evidence for the r7 headline change: prefix-filtered set-similarity
  * joins (the q27/q68 default paths) are LOSSLESS against brute force on
  * randomized corpora, and a corpus-wide boilerplate shingle generates
  * NO candidate fan-out (the d² blowup the naive shared-shingle join
  * suffers). The oracle pins production outputs; this pins the algebra
  * on adversarial corpora the parquet fixtures don't contain.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Word 4-shingle set, mirroring WordShingles(text, 4). */
  private def shingles(text: String): Set[String] = {
    val t = text.split(" ")
    if (t.length < 4) Set.empty
    else t.sliding(4).map(_.mkString(" ")).toSet
  }

  private def docsDf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def brutePairs(texts: Seq[String], measure: (Set[String], Set[String]) => Double,
      threshold: Double): Set[(Long, Long)] = {
    val sh = texts.map(shingles)
    (for {
      a <- texts.indices; b <- (a + 1) until texts.length
      if sh(a).nonEmpty && sh(b).nonEmpty
      if measure(sh(a), sh(b)) >= threshold
    } yield (a.toLong, b.toLong)).toSet
  }

  private def jac(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size

  private def cont(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / math.min(a.size, b.size)

  test("prefix-filtered jaccard/containment pairs are lossless vs brute force on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    for (trial <- 0 until 3) {
      // duplication-heavy corpus: base docs plus mutated near-copies so
      // both measures fire at their default thresholds
      val base = (0 until 15).map(_ =>
        (0 until (6 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val mutated = base.filter(_ => rnd.nextBoolean()).map { t =>
        val toks = t.split(" ").toBuffer
        if (toks.length > 4) toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.size))
        toks.mkString(" ")
      }
      val sub = base.filter(_ => rnd.nextBoolean())
        .map(t => t.split(" ").take(5).mkString(" ")) // embedded sub-documents
      val texts = base ++ mutated ++ sub
      val df = docsDf(texts)

      val gotJ = Dedup.ppjoinPairs(df, 0.6).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotJ == brutePairs(texts, jac, 0.6), s"jaccard pair set, trial $trial")

      val gotC = Dedup.containmentPairs(df, 0.7).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotC == brutePairs(texts, cont, 0.7), s"containment pair set, trial $trial")
    }
  }

  test("a corpus-wide boilerplate shingle generates no candidate fan-out") {
    // every doc: the same 5-word boilerplate header + 20 unique words.
    // The naive shared-shingle self-join would emit >= n(n-1)/2 candidate
    // rows from the header shingles alone (every doc shares them); under
    // the df-order the header shingles are the COMMONEST, so they sit at
    // the end of every doc's ranked list and never enter a prefix.
    val n = 120
    val texts = (0 until n).map(i =>
      "the quick brown fox jumps " + (0 until 20).map(j => s"u${i}_$j").mkString(" "))
    val planted = texts :+ texts(7) // one true duplicate pair
    val df = docsDf(planted)
    val cands = Dedup.ppjoinCandidates(df, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sharedPairFloor = n.toLong * (n - 1) / 2
    assert(cands.length < n,
      s"prefix filter must not fan out on boilerplate: ${cands.length} candidates " +
        s"(a shared-shingle join generates >= $sharedPairFloor)")
    assert(cands.contains((7L, n.toLong)), "the planted duplicate pair must survive")
    // and the verified output finds exactly the planted duplicate
    val pairs = Dedup.ppjoinPairs(df, 0.6).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 7L && pairs(0).getLong(1) == n.toLong)
  }
}
