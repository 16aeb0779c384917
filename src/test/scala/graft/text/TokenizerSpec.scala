package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for the tokenizer-training operators: BPE pair accounting on a
  * hand fixture and the Kneser-Ney normalization law (conditional
  * probabilities sum to 1 per context).
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMergeCandidates counts weighted pairs exactly on a fixture") {
    // "abab" x3 + "ab" x2: pairs ab:3*3+2=11? abab -> ab,ba,ab = 2*ab+1*ba per occurrence
    // f(abab)=3 => ab: 6, ba: 3 ; f(ab)=2 => ab: 2  => ab total 8, ba 3
    val docs = Seq((1L, "abab abab abab ab ab", "en", "s0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Tokenizer.bpeMergeCandidates(docs).collect()
    val byPair = r.map(x => x.getAs[String]("pair") ->
      x.getAs[Long]("pair_count")).toMap
    assert(byPair("ab") == 8L)
    assert(byPair("ba") == 3L)
    assert(r.head.getAs[String]("pair") == "ab", "top rank is the heaviest pair")
    // char masses: a = 2*3 + 1*2 = 8, b = 8
    val top = r.head
    assert(top.getAs[Long]("left_count") == 8L)
    assert(top.getAs[Long]("right_count") == 8L)
  }

  test("bpeMergeCandidates on the corpus: rank follows count, scores positive") {
    val r = Tokenizer.bpeMergeCandidates(
      Tables.documents(spark, sf("sf0.001"))).collect()
    assert(r.length == 10)
    val counts = r.sortBy(_.getAs[Long]("bpe_rank")).map(_.getAs[Long]("pair_count"))
    assert(counts.sameElements(counts.sortBy(-(_: Long))))
    assert(r.forall(_.getAs[Double]("wordpiece_score_e9") > 0))
  }

  test("kneserNey: per-context conditional probabilities sum to 1 (normalization law)") {
    // Verify the smoothing identity directly from the count tables on a
    // small corpus: for every context w1,
    //   sum_w2 [max(c-d,0) + d*n1f(w1)*n1b(w2)/NT] / cu(w1) == 1
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val bg = docs.select(split(col("text"), " ").as("t"))
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> named_struct('w1', t[i], 'w2', t[i+1]))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
      .cache()
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"),
      countDistinct("w2").as("n1f"))
    val n1b = bg.select("w1", "w2").distinct()
      .groupBy("w2").agg(count(lit(1)).as("n1b"))
    val nt = bg.select("w1", "w2").distinct().count().toDouble
    // KN mass per context: observed-bigram part + backoff part spread over
    // the WHOLE vocab of continuations. Over observed pairs only:
    //   sum max(c-d,0)/cu = 1 - d*n1f/cu ; the backoff part must supply
    //   d*n1f/cu * sum_w2 Pcont(w2) = d*n1f/cu (Pcont sums to 1 over vocab)
    val obs = cb.join(cu, "w1")
      .groupBy("w1").agg(
        max("cu").as("cu"), max("n1f").as("n1f"),
        sum(greatest(col("cb").cast("double") - 0.75, lit(0.0))).as("mass"))
      .collect()
    obs.foreach { r =>
      val cuV = r.getAs[Long]("cu").toDouble
      val expected = cuV - 0.75 * r.getAs[Long]("n1f")
      assert(math.abs(r.getAs[Double]("mass") - expected) < 1e-6,
        "discounted observed mass = cu - d*n1f")
    }
    // and Pcont sums to exactly 1 over the vocabulary
    val pcont = n1b.agg(sum(col("n1b"))).collect()(0).getLong(0).toDouble / nt
    assert(math.abs(pcont - 1.0) < 1e-12)
  }

  test("kneserNey per-source report: xent positive, perplexity = exp(xent)") {
    val r = Tokenizer.kneserNeyBigram(Tables.documents(spark, sf("sf0.001"))).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val xe = x.getAs[Double]("avg_xent_nats")
      assert(xe > 0, "self-evaluated corpus entropy is positive")
      assert(math.abs(x.getAs[Double]("perplexity") - math.exp(xe)) < 1e-3)
      assert(x.getAs[Long]("n_bigrams") > 0)
    }
  }
}
