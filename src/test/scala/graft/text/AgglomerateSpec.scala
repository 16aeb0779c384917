package graft.text

import graft.{SparkSpec, Tables}

/** Laws for the corpus-structure comparison operators: single-linkage
  * merge semantics on a planted geometry and Burrows' Delta symmetry/
  * self-identity.
  */
class AgglomerateSpec extends SparkSpec {
  import spark.implicits._

  test("centroidLinkage merges the two closest planted centroids first") {
    // labels 0,1 nearly coincide; 2 and 3 are far away in distinct directions
    def v(a: Float, b: Float) = Seq(a, b) ++ Seq.fill(62)(0f)
    val emb = (
      Seq.tabulate(4)(i => (i.toLong, v(0f + i * 0.01f, 0f), 0)) ++
      Seq.tabulate(4)(i => (10L + i, v(0.02f + i * 0.01f, 0f), 1)) ++
      Seq.tabulate(4)(i => (20L + i, v(50f, 50f + i), 2)) ++
      Seq.tabulate(4)(i => (30L + i, v(-80f, 10f + i), 3))
    ).toDF("vec_id", "embedding", "label")
    val r = Agglomerate.centroidLinkage(spark, emb).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(r.length == 3)
    assert(r(0).getAs[Long]("cluster_a") == 0L && r(0).getAs[Long]("cluster_b") == 1L,
      "closest pair (0,1) merges first")
    assert(r.map(_.getAs[Long]("n_clusters_after")).toSeq == Seq(3L, 2L, 1L))
    // single linkage: merge distances are non-decreasing
    val ds = r.map(_.getAs[Double]("link_d2"))
    ds.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, s"linkage distance decreased: $a -> $b")
      case _ =>
    }
  }

  test("centroidLinkage on the corpus reduces cluster count by one per step") {
    val r = Agglomerate.centroidLinkage(spark,
      Tables.embeddings(spark, sf("sf0.001"))).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(r.length == 3)
    val after = r.map(_.getAs[Long]("n_clusters_after"))
    assert(after(0) == after(1) + 1 && after(1) == after(2) + 1)
    r.foreach(x => assert(x.getAs[Long]("cluster_a") < x.getAs[Long]("cluster_b")))
  }

  test("burrowsDelta: deltas positive, ranked ascending, pairs ordered") {
    val r = Agglomerate.burrowsDelta(Tables.documents(spark, sf("sf0.001"))).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(r.length == 10)
    val ds = r.map(_.getAs[Double]("delta"))
    assert(ds.sameElements(ds.sorted), "rank must follow ascending delta")
    r.foreach { x =>
      assert(x.getAs[Double]("delta") > 0)
      assert(x.getAs[String]("src_a") < x.getAs[String]("src_b"))
      assert(x.getAs[Long]("n_words") == 30L, "every source covers the top-30 words here")
    }
  }

  test("burrowsDelta detects a planted style twin as the closest pair") {
    // sources s0/s1 share a skewed word distribution; s2..s5 use a different one
    val styleA = ("alpha " * 30 + "beta " * 10 + "gamma " * 5).trim
    val styleB = ("delta " * 30 + "epsilon " * 10 + "zeta " * 5).trim
    val docs = (
      Seq((1L, styleA, "en", "s0", 10L), (2L, styleA, "en", "s1", 10L)) ++
      (2 to 5).map(i => (i.toLong + 1, styleB + s" w$i", "en", s"s$i", 10L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = Agglomerate.burrowsDelta(docs).collect()
      .minBy(_.getAs[Long]("rank"))
    assert(Set(top.getAs[String]("src_a"), top.getAs[String]("src_b")) ==
      Set("s0", "s1"), "the style twins must rank closest")
  }
}
