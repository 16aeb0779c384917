package graft.text

import graft.{SparkSpec, Tables}

/** Laws for the embedding-geometry operators: Gonzalez gap
  * monotonicity and the Mahalanobis mean-score identity.
  */
class GeometrySpec extends SparkSpec {
  import spark.implicits._

  test("kcenterSeeds: greedy gaps non-increasing from round 2, picks distinct") {
    val r = Geometry.kcenterSeeds(spark, Tables.embeddings(spark, sf("sf0.001")))
      .collect().sortBy(_.getAs[Long]("round"))
    assert(r.length == 4)
    assert(r.map(_.getAs[Long]("vec_id")).distinct.length == 4)
    // the max-min distance to the selected set can only shrink as it grows
    val gaps = r.drop(1).map(_.getAs[Double]("sq_gap"))
    gaps.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, s"gap grew: $a -> $b")
      case _ =>
    }
    assert(gaps.forall(_ > 0))
  }

  test("kcenterSeeds on a planted 3-cluster fixture picks one point per far cluster") {
    // clusters at (+100,0..), (-100,0..), (0,+100..): k-center must visit all three
    def v(a: Float, b: Float) = Seq(a, b) ++ Seq.fill(62)(0f)
    val emb = (
      (0 until 5).map(i => (i.toLong, v(100f + i, 0f), 0)) ++
      (0 until 5).map(i => (10L + i, v(-100f - i, 0f), 1)) ++
      (0 until 5).map(i => (20L + i, v(0f, 100f + i), 2))
    ).toDF("vec_id", "embedding", "label")
    val picks = Geometry.kcenterSeeds(spark, emb).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val clusters = picks.map(id => id / 10)
    assert(clusters == Set(0L, 1L, 2L), s"must cover all clusters, picked $picks")
  }

  test("mahalanobisOutliers: mean score equals dims (z-score normalization identity)") {
    val r = Geometry.mahalanobisOutliers(Tables.embeddings(spark, sf("sf0.01"))).collect()
    assert(r.nonEmpty)
    val totalN = r.map(_.getAs[Long]("n_vecs")).sum
    val grand = r.map(x => x.getAs[Double]("mean_score") * x.getAs[Long]("n_vecs")).sum / totalN
    // sum_i sum_j (x-mu)^2/v_j = N * dims exactly (biased variance) up to rounding
    assert(math.abs(grand - 64.0) < 0.01, s"grand mean score must be ~64, got $grand")
    r.foreach { x =>
      assert(x.getAs[Double]("max_score") >= x.getAs[Double]("mean_score"))
      assert(x.getAs[String]("top_outliers").split(",").length == 3)
    }
  }

  test("tripletMargins on a planted separable geometry: all margins positive") {
    // tight clusters per label, far apart: dneg >> dpos for every anchor
    def v(a: Float, b: Float) = Seq(a, b) ++ Seq.fill(62)(0f)
    val emb = (
      Seq.tabulate(5)(i => (i * 97L, v(0f + i * 0.1f, 0f), 0)) ++
      Seq.tabulate(5)(i => (1L + i, v(100f + i * 0.1f, 0f), 1))
    ).toDF("vec_id", "embedding", "label")
    val r = Geometry.tripletMargins(emb).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_violations") == 0L,
        "separable clusters must have no margin violations")
      assert(x.getAs[Double]("mean_margin") > 0)
      assert(x.getAs[Double]("min_margin") > 0)
    }
  }

  test("productQuantization: occupancy partitions the corpus per subspace") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val n = emb.count()
    val r = Geometry.productQuantization(emb).collect()
    val bySub = r.groupBy(_.getAs[Long]("subspace"))
    assert(bySub.keySet == Set(1L, 2L))
    bySub.values.foreach { g =>
      assert(g.map(_.getAs[Long]("n_members")).sum == n,
        "every vector is coded in every subspace")
      g.foreach(x => assert(x.getAs[Double]("avg_d2") >= 0))
    }
  }

  test("productQuantization separates planted per-subspace clusters") {
    // subspace 1 (dims 1-32) splits on dim 1 sign; subspace 2 on dim 33 sign;
    // seeds 1..4 cover both signs in both subspaces
    def v(a: Float, b: Float) = (Seq(a) ++ Seq.fill(31)(0f)) ++
      (Seq(b) ++ Seq.fill(31)(0f))
    val emb = (
      Seq((1L, v(50f, 50f), 0), (2L, v(-50f, 50f), 0),
        (3L, v(50f, -50f), 0), (4L, v(-50f, -50f), 0)) ++
      (0 until 40).map { i =>
        val sa = if (i % 2 == 0) 45f + i else -45f - i
        val sb = if (i % 4 < 2) 45f + i else -45f - i
        (100L + i, v(sa, sb), 1)
      }).toDF("vec_id", "embedding", "label")
    val r = Geometry.productQuantization(emb).collect()
    // each subspace must use exactly 2 effective sign-cells heavily; the
    // within-cell error is tiny vs the 100-unit cluster separation
    r.foreach { x =>
      assert(x.getAs[Double]("avg_d2") < 45 * 45,
        "cells must not straddle the planted sign clusters")
    }
  }

  test("tripletMargins anchor budget is absolute: count independent of corpus size") {
    // a corpus 4x larger must broadcast the SAME number of anchors —
    // the budget is a count, not a fraction (the r7 %97 rule grew 4x)
    def corpus(n: Int) = (0 until n).map { i =>
      (i.toLong, Seq.tabulate(64)(d => ((i * 7 + d) % 13).toFloat), i % 3)
    }.toDF("vec_id", "embedding", "label")
    def anchorTotal(n: Int): Long =
      Geometry.tripletMargins(corpus(n)).collect()
        .map(_.getAs[Long]("n_anchors")).sum
    val small = anchorTotal(200)
    val large = anchorTotal(800)
    assert(small <= 64L && large <= 64L,
      s"anchor totals must respect the 64 budget: $small / $large")
    assert(small == large,
      s"anchor count must not grow with the corpus: $small -> $large")
  }

  test("tripletMargins on the corpus: violations bounded by anchors, margins finite") {
    val r = Geometry.tripletMargins(Tables.embeddings(spark, sf("sf0.01"))).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_violations") <= x.getAs[Long]("n_anchors"))
      assert(x.getAs[Double]("min_margin") <= x.getAs[Double]("mean_margin"))
    }
  }

  test("anisotropy: identical directions give cos 1, orthonormal give cos 0") {
    def v(a: Float, b: Float) = Seq(a, b) ++ Seq.fill(62)(0f)
    val same = Seq((1L, v(3f, 0f), 0), (2L, v(7f, 0f), 0), (3L, v(2f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val rs = Geometry.anisotropy(same).collect()(0)
    assert(math.abs(rs.getAs[Double]("mean_pairwise_cos") - 1.0) < 1e-9)
    val orth = Seq((1L, v(5f, 0f), 0), (2L, v(0f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
    val ro = Geometry.anisotropy(orth).collect()(0)
    assert(math.abs(ro.getAs[Double]("mean_pairwise_cos")) < 1e-9)
  }
  test("alignmentUniformity: identical same-label vectors give alignment 0, uniformity 0") {
    def v(a: Float) = Seq(a) ++ Seq.fill(63)(0f)
    // all vectors identical direction -> every pair distance 0
    val emb = (1L to 8L).map(i => (i, v(2f), 0)).toDF("vec_id", "embedding", "label")
    val r = Geometry.alignmentUniformity(emb).collect()(0)
    assert(math.abs(r.getAs[Double]("alignment")) < 1e-9)
    assert(math.abs(r.getAs[Double]("uniformity")) < 1e-9)
    assert(r.getAs[Long]("n_pos_pairs") == 4L)
    assert(r.getAs[Long]("n_rand_pairs") == 4L)
  }

}
