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

  test("tripletMargins on the corpus: violations bounded by anchors, margins finite") {
    val r = Geometry.tripletMargins(Tables.embeddings(spark, sf("sf0.01"))).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_violations") <= x.getAs[Long]("n_anchors"))
      assert(x.getAs[Double]("min_margin") <= x.getAs[Double]("mean_margin"))
    }
  }
}
