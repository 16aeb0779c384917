package graft.text

import graft.{SparkSpec, Tables}

/** Laws for the round-8 cluster-validity and neighborhood operators:
  * silhouette sign on planted separable clusters, Davies–Bouldin
  * shrinkage as separation grows, Calinski–Harabasz invariants, hubness
  * vote conservation, and TwoNN bounds plus its exact-duplicate guard.
  */
class ClusterQualitySpec extends SparkSpec {
  import spark.implicits._

  private def planted(sep: Float) = {
    def v(a: Float) = Seq(a, a / 2) ++ Seq.fill(62)(0f)
    ((0 until 8).map(i => (i.toLong, v(i * 0.1f), 0)) ++
      (0 until 8).map(i => (100L + i, v(sep + i * 0.1f), 1)))
      .toDF("vec_id", "embedding", "label")
  }

  test("silhouetteLite: well-separated planted clusters score near 1, none negative") {
    val r = ClusterQuality.silhouetteLite(planted(100f)).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Double]("mean_silhouette") > 0.9)
      assert(row.getAs[Long]("n_negative") == 0L)
    }
  }

  test("daviesBouldin: r_i shrinks as cluster separation grows") {
    def meanR(sep: Float): Double = {
      val rows = ClusterQuality.daviesBouldin(planted(sep)).collect()
      rows.map(_.getAs[Double]("r_i")).sum / rows.length
    }
    val near = meanR(5f)
    val far = meanR(500f)
    assert(far < near, s"DB must shrink with separation: near=$near far=$far")
  }

  test("calinskiHarabasz: corpus invariants and separation monotonicity") {
    val r = ClusterQuality.calinskiHarabasz(Tables.embeddings(spark, sf("sf0.001")))
      .collect()(0)
    assert(r.getAs[Long]("n_vecs") == 500L)
    assert(r.getAs[Long]("k") == 10L)
    assert(r.getAs[Double]("ssw") > 0 && r.getAs[Double]("ssb") > 0)
    val nearP = ClusterQuality.calinskiHarabasz(planted(5f)).collect()(0)
      .getAs[Long]("ch_index_ppm")
    val farP = ClusterQuality.calinskiHarabasz(planted(500f)).collect()(0)
      .getAs[Long]("ch_index_ppm")
    assert(farP > nearP, "CH must grow with separation")
  }

  test("hubness: every vector casts exactly 3 votes; ranks are a permutation") {
    val r = ClusterQuality.hubness(Tables.embeddings(spark, sf("sf0.001"))).collect()
    assert(r.length == 64)
    val totalVotes = r.map(_.getAs[Long]("k_occ")).sum
    assert(totalVotes == 3L * 500,
      s"vote conservation: got $totalVotes, want ${3 * 500}")
    assert(r.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 64L))
  }

  test("twonnDimension: positive, below ambient dims, robust to exact duplicates") {
    val r = ClusterQuality.twonnDimension(Tables.embeddings(spark, sf("sf0.001")))
      .collect()(0)
    val id = r.getAs[Double]("id_twonn")
    assert(id > 0 && id < 64, s"intrinsic dim out of range: $id")
    // corpus + exact duplicates of every 10th vector: d2=0 pairs excluded
    val base = Tables.embeddings(spark, sf("sf0.001"))
    val dup = base.filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)
      .withColumn("vec_id",
        org.apache.spark.sql.functions.col("vec_id") + 1000000L)
    val r2 = ClusterQuality.twonnDimension(base.unionByName(dup)).collect()(0)
    assert(r2.getAs[Long]("n_anchors") > 0)
    assert(!r2.getAs[Double]("id_twonn").isNaN)
  }

  test("labelSpreading: seeds stay correct; counts partition every vector") {
    val r = ClusterQuality.labelSpreading(
      Tables.embeddings(spark, sf("sf0.001"))).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, seeds, r1, r2x, un) = (x.getAs[Long]("n_vecs"),
        x.getAs[Long]("n_seeds"), x.getAs[Long]("n_r1"),
        x.getAs[Long]("n_r2"), x.getAs[Long]("n_unassigned"))
      assert(seeds + r1 + r2x + un == n,
        s"rounds must partition: $seeds+$r1+$r2x+$un != $n")
      // seeds predict themselves -> correct count at least the seed count
      assert(x.getAs[Long]("n_correct") >= seeds)
      assert(x.getAs[Long]("acc_ppm") <= 1000000L)
    }
  }
}
