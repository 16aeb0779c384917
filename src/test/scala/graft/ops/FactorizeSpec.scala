package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for the factorization/allocation operators: power-iteration
  * convergence toward a planted principal axis, curriculum stage
  * monotonicity, and largest-remainder apportionment exactness.
  */
class FactorizeSpec extends SparkSpec {
  import spark.implicits._

  test("powerIteration recovers a planted dominant axis and loads unit-norm") {
    // 40 vectors along e1 (±10) + small fixed e2 noise: top PC ≈ e1
    val rows = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      (i.toLong, Seq(sign * 10f, (i % 5 - 2) * 0.1f, 0.01f * (i % 3)), 0)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Factorize.powerIteration(emb).collect()
    val loadings = r.map(x => x.getAs[Long]("dim") -> x.getAs[Double]("loading")).toMap
    assert(math.abs(math.abs(loadings(1L)) - 1.0) < 1e-3,
      s"dominant dim must carry ~all the loading, got ${loadings(1L)}")
    assert(math.abs(loadings(2L)) < 0.05 && math.abs(loadings(3L)) < 0.05)
    val l2 = math.sqrt(r.map(x => math.pow(x.getAs[Double]("loading"), 2)).sum)
    assert(math.abs(l2 - 1.0) < 1e-4, s"loadings must be unit L2, got $l2")
    // Rayleigh estimate ~ mean squared projection = 100 * n / n
    assert(r.head.getAs[Double]("eigenvalue") > 90.0 * 40)
  }

  test("powerIteration on the corpus: unit loadings, positive eigenvalue bounded by total energy") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val r = Factorize.powerIteration(emb).collect()
    assert(r.length == 64)
    val l2 = math.sqrt(r.map(x => math.pow(x.getAs[Double]("loading"), 2)).sum)
    assert(math.abs(l2 - 1.0) < 1e-4)
    val eig = r.head.getAs[Double]("eigenvalue")
    val energy = emb.select(explode(col("embedding")).as("v"))
      .agg(sum(col("v") * col("v"))).as[Double].collect()(0)
    assert(eig > 0 && eig <= energy * 1.0001,
      s"eigenvalue $eig must lie in (0, total energy $energy]")
  }

  test("curriculumStages: contiguous difficulty bands, near-equal sizes, full coverage") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val r = Factorize.curriculumStages(docs).collect().sortBy(_.getAs[Long]("stage"))
    assert(r.length == 4)
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(r.map(_.getAs[Long]("n_docs")).max -
      r.map(_.getAs[Long]("n_docs")).min <= 1, "ntile sizes differ by <= 1")
    r.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_difficulty") <= hi.getAs[Long]("min_difficulty"),
          "stage bands must be non-overlapping and increasing")
      case _ =>
    }
  }

  test("apportionBudget: allocations are integers summing to the budget, within 1 of ideal") {
    val r = Factorize.apportionBudget(Tables.documents(spark, sf("sf0.01"))).collect()
    assert(r.map(_.getAs[Long]("allocation")).sum == 10000L)
    r.foreach { x =>
      val diff = x.getAs[Long]("allocation") - x.getAs[Double]("ideal_quota")
      assert(math.abs(diff) < 1.0, s"Hamilton stays within 1 seat of quota: $diff")
      assert(x.getAs[Long]("base") <= x.getAs[Long]("allocation"))
      assert(x.getAs[Long]("allocation") - x.getAs[Long]("base") <= 1)
    }
  }

  test("apportionBudget fixture: known remainders seat the largest first") {
    // weights 5,3,2 over budget 10000 → exact thirds: 5000/3000/2000, no leftovers
    val docs = Seq(
      (1L, ("w " * 5).trim, "en", "a", 9L),
      (2L, ("w " * 3).trim, "en", "b", 5L),
      (3L, ("w " * 2).trim, "en", "c", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Factorize.apportionBudget(docs).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("allocation")).toMap
    assert(r == Map("a" -> 5000L, "b" -> 3000L, "c" -> 2000L))
  }
}
