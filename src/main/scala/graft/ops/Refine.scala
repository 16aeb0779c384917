package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Iterative-refinement exact order statistics (SURVEY.md §2.9
  * extension surface): the k-th smallest element of a 100 TB column
  * without a global sort — equi-width histogram counting narrows the
  * candidate range once per round (256× per pass), and only the final
  * sub-10k-row range is collected and indexed. This is the canonical
  * distributed exact-median algorithm (iterative bucketing /
  * "median of medians at scale"); Spark's own percentile_approx is
  * approximate, and a global ORDER BY serializes — this is exact AND
  * shuffle-free (each round is one filtered aggregate; the filter
  * pushes to the scan).
  *
  * Oracle-exactness: the refinement is engine-internal — the ORACLE
  * checks only the final k-th VALUES against DuckDB's sorted rank,
  * which the algorithm computes exactly regardless of float bin-edge
  * placement (bins partition; the walk recounts).
  */
object Refine extends QueryModule {

  // ---------------------------------------------------------------- q287

  /** Exact p50/p90 of events.value by histogram refinement: k-th
    * smallest with k = ceil(q·n). Each round bins the surviving range
    * into 256 equi-width buckets (one aggregate; driver sees 256
    * counts), walks to the bucket containing the target rank, and
    * recurses; a bucket under 10k rows is collected (bounded, like
    * q35's sampleBy map) and indexed directly.
    */
  def refinementQuantile(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val vals = events.select(col("value").cast("double").as("v"))
      .localCheckpoint() // one corpus materialization; every round filters it
    val n = vals.count()

    def kth(k: Long): Double = {
      var subset = vals
      var krem = k
      var done = false
      var answer = Double.NaN
      var guard = 0
      while (!done && guard < 64) {
        guard += 1
        val cnt = subset.count()
        if (cnt <= 10000) {
          val arr = subset.orderBy("v").collect().map(_.getDouble(0))
          answer = arr((krem - 1).toInt)
          done = true
        } else {
          val Row2 = subset.agg(min("v"), max("v")).collect()(0)
          val (lo, hi) = (Row2.getDouble(0), Row2.getDouble(1))
          if (lo == hi) { answer = lo; done = true }
          else {
            val w = (hi - lo) / 256.0
            val binExpr = least(floor((col("v") - lit(lo)) / lit(w)), lit(255.0))
              .cast("int")
            val hist = subset.groupBy(binExpr.as("b")).count()
              .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
            var below = 0L
            var target = -1
            for ((b, c) <- hist if target < 0) {
              if (below + c >= krem) target = b else below += c
            }
            krem -= below
            subset = subset.filter(binExpr === target).localCheckpoint()
          }
        }
      }
      answer
    }

    val k50 = (n + 1) / 2
    val k90 = (9 * n + 9) / 10
    Seq(("p50", k50, kth(k50)), ("p90", k90, kth(k90)))
      .toDF("stat", "k", "vraw")
      .select(col("stat"), col("k"), round(col("vraw"), 6).as("value"))
      .orderBy("stat")
  }

  private val refineOracle = """
    WITH o AS (SELECT value FROM events),
    n AS (SELECT COUNT(*) AS c FROM o),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM o),
    ks AS (
      SELECT 'p50' AS stat, (c + 1) // 2 AS k FROM n
      UNION ALL SELECT 'p90', (9 * c + 9) // 10 FROM n)
    SELECT ks.stat, CAST(ks.k AS BIGINT) AS k,
      ROUND(r.value, 6) AS value
    FROM ks JOIN ranked r ON r.rn = ks.k
    ORDER BY ks.stat"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q287_refinement_quantile",
      (s, d) => refinementQuantile(s, events(s, d)), Some(refineOracle)),
  )
}
