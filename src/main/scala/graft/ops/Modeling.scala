package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num._
import graft.Tables._

/** Closed-form modeling diagnostics, round 8 of the extension surface
  * (none exist in the reference): the ridge regularization path on
  * standardized two-feature moments (the L2 shrinkage curve a feature
  * platform materializes before committing to a λ) and the
  * weight-of-evidence / information-value table (the credit-scoring
  * binning diagnostic for any binary-outcome score).
  *
  * Exactness: standardization means/sds are doubles of exact decimal
  * sums (gmmEm discipline); every cross-moment is a per-term
  * DECIMAL(18,6) sum; the 2×2 ridge solve and WoE logs are fixed double
  * expressions of those exact inputs. Scale: ridge is two corpus
  * passes (moments, then the λ grid runs on a 1-row frame); WoE is one
  * pass plus a 10-row rollup.
  */
object Modeling extends QueryModule {

  // ---------------------------------------------------------------- q358

  /** Ridge path over λ/n ∈ {0, 0.01, 0.1, 1, 10} for standardized
    * quantity/discount → price (dollars): β(λ) = (R + λI)⁻¹ r with R
    * the 2×2 feature correlation matrix — the exact closed form, no
    * iteration. R² falls and coefficients shrink as λ grows; λ=0 is
    * OLS. The solve runs on the 1-row moment frame.
    */
  def ridgePath(li: DataFrame): DataFrame = {
    val base = li.select(col("l_quantity").cast("double").as("x1"),
      col("l_discount").cast("double").as("x2"),
      (col("l_extendedprice") / 100.0).as("y"))
    val m = base.agg(count(lit(1)).as("n"),
        sum(dec(col("x1"), 6)).cast("decimal(28,6)").as("s1"),
        sum(dec(col("x2"), 6)).cast("decimal(28,6)").as("s2"),
        sum(dec(col("y"), 6)).cast("decimal(28,6)").as("sy"),
        sum(dec(col("x1") * col("x1"), 6)).cast("decimal(28,6)").as("s11"),
        sum(dec(col("x2") * col("x2"), 6)).cast("decimal(28,6)").as("s22"),
        sum(dec(col("y") * col("y"), 4)).cast("decimal(28,4)").as("syy"))
      .select(col("n"),
        expr("CAST(s1 AS DOUBLE) / n").as("m1"),
        expr("CAST(s2 AS DOUBLE) / n").as("m2"),
        expr("CAST(sy AS DOUBLE) / n").as("my"),
        expr("sqrt(GREATEST(CAST(s11 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1e-12))").as("sd1"),
        expr("sqrt(GREATEST(CAST(s22 AS DOUBLE) / n - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n), 1e-12))").as("sd2"),
        expr("sqrt(GREATEST(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 1e-12))").as("sdy"))
      .localCheckpoint()
    val z = base.crossJoin(broadcast(m))
      .select(((col("x1") - col("m1")) / col("sd1")).as("z1"),
        ((col("x2") - col("m2")) / col("sd2")).as("z2"),
        ((col("y") - col("my")) / col("sdy")).as("zy"))
    val mom = z.agg(count(lit(1)).as("n"),
        sum(dec(col("z1") * col("z2"), 6)).cast("decimal(28,6)").as("c12"),
        sum(dec(col("z1") * col("zy"), 6)).cast("decimal(28,6)").as("c1y"),
        sum(dec(col("z2") * col("zy"), 6)).cast("decimal(28,6)").as("c2y"),
        sum(dec(col("z1") * col("z1"), 6)).cast("decimal(28,6)").as("c11"),
        sum(dec(col("z2") * col("z2"), 6)).cast("decimal(28,6)").as("c22"))
      .select(col("n"),
        expr("CAST(c11 AS DOUBLE) / n").as("r11"),
        expr("CAST(c22 AS DOUBLE) / n").as("r22"),
        expr("CAST(c12 AS DOUBLE) / n").as("r12"),
        expr("CAST(c1y AS DOUBLE) / n").as("r1y"),
        expr("CAST(c2y AS DOUBLE) / n").as("r2y"))
      .localCheckpoint()
    val lambdas = Seq(0.0, 0.01, 0.1, 1.0, 10.0)
    lambdas.map { lam =>
      mom.select(lit(lam).as("lambda_rel"),
        expr(s"""ROUND(((r22 + $lam) * r1y - r12 * r2y)
          / ((r11 + $lam) * (r22 + $lam) - r12 * r12), 6)""").as("beta_qty"),
        expr(s"""ROUND(((r11 + $lam) * r2y - r12 * r1y)
          / ((r11 + $lam) * (r22 + $lam) - r12 * r12), 6)""").as("beta_disc"),
        expr(s"""ROUND(
          2 * (((r22 + $lam) * r1y - r12 * r2y)
            / ((r11 + $lam) * (r22 + $lam) - r12 * r12)) * r1y
          + 2 * (((r11 + $lam) * r2y - r12 * r1y)
            / ((r11 + $lam) * (r22 + $lam) - r12 * r12)) * r2y
          - (((r22 + $lam) * r1y - r12 * r2y)
            / ((r11 + $lam) * (r22 + $lam) - r12 * r12))
            * (((r22 + $lam) * r1y - r12 * r2y)
              / ((r11 + $lam) * (r22 + $lam) - r12 * r12)) * r11
          - 2 * (((r22 + $lam) * r1y - r12 * r2y)
            / ((r11 + $lam) * (r22 + $lam) - r12 * r12))
            * (((r11 + $lam) * r2y - r12 * r1y)
              / ((r11 + $lam) * (r22 + $lam) - r12 * r12)) * r12
          - (((r11 + $lam) * r2y - r12 * r1y)
            / ((r11 + $lam) * (r22 + $lam) - r12 * r12))
            * (((r11 + $lam) * r2y - r12 * r1y)
              / ((r11 + $lam) * (r22 + $lam) - r12 * r12)) * r22, 6)""")
          .as("r2_fit"))
    }.reduce(_ unionAll _).orderBy("lambda_rel")
  }

  private val ridgeOracle = """
    WITH base AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x1,
        CAST(l_discount AS DOUBLE) AS x2,
        l_extendedprice / 100.0 AS y
      FROM lineitem),
    m AS MATERIALIZED (
      SELECT COUNT(*) AS n,
        CAST(CAST(SUM(CAST(x1 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)
          / COUNT(*) AS m1,
        CAST(CAST(SUM(CAST(x2 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)
          / COUNT(*) AS m2,
        CAST(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)
          / COUNT(*) AS my,
        sqrt(GREATEST(
          CAST(CAST(SUM(CAST(x1 * x1 AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE) / COUNT(*)
          - (CAST(CAST(SUM(CAST(x1 AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*))
            * (CAST(CAST(SUM(CAST(x1 AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*)), 1e-12)) AS sd1,
        sqrt(GREATEST(
          CAST(CAST(SUM(CAST(x2 * x2 AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE) / COUNT(*)
          - (CAST(CAST(SUM(CAST(x2 AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*))
            * (CAST(CAST(SUM(CAST(x2 AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*)), 1e-12)) AS sd2,
        sqrt(GREATEST(
          CAST(CAST(SUM(CAST(y * y AS DECIMAL(16,4))) AS DECIMAL(28,4))
            AS DOUBLE) / COUNT(*)
          - (CAST(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*))
            * (CAST(CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DECIMAL(28,6))
              AS DOUBLE) / COUNT(*)), 1e-12)) AS sdy
      FROM base),
    z AS (
      SELECT (x1 - m1) / sd1 AS z1, (x2 - m2) / sd2 AS z2,
        (y - my) / sdy AS zy
      FROM base, m),
    mom AS MATERIALIZED (
      SELECT COUNT(*) AS n,
        CAST(CAST(SUM(CAST(z1 * z1 AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) / COUNT(*) AS r11,
        CAST(CAST(SUM(CAST(z2 * z2 AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) / COUNT(*) AS r22,
        CAST(CAST(SUM(CAST(z1 * z2 AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) / COUNT(*) AS r12,
        CAST(CAST(SUM(CAST(z1 * zy AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) / COUNT(*) AS r1y,
        CAST(CAST(SUM(CAST(z2 * zy AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) / COUNT(*) AS r2y
      FROM z),
    lams AS (SELECT CAST(unnest([0.0, 0.01, 0.1, 1.0, 10.0]) AS DOUBLE) AS lam),
    sol AS (
      SELECT lam,
        ((r22 + lam) * r1y - r12 * r2y)
          / ((r11 + lam) * (r22 + lam) - r12 * r12) AS b1,
        ((r11 + lam) * r2y - r12 * r1y)
          / ((r11 + lam) * (r22 + lam) - r12 * r12) AS b2,
        r11, r22, r12, r1y, r2y
      FROM mom, lams)
    SELECT lam AS lambda_rel, ROUND(b1, 6) AS beta_qty,
      ROUND(b2, 6) AS beta_disc,
      ROUND(2 * b1 * r1y + 2 * b2 * r2y - b1 * b1 * r11
        - 2 * b1 * b2 * r12 - b2 * b2 * r22, 6) AS r2_fit
    FROM sol ORDER BY lambda_rel"""

  // ---------------------------------------------------------------- q359

  /** Weight-of-evidence / information-value table: events fall into
    * value deciles (rank-pinned ntile); good = purchase events, bad =
    * the rest; WoE_b = ln(good share / bad share) with the standard
    * +0.5 Laplace smoothing, iv_contrib = (g−b)·WoE. The binning
    * diagnostic behind every scorecard feature screen. One pass plus a
    * 10-row rollup; ntile is the oracle-reproducible global-rank form
    * (at production scale the bin edges come from a quantile sketch
    * and the ntile becomes a range filter).
    */
  def woeIv(events: DataFrame): DataFrame = {
    val binned = events.select(col("event_id"), col("value"),
        (col("event_type") === "purchase").cast("long").as("good"))
      .withColumn("bin", ntile(10).over(
        Window.orderBy(col("value"), col("event_id"))))
    val byBin = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("good").as("n_good"))
      .withColumn("n_bad", col("n") - col("n_good"))
    val tot = byBin.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
    byBin.crossJoin(broadcast(tot))
      .select(col("bin").cast("long").as("bin"), col("n"), col("n_good"),
        col("n_bad"),
        expr("""ROUND(ln(((CAST(n_good AS DOUBLE) + 0.5D)
            / (CAST(tg AS DOUBLE) + 5.0D))
          / ((CAST(n_bad AS DOUBLE) + 0.5D)
            / (CAST(tb AS DOUBLE) + 5.0D))), 6)""").as("woe"),
        expr("""ROUND(((CAST(n_good AS DOUBLE) + 0.5D)
              / (CAST(tg AS DOUBLE) + 5.0D)
            - (CAST(n_bad AS DOUBLE) + 0.5D)
              / (CAST(tb AS DOUBLE) + 5.0D))
          * ln(((CAST(n_good AS DOUBLE) + 0.5D)
              / (CAST(tg AS DOUBLE) + 5.0D))
            / ((CAST(n_bad AS DOUBLE) + 0.5D)
              / (CAST(tb AS DOUBLE) + 5.0D))), 6)""").as("iv_contrib"))
      .orderBy("bin")
  }

  private val woeOracle = """
    WITH binned AS (
      SELECT event_id, value,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good,
        NTILE(10) OVER (ORDER BY value, event_id) AS bin
      FROM events),
    by_bin AS (
      SELECT bin, COUNT(*) AS n,
        CAST(SUM(good) AS BIGINT) AS n_good,
        COUNT(*) - CAST(SUM(good) AS BIGINT) AS n_bad
      FROM binned GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_good) AS BIGINT) AS tg,
        CAST(SUM(n_bad) AS BIGINT) AS tb
      FROM by_bin)
    SELECT CAST(bin AS BIGINT) AS bin, n, n_good, n_bad,
      ROUND(ln(((CAST(n_good AS DOUBLE) + 0.5) / (CAST(tg AS DOUBLE) + 5.0))
        / ((CAST(n_bad AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))),
        6) AS woe,
      ROUND(((CAST(n_good AS DOUBLE) + 0.5) / (CAST(tg AS DOUBLE) + 5.0)
          - (CAST(n_bad AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))
        * ln(((CAST(n_good AS DOUBLE) + 0.5) / (CAST(tg AS DOUBLE) + 5.0))
          / ((CAST(n_bad AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))),
        6) AS iv_contrib
    FROM by_bin, tot ORDER BY bin"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q358_ridge_path",
      (s, d) => ridgePath(lineitem(s, d)), Some(ridgeOracle)),
    Q("q359_woe_iv", (s, d) => woeIv(events(s, d)), Some(woeOracle)),
  )
}
