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
    // ONE corpus pass: raw decimal moments (y kilodollar-scaled so every
    // y-product stays < 2^53 unscaled at all graded SFs); correlations
    // derive from the moments in fixed double expressions that are
    // textual twins of the oracle's
    // exact-scale casts: quantity is integer, discount 2 dp, price 2 dp
    // (cents) — so y = price/1e5 has EXACTLY 7 decimals and every cast
    // below is lossless. A scale-6 cast of y hits exact .5 ties that
    // Spark (shortest-string HALF_UP) and DuckDB (binary value) round
    // differently — the systematic drift this replaced. y² needs 14
    // decimals, so it accumulates as exact integer cents² and converts
    // to double through the <2^53 hi/lo split (the q347 idiom).
    val base = li.select(col("l_quantity").cast("double").as("x1"),
      col("l_discount").cast("double").as("x2"),
      (col("l_extendedprice") / 100000.0).as("y"),
      round(col("l_extendedprice") * 100).cast("decimal(18,0)").as("cents"))
    val m = base.agg(count(lit(1)).as("n"),
        sum(dec(col("x1"), 6)).cast("decimal(28,6)").as("s1"),
        sum(dec(col("x2"), 6)).cast("decimal(28,6)").as("s2"),
        sum(col("y").cast("decimal(18,7)")).cast("decimal(28,7)").as("sy"),
        sum(dec(col("x1") * col("x1"), 6)).cast("decimal(28,6)").as("s11"),
        sum(dec(col("x2") * col("x2"), 6)).cast("decimal(28,6)").as("s22"),
        sum(dec(col("x1") * col("x2"), 6)).cast("decimal(28,6)").as("s12"),
        sum((col("x1") * col("y")).cast("decimal(18,8)"))
          .cast("decimal(28,8)").as("s1y"),
        sum((col("x2") * col("y")).cast("decimal(18,9)"))
          .cast("decimal(28,9)").as("s2y"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("syy_c"))
    val mom = m
      .withColumn("m1", expr("CAST(s1 AS DOUBLE) / n"))
      .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n"))
      .withColumn("my", expr("CAST(sy AS DOUBLE) / n"))
      .withColumn("c11", expr("GREATEST(CAST(s11 AS DOUBLE) / n - m1 * m1, 1e-12)"))
      .withColumn("c22", expr("GREATEST(CAST(s22 AS DOUBLE) / n - m2 * m2, 1e-12)"))
      .withColumn("cyy", expr("""GREATEST(
        (CAST(syy_c DIV 67108864 AS DOUBLE) * 67108864.0
          + CAST(syy_c % 67108864 AS DOUBLE)) / 1e14 / n - my * my,
        1e-12)"""))
      .withColumn("r12", expr(
        "(CAST(s12 AS DOUBLE) / n - m1 * m2) / sqrt(c11 * c22)"))
      .withColumn("r1y", expr(
        "(CAST(s1y AS DOUBLE) / n - m1 * my) / sqrt(c11 * cyy)"))
      .withColumn("r2y", expr(
        "(CAST(s2y AS DOUBLE) / n - m2 * my) / sqrt(c22 * cyy)"))
      .withColumn("r11", lit(1.0))
      .withColumn("r22", lit(1.0))
      .select("n", "r11", "r22", "r12", "r1y", "r2y")
    // The λ grid runs as ONE projection over the exploded 5-row frame:
    // the previous per-λ select + unionAll compiled five copies of the
    // closed-form expression tree and scheduled five jobs on a 1-row
    // checkpointed frame; λ as a column is the same IEEE arithmetic.
    val lam = "lambda_rel"
    mom.select(col("*"), explode(expr(
        "array(0.0D, 0.01D, 0.1D, 1.0D, 10.0D)")).as(lam))
      .select(col(lam),
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
      .orderBy("lambda_rel")
  }

  private val ridgeOracle = """
    WITH base AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x1,
        CAST(l_discount AS DOUBLE) AS x2,
        l_extendedprice / 100000.0 AS y,
        CAST(ROUND(l_extendedprice * 100, 0) AS DECIMAL(18,0)) AS cents
      FROM lineitem),
    m AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(x1 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s1,
        CAST(SUM(CAST(x2 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s2,
        CAST(SUM(CAST(y AS DECIMAL(18,7))) AS DECIMAL(28,7)) AS sy,
        CAST(SUM(CAST(x1 * x1 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s11,
        CAST(SUM(CAST(x2 * x2 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s22,
        CAST(SUM(CAST(x1 * x2 AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s12,
        CAST(SUM(CAST(x1 * y AS DECIMAL(18,8))) AS DECIMAL(28,8)) AS s1y,
        CAST(SUM(CAST(x2 * y AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS s2y,
        CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
          AS syy_c
      FROM base),
    m1s AS (
      SELECT n, s12, s1y, s2y,
        CAST(s1 AS DOUBLE) / n AS m1,
        CAST(s2 AS DOUBLE) / n AS m2,
        CAST(sy AS DOUBLE) / n AS my,
        GREATEST(CAST(s11 AS DOUBLE) / n
          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1e-12)
          AS c11,
        GREATEST(CAST(s22 AS DOUBLE) / n
          - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n), 1e-12)
          AS c22,
        GREATEST(
          (CAST(CAST(syy_c AS HUGEINT) // 67108864 AS DOUBLE) * 67108864.0
            + CAST(CAST(syy_c AS HUGEINT) % 67108864 AS DOUBLE)) / 1e14 / n
          - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 1e-12)
          AS cyy
      FROM m),
    mom AS MATERIALIZED (
      SELECT n, CAST(1.0 AS DOUBLE) AS r11, CAST(1.0 AS DOUBLE) AS r22,
        (CAST(s12 AS DOUBLE) / n - m1 * m2) / sqrt(c11 * c22) AS r12,
        (CAST(s1y AS DOUBLE) / n - m1 * my) / sqrt(c11 * cyy) AS r1y,
        (CAST(s2y AS DOUBLE) / n - m2 * my) / sqrt(c22 * cyy) AS r2y
      FROM m1s),
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
    // ntile(10) distributes via the two-level bucket decomposition
    // (value cents DIV 256 buckets) — bin identical to the flat
    // global-window form the oracle keeps
    val binned = Dist.withNtile(
      events.select(col("event_id"), col("value"),
        (col("event_type") === "purchase").cast("long").as("good")),
      expr("CAST(value * 100 AS BIGINT) DIV 256"),
      Seq(col("value"), col("event_id")), 10, "bin")
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

  // ---------------------------------------------------------------- q383

  /** Cook's distance for the daily-revenue OLS trend: per day,
    * leverage h = 1/n + (t−t̄)²/Stt and D = e²·h/(2s²(1−h)²) — the
    * influence diagnostic that names the exact days bending the trend
    * line. The series is exact integer dollars (cents DIV 100, the
    * q384 discipline); moments are one pass, per-day terms a second;
    * output is the top-10 by (D desc, day).
    */
  def cooksDistance(li: DataFrame, top: Int = 10): DataFrame = {
    val daily = li.groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(expr("sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) DIV 100")
        .as("y"))
      .withColumn("t", row_number().over(Window.orderBy("day")))
      .localCheckpoint()
    val m = daily.agg(count(lit(1)).as("n"),
        sum("t").as("st"), sum("y").as("sy"),
        sum(expr("CAST(t AS BIGINT) * t")).as("stt"),
        sum((col("t").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("sty"),
        sum((col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("syy"))
      .select(col("n"),
        expr("CAST(st AS DOUBLE) / n").as("mt"),
        expr("CAST(sy AS DOUBLE) / n").as("my"),
        expr("CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n")
          .as("sttc"),
        expr("CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) / n")
          .as("styc"),
        expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n")
          .as("syyc"))
      .withColumn("b", expr("styc / sttc"))
      .withColumn("s2", expr("(syyc - styc * styc / sttc) / (n - 2)"))
      .localCheckpoint()
    daily.crossJoin(broadcast(m))
      .withColumn("h", expr("1.0 / n + (t - mt) * (t - mt) / sttc"))
      .withColumn("e", expr("CAST(y AS DOUBLE) - (my + b * (t - mt))"))
      .withColumn("cook_d", expr(
        "e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))"))
      .orderBy(col("cook_d").desc, col("day"))
      .limit(top)
      .select(col("day"), col("t").cast("long").as("t"), col("y"),
        round(col("h"), 8).as("leverage"),
        round(col("e"), 4).as("residual"),
        round(col("cook_d"), 8).as("cook_d"))
  }

  private def cooksOracle(top: Int = 10): String = s"""
    WITH daily0 AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
        CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) // 100
          AS BIGINT) AS y
      FROM lineitem GROUP BY 1),
    daily AS MATERIALIZED (
      SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily0),
    m0 AS (
      SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st,
        CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(CAST(t AS BIGINT) * t) AS BIGINT) AS stt,
        SUM(CAST(CAST(t AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
          AS DECIMAL(38,0))) AS sty,
        SUM(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
          AS DECIMAL(38,0))) AS syy
      FROM daily),
    m1 AS (
      SELECT n, CAST(st AS DOUBLE) / n AS mt, CAST(sy AS DOUBLE) / n AS my,
        CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / n
          AS sttc,
        CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) / n
          AS styc,
        CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n
          AS syyc
      FROM m0),
    m2 AS MATERIALIZED (
      SELECT *, styc / sttc AS b,
        (syyc - styc * styc / sttc) / (n - 2) AS s2
      FROM m1),
    scored AS (
      SELECT d.day, d.t, d.y,
        1.0 / m.n + (d.t - m.mt) * (d.t - m.mt) / m.sttc AS h,
        CAST(d.y AS DOUBLE) - (m.my + m.b * (d.t - m.mt)) AS e
      FROM daily d, m2 m),
    cook AS (
      SELECT day, t, y, h, e,
        e * e * h / (2.0 * (SELECT s2 FROM m2)
          * (1.0 - h) * (1.0 - h)) AS cook_d
      FROM scored)
    SELECT day, CAST(t AS BIGINT) AS t, y,
      ROUND(h, 8) AS leverage, ROUND(e, 4) AS residual,
      ROUND(cook_d, 8) AS cook_d
    FROM cook ORDER BY cook_d DESC, day LIMIT $top"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q383_cooks_distance",
      (s, d) => cooksDistance(lineitem(s, d)), Some(cooksOracle())),
    Q("q358_ridge_path",
      (s, d) => ridgePath(lineitem(s, d)), Some(ridgeOracle)),
    Q("q359_woe_iv", (s, d) => woeIv(events(s, d)), Some(woeOracle)),
  )
}
