package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num._
import graft.Tables._

/** Econometric / time-series diagnostics over the daily revenue panel,
  * round 8 of the extension surface (the reference has no statistics
  * beyond a single offline AUC, `03a_Model Training.py:300-330`): the
  * Friedman rank test with Kendall's W over the day×type block design,
  * classic max-drawdown on the daily series, Yule-Walker AR(2)
  * coefficients, the Breusch-Pagan heteroscedasticity LM test, and the
  * Chow structural-break F test.
  *
  * Oracle-exactness discipline (graft-oracle-exactness): every
  * statistic is exact-integer end-to-end — daily revenue collapses to
  * BIGINT cents (or truncated dollars where squares would overflow
  * DECIMAL(38,0)), ranks use the double-rank trick (2·rank + ties − 1,
  * so mid-ranks stay integral), and every final ratio is a pinned-scale
  * truncating DIV (both engines truncate toward zero) — never a
  * DECIMAL→DOUBLE cast whose last ulp could differ past 2^53 (the q250
  * lesson).
  *
  * Scale discipline: each query is ONE corpus shuffle (the daily
  * rollup); all window/rank/moment work runs on the calendar-bounded
  * daily frame (≤ tens of kB per event type regardless of corpus
  * size). Magnitude notes at each DIV document the DECIMAL(38,0)
  * headroom at 100 TB-scale daily totals.
  */
object Econometrics extends QueryModule {

  /** Daily revenue in exact integer cents per event type. */
  private def daily(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum((dec(col("value"), 2) * 100).cast("decimal(18,0)"))
        .cast("long").as("cents"))

  private val dailySql = """
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q409

  /** Friedman rank test + Kendall's W over the complete-block design
    * blocks=days, treatments=event types, response=daily revenue cents.
    * Mid-rank ties use the integral double-rank 2·rank+ties−1; the
    * statistic Q = 3·ΣR₂ⱼ²/(n·k·(k+1)) − 3·n·(k+1) and concordance
    * W = Q/(n·(k−1)) are emitted in ppm via truncating DIV, so the walk
    * is bit-identical across engines. Only days observing every
    * treatment enter (complete blocks — the classical design).
    */
  def friedmanKendall(events: DataFrame): DataFrame = {
    val d = daily(events)
    val k = d.select(countDistinct("event_type").as("k"))
    val complete = d.join(broadcast(k))
      .withColumn("nty", count(lit(1)).over(Window.partitionBy("day")))
      .filter(col("nty") === col("k"))
    val ranked = complete
      .withColumn("rk", rank().over(Window.partitionBy("day").orderBy("cents")))
      .withColumn("ties", count(lit(1)).over(Window.partitionBy("day", "cents")))
      .withColumn("r2", lit(2) * col("rk") + col("ties") - 1)
    val perTreat = ranked.groupBy("event_type", "k")
      .agg(sum("r2").as("r2_sum"), count(lit(1)).as("n"))
    perTreat.groupBy("k")
      .agg(max("n").as("n_blocks"),
        sum(col("r2_sum") * col("r2_sum")).as("sum_r2sq"))
      // R₂ⱼ = 2·Rⱼ, so ΣRⱼ² = ΣR₂ⱼ²/4 and 12·ΣRⱼ² = 3·ΣR₂ⱼ².
      // Magnitudes: R₂ⱼ ≤ 2kn ~ 1e4, ΣR₂ⱼ² ~ 1e9·k; ×1e6 « 2^63.
      .select(col("k"), col("n_blocks"), col("sum_r2sq"),
        expr("""3 * sum_r2sq * 1000000 DIV (n_blocks * k * (k + 1))
                - 3 * n_blocks * (k + 1) * 1000000""").as("q_ppm"))
      .select(col("k"), col("n_blocks"), col("sum_r2sq"), col("q_ppm"),
        expr("q_ppm DIV (n_blocks * (k - 1))").as("w_ppm"))
  }

  private val friedmanOracle = s"""
    WITH daily AS ($dailySql),
    kk AS (SELECT COUNT(DISTINCT event_type) AS k FROM daily),
    complete AS (
      SELECT d.*, k FROM daily d, kk
      QUALIFY COUNT(*) OVER (PARTITION BY day) = k),
    ranked AS (
      SELECT event_type, k,
        2 * RANK() OVER (PARTITION BY day ORDER BY cents)
          + COUNT(*) OVER (PARTITION BY day, cents) - 1 AS r2
      FROM complete),
    pt AS (
      SELECT event_type, k, SUM(r2) AS r2_sum, COUNT(*) AS n
      FROM ranked GROUP BY 1, 2),
    agg AS (
      SELECT k, MAX(n) AS n_blocks, SUM(r2_sum * r2_sum) AS sum_r2sq
      FROM pt GROUP BY 1),
    q AS (
      SELECT k, n_blocks, sum_r2sq,
        3 * sum_r2sq * 1000000 // (n_blocks * k * (k + 1))
          - 3 * n_blocks * (k + 1) * 1000000 AS q_ppm
      FROM agg)
    SELECT CAST(k AS BIGINT) AS k, CAST(n_blocks AS BIGINT) AS n_blocks,
      CAST(sum_r2sq AS BIGINT) AS sum_r2sq, CAST(q_ppm AS BIGINT) AS q_ppm,
      CAST(q_ppm // (n_blocks * (k - 1)) AS BIGINT) AS w_ppm
    FROM q"""

  // ---------------------------------------------------------------- q410

  /** Classic max drawdown of the daily revenue series per event type:
    * running peak, drawdown = peak − today, the maximum drawdown, its
    * (earliest) trough day, the peak standing at that trough, and the
    * relative depth in ppm. Exact integer cents end-to-end; one corpus
    * shuffle then two windows over the daily frame.
    */
  def maxDrawdown(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily(events)
      .withColumn("peak", max("cents").over(w))
      .withColumn("dd", col("peak") - col("cents"))
    val mx = dd.groupBy(col("event_type").as("et"))
      .agg(max("dd").as("max_dd"), count(lit(1)).as("n_days"))
    dd.join(mx, col("event_type") === col("et") && col("dd") === col("max_dd"))
      .groupBy("event_type", "n_days", "max_dd")
      .agg(min("day").as("trough_day"),
        min_by(col("peak"), col("day")).as("peak_at_trough"))
      .select(col("event_type"), col("n_days"),
        col("max_dd").as("max_dd_cents"), col("trough_day"),
        col("peak_at_trough").as("peak_cents"),
        expr("max_dd * 1000000 DIV peak_at_trough").as("depth_ppm"))
      .orderBy("event_type")
  }

  private val drawdownOracle = s"""
    WITH daily AS ($dailySql),
    dd AS (
      SELECT event_type, day, cents,
        MAX(cents) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily),
    d2 AS (SELECT *, peak - cents AS d FROM dd),
    mx AS (
      SELECT event_type, MAX(d) AS max_dd, COUNT(*) AS n_days
      FROM d2 GROUP BY 1),
    at AS (
      SELECT d2.event_type, n_days, max_dd, MIN(day) AS trough_day,
        MIN_BY(peak, day) AS peak_at_trough
      FROM d2 JOIN mx ON d2.event_type = mx.event_type AND d2.d = mx.max_dd
      GROUP BY 1, 2, 3)
    SELECT event_type, n_days, max_dd AS max_dd_cents, trough_day,
      peak_at_trough AS peak_cents,
      CAST(max_dd * 1000000 // peak_at_trough AS BIGINT) AS depth_ppm
    FROM at ORDER BY event_type"""

  // ---------------------------------------------------------------- q411

  /** Yule-Walker AR(2) fit of the daily revenue series per event type.
    * Autocovariances are exact integers on the n-scaled centered series
    * vₜ = n·xₜ − Σx (no rational mean ever materializes); the
    * autocorrelations and the φ solves are ppm-scaled truncating
    * divisions: φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²).
    * Magnitudes: v ~ n·cents ≤ 1e3·1e9 = 1e12 even at 1000× daily
    * revenue, c₀ = Σv² ≤ 1e3·1e24 = 1e27, ×1e6 « 10^38.
    */
  def yuleWalker(events: DataFrame): DataFrame = {
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val d = daily(events)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("s", sum("cents").over(Window.partitionBy("event_type")))
      .withColumn("v", (col("n") * col("cents") - col("s")).cast("decimal(38,0)"))
      .withColumn("v1", lead("v", 1).over(byDay))
      .withColumn("v2", lead("v", 2).over(byDay))
    val c = d.groupBy("event_type")
      .agg(max("n").as("n_days"),
        sum(col("v") * col("v")).as("c0"),
        sum(col("v") * col("v1")).as("c1"),
        sum(col("v") * col("v2")).as("c2"))
    c.filter(col("c0") > 0)
      .withColumn("r1_ppm", expr("CAST(coalesce(c1, 0) * 1000000 DIV c0 AS BIGINT)"))
      .withColumn("r2_ppm", expr("CAST(coalesce(c2, 0) * 1000000 DIV c0 AS BIGINT)"))
      .withColumn("den", expr("1000000000000 - r1_ppm * r1_ppm"))
      .select(col("event_type"), col("n_days"), col("r1_ppm"), col("r2_ppm"),
        expr("""CASE WHEN den <> 0 THEN
            CAST(r1_ppm * (1000000 - r2_ppm) * 1000000 DIV den AS BIGINT)
          END""").as("phi1_ppm"),
        expr("""CASE WHEN den <> 0 THEN
            CAST((r2_ppm * 1000000 - r1_ppm * r1_ppm) * 1000000 DIV den AS BIGINT)
          END""").as("phi2_ppm"))
      .orderBy("event_type")
  }

  private val yuleWalkerOracle = s"""
    WITH daily AS ($dailySql),
    v AS (
      SELECT event_type, day,
        CAST(COUNT(*) OVER w0 * cents - SUM(cents) OVER w0 AS DECIMAL(38,0)) AS v,
        COUNT(*) OVER w0 AS n
      FROM daily
      WINDOW w0 AS (PARTITION BY event_type)),
    lagd AS (
      SELECT event_type, n, v,
        LEAD(v, 1) OVER w AS v1, LEAD(v, 2) OVER w AS v2
      FROM v WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    c AS (
      SELECT event_type, MAX(n) AS n_days,
        SUM(v * v) AS c0, SUM(v * v1) AS c1, SUM(v * v2) AS c2
      FROM lagd GROUP BY 1),
    r AS (
      -- HUGEINT casts: DuckDB's // on DECIMAL goes through double
      -- division (rounds); on HUGEINT it truncates like Spark's DIV
      SELECT event_type, n_days,
        CAST(CAST(COALESCE(c1, 0) AS HUGEINT) * 1000000
             // CAST(c0 AS HUGEINT) AS BIGINT) AS r1_ppm,
        CAST(CAST(COALESCE(c2, 0) AS HUGEINT) * 1000000
             // CAST(c0 AS HUGEINT) AS BIGINT) AS r2_ppm
      FROM c WHERE c0 > 0),
    d AS (SELECT *, 1000000000000 - r1_ppm * r1_ppm AS den FROM r)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days, r1_ppm, r2_ppm,
      CASE WHEN den <> 0 THEN
        CAST(r1_ppm * (1000000 - r2_ppm) * 1000000 // den AS BIGINT) END
        AS phi1_ppm,
      CASE WHEN den <> 0 THEN
        CAST((r2_ppm * 1000000 - r1_ppm * r1_ppm) * 1000000 // den AS BIGINT) END
        AS phi2_ppm
    FROM d ORDER BY event_type"""

  // ---------------------------------------------------------------- q412

  /** Breusch-Pagan heteroscedasticity LM test per event type: OLS of
    * daily revenue (whole dollars, truncated — keeps every later square
    * inside DECIMAL(38,0)) on the day index, residuals via the exact
    * n·bden-scaled form eₜ ∝ bden·(n·yₜ−Σy) − bnum·(n·t−Σt), then the
    * auxiliary R² of deci-scaled squared residuals on the centered
    * index τ = 2t−(n+1). LM = n·R², emitted in ppm through a two-step
    * truncating DIV (A²/B then ·1e6/C) — exact-integer end-to-end.
    * Magnitude headroom documented inline against 1000× daily revenue.
    */
  def breuschPagan(events: DataFrame): DataFrame = {
    val d = daily(events)
      .withColumn("y", expr("cents DIV 100"))
      .withColumn("t", row_number().over(
        Window.partitionBy("event_type").orderBy("day")).cast("long"))
    val m = d.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"), sum("t").as("st"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("t") * col("t")).cast("decimal(38,0)")).as("stt"),
        sum((col("t") * col("y")).cast("decimal(38,0)")).as("sty"))
      .withColumn("bnum", expr("n * sty - st * sy"))
      .withColumn("bden", expr("n * stt - st * st"))
    // e_deci = 10·e exact-truncated; u = e_deci² ~ 1e12 at y~1e5 so
    // n·Σu² ~ 1e30 and A² ≤ 4e36 stay inside DECIMAL(38,0)
    val res = d.join(broadcast(m), col("event_type") === col("et"))
      .withColumn("ee", expr(
        "bden * (n * CAST(y AS DECIMAL(38,0)) - sy) - bnum * (n * t - st)"))
      .withColumn("u", expr("CAST(ee * 10 DIV (n * bden) AS DECIMAL(38,0))"))
      .withColumn("u", col("u") * col("u"))
      .withColumn("tau", expr("CAST(2 * t - (n + 1) AS DECIMAL(38,0))"))
    res.groupBy("event_type")
      .agg(max("n").as("n"),
        expr("CAST(MAX(bnum * 1000 DIV bden) AS BIGINT)").as("slope_milli"),
        sum(col("u") * col("tau")).as("a"),
        sum(col("tau") * col("tau")).as("b"),
        sum("u").as("su"),
        sum(col("u") * col("u")).as("suu"))
      .withColumn("cc", expr("n * suu - su * su"))
      // R² = A²·10⁶/(B·C) factored as ((A·10³ DIV B)·A·10³) DIV C so no
      // intermediate quotient leaves BIGINT range (Spark's decimal DIV
      // yields LONG) and no product leaves DECIMAL(38,0)
      .select(col("event_type"), col("n").as("n_days"), col("slope_milli"),
        expr("""CASE WHEN cc > 0 THEN
            CAST(((a * 1000 DIV b) * a * 1000) DIV cc AS BIGINT) ELSE 0 END""")
          .as("r2_ppm"))
      .withColumn("lm_stat_ppm", expr("n_days * r2_ppm"))
      .orderBy("event_type")
  }

  private val breuschPaganOracle = s"""
    WITH daily AS ($dailySql),
    d AS (
      SELECT event_type, cents // 100 AS y,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS t
      FROM daily),
    m AS (
      SELECT event_type AS et, COUNT(*) AS n, SUM(t) AS st,
        SUM(CAST(y AS DECIMAL(38,0))) AS sy,
        SUM(CAST(t * t AS DECIMAL(38,0))) AS stt,
        SUM(CAST(t * y AS DECIMAL(38,0))) AS sty
      FROM d GROUP BY 1),
    mb AS (
      SELECT *, n * sty - st * sy AS bnum, n * stt - st * st AS bden FROM m),
    res AS (
      -- HUGEINT //: truncating integer division matching Spark's DIV
      -- (DuckDB's DECIMAL // rounds through double division)
      SELECT event_type, n, bnum, bden, t,
        CAST(CAST((bden * (n * CAST(y AS DECIMAL(38,0)) - sy)
              - bnum * (n * t - st)) * 10 AS HUGEINT)
             // CAST(n * bden AS HUGEINT) AS HUGEINT) AS ud,
        CAST(2 * t - (n + 1) AS HUGEINT) AS tau
      FROM d JOIN mb ON d.event_type = mb.et),
    agg AS (
      SELECT event_type, MAX(n) AS n,
        CAST(MAX(CAST(bnum * 1000 AS HUGEINT) // CAST(bden AS HUGEINT))
          AS BIGINT) AS slope_milli,
        SUM(ud * ud * tau) AS a, SUM(tau * tau) AS b,
        SUM(ud * ud) AS su, SUM(ud * ud * ud * ud) AS suu
      FROM res GROUP BY 1),
    fin AS (
      SELECT event_type, n AS n_days, slope_milli,
        CASE WHEN n * suu - su * su > 0 THEN
          CAST(((a * 1000 // b) * a * 1000) // (n * suu - su * su) AS BIGINT)
        ELSE 0 END AS r2_ppm
      FROM agg)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days, slope_milli, r2_ppm,
      CAST(n_days * r2_ppm AS BIGINT) AS lm_stat_ppm
    FROM fin ORDER BY event_type"""

  // ---------------------------------------------------------------- q413

  /** Chow structural-break F test per event type at the pinned midpoint
    * t ≤ n/2: pooled-vs-split OLS of daily dollars on the day index.
    * Each segment's SSR comes from the exact moment identity
    * SSR·n·B = C·B − A² (A = nSxy−SxSy, B = nSxx−Sx², C = nSyy−Sy²),
    * milli-scaled by truncating DIV; F = ((SSRp−SSR1−SSR2)·(n−4)·10⁶)
    * DIV ((SSR1+SSR2)·2) in ppm. Exact integers end-to-end; one corpus
    * shuffle + one grouped pass over the daily frame.
    */
  def chowTest(events: DataFrame): DataFrame = {
    val d = daily(events)
      .withColumn("y", expr("cents DIV 100"))
      .withColumn("t", row_number().over(
        Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .withColumn("n_all", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("seg", when(col("t") <= expr("n_all DIV 2"), 1).otherwise(2))
    def ssrMilli(df: DataFrame, grp: Seq[String]): DataFrame =
      df.groupBy(grp.map(col): _*)
        .agg(count(lit(1)).as("n"), sum("t").as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("t") * col("t")).cast("decimal(38,0)")).as("sxx"),
          sum((col("t") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
        .withColumn("a", expr("n * sxy - sx * sy"))
        .withColumn("b", expr("n * sxx - sx * sx"))
        .withColumn("c", expr("n * syy - sy * sy"))
        .withColumn("ssr_milli",
          expr("CAST((c * b - a * a) * 1000 DIV (n * b) AS DECIMAL(38,0))"))
    val pooled = ssrMilli(d, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"),
        col("ssr_milli").as("ssr_pooled"))
    val segs = ssrMilli(d, Seq("event_type", "seg"))
      .groupBy(col("event_type").as("et"))
      .agg(sum("ssr_milli").as("ssr_split"))
    pooled.join(segs, col("event_type") === col("et"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(ssr_pooled AS BIGINT)").as("ssr_pooled_milli"),
        expr("CAST(ssr_split AS BIGINT)").as("ssr_split_milli"),
        expr("""CASE WHEN ssr_split > 0 THEN
            CAST((ssr_pooled - ssr_split) * (n_days - 4) * 1000000
                 DIV (ssr_split * 2) AS BIGINT) END""").as("f_ppm"))
      .orderBy("event_type")
  }

  private val chowOracle = s"""
    WITH daily AS ($dailySql),
    d AS (
      SELECT event_type, cents // 100 AS y,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS t,
        COUNT(*) OVER (PARTITION BY event_type) AS n_all
      FROM daily),
    seg AS (SELECT *, CASE WHEN t <= n_all // 2 THEN 1 ELSE 2 END AS sg FROM d),
    mom AS (
      SELECT event_type, sg, COUNT(*) AS n, SUM(t) AS sx,
        SUM(CAST(y AS DECIMAL(38,0))) AS sy,
        SUM(CAST(t * t AS DECIMAL(38,0))) AS sxx,
        SUM(CAST(t * y AS DECIMAL(38,0))) AS sxy,
        SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
      FROM seg GROUP BY GROUPING SETS ((event_type), (event_type, sg))),
    ssr AS (
      -- HUGEINT //: truncation matching Spark DIV (DECIMAL // rounds)
      SELECT event_type, sg, n,
        CAST(((n * syy - sy * sy) * (n * sxx - sx * sx)
              - (n * sxy - sx * sy) * (n * sxy - sx * sy)) * 1000 AS HUGEINT)
             // CAST(n * (n * sxx - sx * sx) AS HUGEINT) AS ssr_milli
      FROM mom),
    pooled AS (
      SELECT event_type, n AS n_days, ssr_milli AS ssr_pooled
      FROM ssr WHERE sg IS NULL),
    split AS (
      SELECT event_type, SUM(ssr_milli) AS ssr_split
      FROM ssr WHERE sg IS NOT NULL GROUP BY 1)
    SELECT p.event_type, CAST(n_days AS BIGINT) AS n_days,
      CAST(ssr_pooled AS BIGINT) AS ssr_pooled_milli,
      CAST(ssr_split AS BIGINT) AS ssr_split_milli,
      CASE WHEN ssr_split > 0 THEN
        CAST(CAST((ssr_pooled - ssr_split) * (n_days - 4) * 1000000 AS HUGEINT)
             // CAST(ssr_split * 2 AS HUGEINT) AS BIGINT) END AS f_ppm
    FROM pooled p JOIN split s ON p.event_type = s.event_type
    ORDER BY p.event_type"""

  override def queries: Seq[Q] = Seq(
    Q("q409_friedman_kendall",
      (s, d) => friedmanKendall(events(s, d)), Some(friedmanOracle)),
    Q("q410_max_drawdown",
      (s, d) => maxDrawdown(events(s, d)), Some(drawdownOracle)),
    Q("q411_yule_walker",
      (s, d) => yuleWalker(events(s, d)), Some(yuleWalkerOracle)),
    Q("q412_breusch_pagan",
      (s, d) => breuschPagan(events(s, d)), Some(breuschPaganOracle)),
    Q("q413_chow_test",
      (s, d) => chowTest(events(s, d)), Some(chowOracle)),
  )
}
