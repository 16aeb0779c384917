package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._
import graft.Num._

/** Multiple-testing and robust-inference operators a curation pipeline
  * runs over pipeline telemetry (SURVEY.md §2.9 extension surface):
  * Benjamini-Hochberg FDR control across a battery of segment tests,
  * the Brown-Forsythe (median-centered Levene) variance-homogeneity
  * test, the Mann-Kendall monotone-trend test with tie-corrected
  * variance, and Herfindahl-Hirschman revenue concentration. None
  * exist in the reference (its only audit is the split groupBy/count,
  * `03a_Model Training.py:93-94`).
  *
  * Shared scale discipline (see graft-oracle-exactness memory):
  *  - every sum that feeds a statistic is an exact DECIMAL sum of
  *    integer cents (or of exact 0.5/0.25-grained deviations), so the
  *    result is independent of partition/merge order;
  *  - doubles appear only in final fixed-shape expressions over those
  *    exact aggregates — identical inputs + IEEE determinism give
  *    bit-identical results in both engines;
  *  - the one cross-group float reduction (Levene's Σ s²/n) is a
  *    pinned-order fold over the ≤k group rows, never a parallel sum;
  *  - pairwise/test phases run on aggregated projections bounded by
  *    (group × calendar) cardinality, never on the raw corpus.
  */
object StatTests extends QueryModule {

  /** Abramowitz-Stegun 7.1.26 complementary-error-function polynomial,
    * emitted as the SAME textual expression for Spark and DuckDB so
    * both engines evaluate the identical IEEE double chain.
    */
  private def erfcOf(x: String): String = {
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $t - 1.453152027) * $t + 1.421413741) * $t" +
      s" - 0.284496736) * $t + 0.254829592) * $t * exp(-($x) * ($x)))"
  }

  /** Benjamini-Hochberg FDR over a battery of (event_type × hour)
    * Welch z-tests of each cell's mean value against its complement.
    * Cell moments are exact decimal sums of integer cents; the
    * complement's moments are differences of exact totals, so no
    * second pass over the data is needed. p-values come from the
    * A&S 7.1.26 erfc polynomial (identical expression both engines),
    * and the BH step-up runs as two windows over the ~120-row test
    * frame: rank by p, then reject ranks ≤ k* = max{r : p ≤ αr/m}.
    * Scale: one group-keyed shuffle over the corpus; everything after
    * is test-cardinality-bounded.
    */
  def bhFdr(events: DataFrame): DataFrame = {
    val g = events
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"),
        (dec(col("value"), 2) * 100).cast("decimal(18,0)").as("cents"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).cast("decimal(38,0)").as("s"),
        sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val tot = g.agg(sum("n").as("nn"),
      sum(col("s")).cast("decimal(38,0)").as("ss"),
      sum(col("q")).cast("decimal(38,0)").as("qq"))
    // totals stay corpus-wide (the complement is "everything else"),
    // but only cells with n >= 5 enter the tested family: an n=1 cell
    // has no variance estimate (n-1 = 0 divide) at tiny SFs
    val z = g.filter(col("n") >= 5).crossJoin(broadcast(tot))
      .withColumn("zstat", expr(
        """((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          |  - CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE))
          | / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |          / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)
          |        + (CAST(qq - q AS DOUBLE) - CAST(ss - s AS DOUBLE) * CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE))
          |          / CAST(nn - n - 1 AS DOUBLE) / CAST(nn - n AS DOUBLE)))""".stripMargin))
      .withColumn("x", expr("abs(zstat) / sqrt(2.0)"))
      .withColumn("p_raw", expr(erfcOf("x")))
    val byP = Window.orderBy(col("p_raw").asc, col("event_type").asc, col("hr").asc)
    val all = Window.partitionBy()
    z.withColumn("r", row_number().over(byP).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("crit", col("p_raw") <= lit(0.05) * col("r").cast("double") / col("m").cast("double"))
      .withColumn("kstar", max(when(col("crit"), col("r")).otherwise(0L)).over(all))
      .select(col("event_type"), col("hr"), col("n"),
        round(col("zstat"), 6).as("z"),
        round(col("p_raw"), 6).as("p"),
        col("r"), (col("r") <= col("kstar")).as("rejected"))
      .orderBy("r")
  }

  private val bhFdrOracle = s"""
    WITH c AS (
      SELECT event_type, hour(ts) AS hr,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS cents
      FROM events),
    g AS (
      SELECT event_type, hr, COUNT(*) AS n,
        CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
        CAST(SUM(cents * cents) AS DECIMAL(38,0)) AS q
      FROM c GROUP BY 1, 2),
    tot AS (
      SELECT SUM(n) AS nn, CAST(SUM(s) AS DECIMAL(38,0)) AS ss,
        CAST(SUM(q) AS DECIMAL(38,0)) AS qq
      FROM g),
    z AS (
      SELECT event_type, hr, n,
        ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
          - CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE))
         / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)
                + (CAST(qq - q AS DOUBLE) - CAST(ss - s AS DOUBLE) * CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE))
                  / CAST(nn - n - 1 AS DOUBLE) / CAST(nn - n AS DOUBLE))) AS zstat
      FROM g, tot WHERE n >= 5),
    p AS (
      SELECT event_type, hr, n, zstat, x, ${erfcOf("x")} AS p_raw
      FROM (SELECT *, abs(zstat) / sqrt(2.0) AS x FROM z)),
    ranked AS (
      SELECT event_type, hr, n, zstat, p_raw,
        CAST(row_number() OVER (ORDER BY p_raw, event_type, hr) AS BIGINT) AS r,
        COUNT(*) OVER () AS m
      FROM p),
    k AS (
      SELECT *, MAX(CASE WHEN p_raw <= 0.05 * CAST(r AS DOUBLE) / CAST(m AS DOUBLE)
                         THEN r ELSE 0 END) OVER () AS kstar
      FROM ranked)
    SELECT event_type, hr, CAST(n AS BIGINT) AS n, ROUND(zstat, 6) AS z,
      ROUND(p_raw, 6) AS p, r, r <= kstar AS rejected
    FROM k ORDER BY r"""

  /** Brown-Forsythe variance-homogeneity test (Levene with group
    * medians): z_ij = |cents_ij − median_j|, then the one-way ANOVA F
    * on z. Working in integer cents makes every z an exact multiple of
    * 0.5 (interpolated medians of integer multisets land on .0/.5), so
    * Σz / Σz² are exact DECIMAL(·,1)/(·,2) sums; the only cross-group
    * float reduction, Σ s_j²/n_j, folds in pinned event_type order.
    */
  def leveneTest(events: DataFrame): DataFrame = {
    val c = events.select(col("event_type"),
      (dec(col("value"), 2) * 100).cast("double").as("cents"))
    val med = c.groupBy("event_type").agg(expr("percentile(cents, 0.5)").as("med"))
    val z = c.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("cents") - col("med")).as("z"))
    val grp = z.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("z").cast("decimal(28,1)")).as("s"),
      sum((col("z") * col("z")).cast("decimal(28,2)")).as("q"))
    grp.agg(
      count(lit(1)).as("k"),
      sum("n").as("n"),
      sum(col("s")).cast("decimal(38,1)").as("stot"),
      sum(col("q")).cast("decimal(38,2)").as("qtot"),
      expr("""aggregate(
          array_sort(collect_list(named_struct(
            'g', event_type,
            'term', CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))),
          CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)""").as("ssq"))
      .select(col("k"), col("n"),
        round(expr("CAST(stot AS DOUBLE) / CAST(n AS DOUBLE) / 100.0"), 6)
          .as("mean_adev"),
        round(expr(
          """((ssq - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n AS DOUBLE))
            |   / CAST(k - 1 AS DOUBLE))
            | / ((CAST(qtot AS DOUBLE) - ssq) / CAST(n - k AS DOUBLE))""".stripMargin), 6)
          .as("f_bf"))
  }

  private val leveneOracle = """
    WITH c AS (
      SELECT event_type,
        CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS DOUBLE) AS cents
      FROM events),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med
      FROM c GROUP BY 1),
    z AS (
      SELECT c.event_type, ABS(c.cents - m.med) AS z
      FROM c JOIN med m USING (event_type)),
    grp AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(z AS DECIMAL(28,1))) AS DECIMAL(28,1)) AS s,
        CAST(SUM(CAST(z * z AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS q
      FROM z GROUP BY 1),
    agg AS (
      SELECT COUNT(*) AS k, SUM(n) AS n,
        CAST(SUM(s) AS DECIMAL(38,1)) AS stot,
        CAST(SUM(q) AS DECIMAL(38,2)) AS qtot,
        list_reduce(
          list_prepend(CAST(0 AS DOUBLE),
            list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 ORDER BY event_type)),
          (acc, x) -> acc + x) AS ssq
      FROM grp)
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      ROUND(CAST(stot AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_adev,
      ROUND(((ssq - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(k - 1 AS DOUBLE))
             / ((CAST(qtot AS DOUBLE) - ssq) / CAST(n - k AS DOUBLE)), 6) AS f_bf
    FROM agg"""

  /** Mann-Kendall monotone-trend test on the monthly revenue series per
    * order priority: S = Σ_{i<j} sign(x_j − x_i) over exact integer
    * cents (every comparison exact), tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    * continuity-corrected z. The pairwise phase runs on the
    * calendar-bounded (priority × month) aggregate — ~80 months per
    * group regardless of corpus size — never on raw orders.
    */
  def mannKendall(orders: DataFrame): DataFrame = {
    val m = orders.groupBy(col("o_orderpriority").as("prio"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
      .agg(sum(round(col("o_totalprice") * 100).cast("decimal(18,0)")).as("cents"))
    val s = m.as("a").join(m.as("b"),
        col("a.prio") === col("b.prio") && col("a.mon") < col("b.mon"))
      .groupBy(col("a.prio").as("prio"))
      .agg(sum(signum((col("b.cents") - col("a.cents")).cast("double")).cast("long"))
        .as("s_stat"))
    val nm = m.groupBy("prio").agg(count(lit(1)).as("n_months"))
    val ties = m.groupBy("prio", "cents").agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy("prio")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    s.join(nm, "prio").join(ties, Seq("prio"), "left")
      .withColumn("tt", coalesce(col("tie_term"), lit(0L)))
      .withColumn("var_s", expr(
        """(CAST(n_months AS DOUBLE) * CAST(n_months - 1 AS DOUBLE)
          |  * CAST(2 * n_months + 5 AS DOUBLE) - CAST(tt AS DOUBLE)) / 18.0""".stripMargin))
      .withColumn("z", expr(
        """CASE WHEN var_s <= 0.0 THEN 0.0
          |     WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
          |     WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
          |     ELSE 0.0 END""".stripMargin))
      .select(col("prio"), col("n_months"), col("s_stat"),
        round(col("var_s"), 6).as("var_s"), round(col("z"), 6).as("z"),
        when(col("z") > 1.96, lit("up"))
          .when(col("z") < -1.96, lit("down")).otherwise(lit("none")).as("trend"))
      .orderBy("prio")
  }

  private val mannKendallOracle = """
    WITH m AS (
      SELECT o_orderpriority AS prio,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS cents
      FROM orders GROUP BY 1, 2),
    s AS (
      SELECT a.prio, CAST(SUM(CAST(sign(CAST(b.cents - a.cents AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
      FROM m a JOIN m b ON a.prio = b.prio AND a.mon < b.mon
      GROUP BY 1),
    nm AS (SELECT prio, COUNT(*) AS n_months FROM m GROUP BY 1),
    ties AS (
      SELECT prio, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT prio, cents, COUNT(*) AS t FROM m GROUP BY 1, 2)
      WHERE t > 1 GROUP BY 1),
    j AS (
      SELECT s.prio, nm.n_months, s.s_stat,
        COALESCE(ties.tie_term, 0) AS tt
      FROM s JOIN nm USING (prio) LEFT JOIN ties ON s.prio = ties.prio),
    v AS (
      SELECT prio, n_months, s_stat,
        (CAST(n_months AS DOUBLE) * CAST(n_months - 1 AS DOUBLE)
           * CAST(2 * n_months + 5 AS DOUBLE) - CAST(tt AS DOUBLE)) / 18.0 AS var_s
      FROM j),
    z AS (
      SELECT *, CASE WHEN var_s <= 0.0 THEN 0.0
                     WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
                     WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
                     ELSE 0.0 END AS z
      FROM v)
    SELECT prio, CAST(n_months AS BIGINT) AS n_months, s_stat,
      ROUND(var_s, 6) AS var_s, ROUND(z, 6) AS z,
      CASE WHEN z > 1.96 THEN 'up' WHEN z < -1.96 THEN 'down' ELSE 'none' END AS trend
    FROM z ORDER BY prio"""

  /** Herfindahl-Hirschman revenue concentration per region: HHI =
    * Σ_n share_n² computed as Σc² / (Σc)² over exact per-nation cent
    * totals — the squared-sum form needs ONE double division instead
    * of a float sum of shares, so it is order-independent by
    * construction. Dimensions broadcast; one group-keyed shuffle.
    */
  def hhiConcentration(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val cents = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("decimal(38,0)").as("c"))
    cents.groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        sum(col("c")).cast("decimal(38,0)").as("ctot"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("c2tot"))
      .select(col("r_name"), col("n_nations"),
        round(col("ctot").cast("double") / 100.0, 2).as("revenue"),
        round(expr(
          "CAST(c2tot AS DOUBLE) / (CAST(ctot AS DOUBLE) * CAST(ctot AS DOUBLE))"), 6)
          .as("hhi"),
        round(expr(
          "(CAST(ctot AS DOUBLE) * CAST(ctot AS DOUBLE)) / CAST(c2tot AS DOUBLE)"), 6)
          .as("effective_n"))
      .orderBy("r_name")
  }

  private val hhiOracle = """
    WITH cents AS (
      SELECT r.r_name, n.n_name,
        CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS c
      FROM orders o
      JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN nation n ON cu.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    g AS (
      SELECT r_name, COUNT(*) AS n_nations,
        CAST(SUM(c) AS DECIMAL(38,0)) AS ctot,
        CAST(SUM(c * c) AS DECIMAL(38,0)) AS c2tot
      FROM cents GROUP BY 1)
    SELECT r_name, CAST(n_nations AS BIGINT) AS n_nations,
      ROUND(CAST(ctot AS DOUBLE) / 100.0, 2) AS revenue,
      ROUND(CAST(c2tot AS DOUBLE) / (CAST(ctot AS DOUBLE) * CAST(ctot AS DOUBLE)), 6) AS hhi,
      ROUND((CAST(ctot AS DOUBLE) * CAST(ctot AS DOUBLE)) / CAST(c2tot AS DOUBLE), 6) AS effective_n
    FROM g ORDER BY r_name"""

  override def queries: Seq[Q] = Seq(
    Q("q230_bh_fdr", (s, d) => bhFdr(events(s, d)), Some(bhFdrOracle)),
    Q("q233_levene_test", (s, d) => leveneTest(events(s, d)), Some(leveneOracle)),
    Q("q236_mann_kendall", (s, d) => mannKendall(orders(s, d)), Some(mannKendallOracle)),
    Q("q237_hhi_concentration",
      (s, d) => hhiConcentration(orders(s, d), customer(s, d), nation(s, d), region(s, d)),
      Some(hhiOracle)),
  )
}
