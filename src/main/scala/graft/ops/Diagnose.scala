package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num._
import graft.Tables._

/** Distribution / model-diagnostic analytics, round 8 of the extension
  * surface (none exist in the reference): a fixed-grid Gaussian KDE
  * (the density panel behind every metric dashboard), a Simpson's-
  * paradox detector (per-group vs pooled regression-slope reversal —
  * the classic aggregation trap in corpus/AB analytics), and McNemar's
  * paired-classifier test (the right significance test when two models
  * score the SAME examples).
  *
  * Exactness: every sum that feeds a statistic is decimal-cast
  * (order-free); exp/sqrt/pi() run on identical doubles on both
  * engines; counts and discordant cells are exact integers. Scale:
  * KDE is one corpus pass against a broadcast per-group (n, h) frame
  * with an 11-point grid explode; slopes are one-shuffle moment
  * rollups; McNemar is a single filter+groupBy.
  */
object Diagnose extends QueryModule {

  /** 3-hex-digit md5 slice of a salted event_id: 0..4095. */
  private def hv3(salt: String) = {
    val h = s"md5(cast(concat('$salt', cast(event_id as string)) as binary))"
    val d = (i: Int) =>
      s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1)"
    expr(s"${d(0)} * 256 + ${d(1)} * 16 + ${d(2)}")
  }

  private def hv3Sql(salt: String) = {
    val h = s"md5('$salt' || CAST(event_id AS VARCHAR))"
    val d = (i: Int) =>
      s"(instr('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1)"
    s"${d(0)} * 256 + ${d(1)} * 16 + ${d(2)}"
  }

  // ---------------------------------------------------------------- q336

  /** Gaussian KDE per event_type at the fixed 11-point grid 0,50..500
    * with the Silverman bandwidth h = 1.06·σ·n^(−1/5). Pass 1 reduces
    * the corpus to per-type (n, σ); pass 2 broadcasts those and sums
    * the decimal-cast kernel terms per (type, grid point) — one corpus
    * scan each, no pairwise work.
    */
  def kdeGrid(events: DataFrame): DataFrame = {
    val stats = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"), 6)).cast("decimal(28,6)").as("s1"),
        sum((dec(col("value"), 6) * dec(col("value"), 6))
          .cast("decimal(38,12)")).as("s2"))
      .withColumn("mu", expr("CAST(s1 AS DOUBLE) / n"))
      .withColumn("sd", expr("sqrt(CAST(s2 AS DOUBLE) / n - mu * mu)"))
      // exp(-ln(n)/5) instead of power(n,-0.2): exp/ln are the proven
      // cross-engine pair in this repo; pow implementations may drift 1 ulp
      .withColumn("h", expr("1.06 * sd * exp(-0.2 * ln(CAST(n AS DOUBLE)))"))
      .select("event_type", "n", "h")
    events.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"), col("h"), col("value"),
        explode(expr("transform(sequence(0, 10), j -> j * 50)")).as("g"))
      .withColumn("e", exp(lit(-0.5) *
        ((col("g").cast("double") - col("value")) / col("h")) *
        ((col("g").cast("double") - col("value")) / col("h"))))
      .groupBy("event_type", "g")
      .agg(max("n").as("n"), max("h").as("hv"),
        sum(dec(col("e"), 12)).as("se"))
      .select(col("event_type"), col("g").cast("long").as("g"), col("n"),
        round(expr("CAST(se AS DOUBLE) / (n * hv * sqrt(2 * pi()))"), 8)
          .as("density"))
      .orderBy("event_type", "g")
  }

  private val kdeOracle = """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s1,
        CAST(SUM(CAST(CAST(value AS DECIMAL(19,6))
          * CAST(value AS DECIMAL(19,6)) AS DECIMAL(38,12)))
          AS DECIMAL(38,12)) AS s2
      FROM events GROUP BY 1),
    hband AS (
      SELECT event_type, n,
        1.06 * sqrt(CAST(s2 AS DOUBLE) / n
          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
          * exp(-0.2 * ln(CAST(n AS DOUBLE))) AS h
      FROM stats),
    terms AS (
      SELECT e.event_type, s.n, s.h, g.g,
        exp(-0.5 * ((CAST(g.g AS DOUBLE) - e.value) / s.h)
                 * ((CAST(g.g AS DOUBLE) - e.value) / s.h)) AS t
      FROM events e
      JOIN hband s ON e.event_type = s.event_type
      CROSS JOIN (SELECT UNNEST(generate_series(0, 10)) * 50 AS g) g)
    SELECT event_type, CAST(g AS BIGINT) AS g, n,
      ROUND(CAST(SUM(CAST(t AS DECIMAL(18,12))) AS DOUBLE)
        / (n * h * sqrt(2 * pi())), 8) AS density
    FROM terms GROUP BY event_type, g, n, h
    ORDER BY event_type, g"""

  // ---------------------------------------------------------------- q337

  /** Simpson's-paradox screen on quantity→revenue slopes: the pooled
    * OLS slope across all lineitems vs the per-returnflag slope; a
    * sign reversal is the aggregation trap worth alerting on. Both
    * slopes come from the same five decimal moment sums (one shuffle
    * for the groups + one 3-row reduce for the pool).
    */
  def simpsonsSlopes(li: DataFrame): DataFrame = {
    def moments(df: DataFrame, keys: Seq[String]) = {
      val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys.head)
      g.agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"), 2)).cast("decimal(28,2)").as("sx"),
        sum(dec(col("l_extendedprice"), 2)).cast("decimal(28,2)").as("sy"),
        sum((dec(col("l_quantity"), 2) * dec(col("l_quantity"), 2))
          .cast("decimal(38,4)")).as("sxx"),
        sum((dec(col("l_quantity"), 2) * dec(col("l_extendedprice"), 2))
          .cast("decimal(38,4)")).as("sxy"))
    }
    val slope = "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val grp = moments(li, Seq("l_returnflag")).withColumn("slope", expr(slope))
    val all = moments(li, Seq.empty).withColumn("slope_all", expr(slope))
      .select("slope_all")
    grp.crossJoin(broadcast(all))
      .select(col("l_returnflag"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("slope_all"), 6).as("slope_all"),
        (signum(col("slope")) =!= signum(col("slope_all"))).cast("long")
          .as("reversed"))
      .orderBy("l_returnflag")
  }

  private val simpsonsOracle = """
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,2))
          * CAST(l_quantity AS DECIMAL(19,2)) AS DECIMAL(38,4)))
          AS DECIMAL(38,4)) AS sxx,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,2))
          * CAST(l_extendedprice AS DECIMAL(19,2)) AS DECIMAL(38,4)))
          AS DECIMAL(38,4)) AS sxy
      FROM lineitem GROUP BY 1),
    a AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
        SUM(sxx) AS sxx, SUM(sxy) AS sxy
      FROM m),
    sl AS (
      SELECT l_returnflag, n,
        (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          AS slope
      FROM m),
    sa AS (
      SELECT (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          AS slope_all
      FROM a)
    SELECT l_returnflag, n, ROUND(slope, 6) AS slope,
      ROUND(slope_all, 6) AS slope_all,
      CAST(SIGN(slope) <> SIGN(slope_all) AS BIGINT) AS reversed
    FROM sl, sa ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q339

  /** McNemar's continuity-corrected test per event_type: model A (the
    * value-aware scorer) vs model B (an independent coin) predicting
    * the q329 calibrated label on the SAME events. Only the discordant
    * cells b (A right, B wrong) and c (A wrong, B right) matter;
    * chi² = (|b−c|−1)²/(b+c). All cells exact integers.
    */
  def mcnemarTest(events: DataFrame): DataFrame = {
    val scored = events
      .withColumn("y", (hv3("y") < floor(col("value") * 8)).cast("int"))
      .withColumn("pa", (hv3("a") < floor(col("value") * 8)).cast("int"))
      .withColumn("pb", (hv3("b") < 2048).cast("int"))
    scored.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pa") === col("y") && col("pb") =!= col("y"), 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("pa") =!= col("y") && col("pb") === col("y"), 1L)
          .otherwise(0L)).as("c"))
      .select(col("event_type"), col("n"), col("b"), col("c"),
        round(expr("CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / nullif(b + c, 0)"), 6)
          .as("chi2"),
        (col("b") > col("c")).cast("long").as("a_better"))
      .orderBy("event_type")
  }

  private val mcnemarOracle = s"""
    WITH scored AS (
      SELECT event_type,
        CAST(${hv3Sql("y")} < FLOOR(value * 8) AS INT) AS y,
        CAST(${hv3Sql("a")} < FLOOR(value * 8) AS INT) AS pa,
        CAST(${hv3Sql("b")} < 2048 AS INT) AS pb
      FROM events)
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS b,
      CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS c,
      ROUND(CAST((ABS(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                     - SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)) - 1)
               * (ABS(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                     - SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)) - 1)
               AS DOUBLE)
        / nullif(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
               + SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END), 0), 6)
        AS chi2,
      CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
         > SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT)
        AS a_better
    FROM scored GROUP BY event_type ORDER BY event_type"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q336_kde_grid", (s, d) => kdeGrid(events(s, d)), Some(kdeOracle)),
    Q("q337_simpsons_slopes",
      (s, d) => simpsonsSlopes(lineitem(s, d)), Some(simpsonsOracle)),
    Q("q339_mcnemar_test",
      (s, d) => mcnemarTest(events(s, d)), Some(mcnemarOracle)),
  )
}
