package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num._
import graft.Tables._

/** Experimentation and model-evaluation analytics, round 8 of the
  * extension surface (none exist in the reference): the A/B pre-flight
  * battery (deterministic md5 assignment, sample-ratio-mismatch
  * chi-square, CUPED variance-reduction estimate), multi-touch funnel
  * attribution (first- vs last-touch over a bounded lookback), and the
  * decile gains/lift table — the three analyses every experimentation
  * platform runs over exactly this event/order shape.
  *
  * Exactness: assignment is a portable md5 coin (the q130/q154
  * convention), all moments are exact decimal sums, ratios are single
  * divisions of exact quantities. Scale: per-user rollups are one
  * shuffle; the attribution join is time-banded per user (never
  * event × event); the gains ranking is the documented global-window
  * oracle form of a repartitionByRange plan (q129's convention).
  */
object Experiment extends QueryModule {

  // ---------------------------------------------------------------- q314

  /** A/B experiment pre-flight: users split by a deterministic md5
    * coin; the report carries the sample-ratio-mismatch chi-square
    * (assignment-pipeline health), per-arm post-period means, and the
    * CUPED ingredients — θ = cov(pre, post)/var(pre) and the variance
    * reduction ρ² that pre-period covariates would buy. Pre/post are
    * the first/last 15 days of the window, split on exact integer
    * microseconds.
    */
  def cupedPreflight(events: DataFrame): DataFrame = {
    val t0 = events.agg(min(unix_micros(col("ts"))).as("us0"))
    val cut = 15L * 86400L * 1000000L
    val perUser = events.crossJoin(broadcast(t0))
      .withColumn("pre", unix_micros(col("ts")) < col("us0") + cut)
      .groupBy("user_id")
      .agg(sum(when(col("pre"), dec(col("value"), 6)).otherwise(lit(0)))
          .cast("decimal(18,6)").as("x"),
        sum(when(!col("pre"), dec(col("value"), 6)).otherwise(lit(0)))
          .cast("decimal(18,6)").as("y"))
      .withColumn("arm", expr(
        "ascii(substring(md5(cast(cast(user_id as string) as binary)), 1, 1)) % 2"))
    val agg = perUser.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,12)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,12)")).as("sxy"),
      sum((col("y") * col("y")).cast("decimal(38,12)")).as("syy"),
      sum(when(col("arm") === 0, dec(col("y"), 6)).otherwise(lit(0)))
        .cast("decimal(28,6)").as("sy_a"),
      sum(when(col("arm") === 1, dec(col("y"), 6)).otherwise(lit(0)))
        .cast("decimal(28,6)").as("sy_b"))
    agg
      .withColumn("chi2", expr(
        "CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b)"))
      .withColumn("cov", expr(
        "CAST(sxy AS DOUBLE) / n_users - (CAST(sx AS DOUBLE) / n_users) * (CAST(sy AS DOUBLE) / n_users)"))
      .withColumn("vx", expr(
        "CAST(sxx AS DOUBLE) / n_users - (CAST(sx AS DOUBLE) / n_users) * (CAST(sx AS DOUBLE) / n_users)"))
      .withColumn("vy", expr(
        "CAST(syy AS DOUBLE) / n_users - (CAST(sy AS DOUBLE) / n_users) * (CAST(sy AS DOUBLE) / n_users)"))
      .select(col("n_users"), col("n_a"), col("n_b"),
        round(col("chi2"), 4).as("srm_chi2"),
        (col("chi2") > 3.841).cast("long").as("srm_flag"),
        round(expr("CAST(sy_a AS DOUBLE) / n_a"), 4).as("mean_post_a"),
        round(expr("CAST(sy_b AS DOUBLE) / n_b"), 4).as("mean_post_b"),
        round(expr("cov / vx"), 6).as("cuped_theta"),
        round(expr("cov * cov / (vx * vy)"), 6).as("variance_reduction"))
  }

  private val cupedOracle = """
    WITH t0 AS (SELECT MIN(epoch_us(ts)) AS us0 FROM events),
    per_user AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN epoch_us(ts) < us0 + 1296000000000
                 THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
             AS DECIMAL(18,6)) AS x,
        CAST(SUM(CASE WHEN epoch_us(ts) >= us0 + 1296000000000
                 THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END)
             AS DECIMAL(18,6)) AS y,
        ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm
      FROM events, t0 GROUP BY user_id),
    agg AS (
      SELECT COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        SUM(x) AS sx, SUM(y) AS sy,
        SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
                 AS DECIMAL(38,12))) AS sxx,
        SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
                 AS DECIMAL(38,12))) AS sxy,
        SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))
                 AS DECIMAL(38,12))) AS syy,
        CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS DECIMAL(28,6)) AS sy_a,
        CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS DECIMAL(28,6)) AS sy_b
      FROM per_user),
    st AS (
      SELECT *,
        CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b) AS chi2,
        CAST(sxy AS DOUBLE) / n_users
          - (CAST(sx AS DOUBLE) / n_users) * (CAST(sy AS DOUBLE) / n_users) AS cov,
        CAST(sxx AS DOUBLE) / n_users
          - (CAST(sx AS DOUBLE) / n_users) * (CAST(sx AS DOUBLE) / n_users) AS vx,
        CAST(syy AS DOUBLE) / n_users
          - (CAST(sy AS DOUBLE) / n_users) * (CAST(sy AS DOUBLE) / n_users) AS vy
      FROM agg)
    SELECT n_users, n_a, n_b, ROUND(chi2, 4) AS srm_chi2,
      CAST(chi2 > 3.841 AS BIGINT) AS srm_flag,
      ROUND(CAST(sy_a AS DOUBLE) / n_a, 4) AS mean_post_a,
      ROUND(CAST(sy_b AS DOUBLE) / n_b, 4) AS mean_post_b,
      ROUND(cov / vx, 6) AS cuped_theta,
      ROUND(cov * cov / (vx * vy), 6) AS variance_reduction
    FROM st"""

  // ---------------------------------------------------------------- q316

  /** First- vs last-touch funnel attribution: each purchase credits the
    * earliest and the latest qualifying touchpoint (click/view) in its
    * 7-day lookback; the report contrasts the two models' purchase
    * counts and revenue per channel — the discrepancy IS the payload
    * (last-touch over-credits bottom-funnel channels). The join is
    * per-user and time-banded; attribution picks are rank-1 windows
    * with full (ts, event_id) tiebreaks.
    */
  def funnelAttribution(events: DataFrame): DataFrame = {
    val lookback = 7L * 86400L * 1000000L
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"), dec(col("value"), 6).as("rev"))
    val touches = events.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"),
        unix_micros(col("ts")).as("t_us"), col("event_type").as("channel"))
    val joined = purchases.join(touches, "user_id")
      .filter(col("t_us") < col("p_us") && col("t_us") >= col("p_us") - lookback)
    val byPurchase = Window.partitionBy("p_id")
    val picked = joined
      .withColumn("rn_last", row_number().over(
        byPurchase.orderBy(col("t_us").desc, col("t_id").desc)))
      .withColumn("rn_first", row_number().over(
        byPurchase.orderBy(col("t_us").asc, col("t_id").asc)))
      .filter(col("rn_last") === 1 || col("rn_first") === 1)
    val first = picked.filter(col("rn_first") === 1)
      .select(lit("first_touch").as("model"), col("channel"), col("p_id"),
        col("rev"))
    val last = picked.filter(col("rn_last") === 1)
      .select(lit("last_touch").as("model"), col("channel"), col("p_id"),
        col("rev"))
    first.unionAll(last)
      .groupBy("model", "channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum("rev").cast("double").as("revenue"))
      .orderBy("model", "channel")
  }

  private val attributionOracle = """
    WITH purchases AS (
      SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
        CAST(value AS DECIMAL(18,6)) AS rev
      FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT user_id, event_id AS t_id, epoch_us(ts) AS t_us,
        event_type AS channel
      FROM events WHERE event_type IN ('click', 'view')),
    joined AS (
      SELECT p.p_id, p.rev, t.channel, t.t_us, t.t_id,
        ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_us DESC, t.t_id DESC)
          AS rn_last,
        ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_us ASC, t.t_id ASC)
          AS rn_first
      FROM purchases p JOIN touches t USING (user_id)
      WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000),
    tagged AS (
      SELECT 'first_touch' AS model, channel, p_id, rev FROM joined
      WHERE rn_first = 1
      UNION ALL
      SELECT 'last_touch', channel, p_id, rev FROM joined WHERE rn_last = 1)
    SELECT model, channel, COUNT(*) AS n_purchases,
      CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM tagged GROUP BY 1, 2 ORDER BY model, channel"""

  // ---------------------------------------------------------------- q319

  /** Decile gains/lift table: orders ranked by price (the stand-in
    * model score) against urgent-priority incidence (the stand-in
    * response), with per-decile response rates and cumulative lift —
    * the table that decides whether a ranking model earns its keep.
    * All counts are exact; each rate/lift is a single division of
    * exact integers. The global ntile is the oracle-reproducible form
    * of a repartitionByRange ranking (q129 convention).
    */
  def gainsTable(orders: DataFrame): DataFrame = {
    val scored = orders.select(
      dec(col("o_totalprice"), 2).as("score"),
      (col("o_orderpriority") === "1-URGENT").cast("long").as("resp"),
      col("o_orderkey"))
    // ntile(10) DESC distributes via the two-level bucket decomposition;
    // the bucket (negated cents DIV 65536) is monotone in the descending
    // leading key — decile identical to the flat global-window form the
    // oracle keeps
    val ranked = Dist.withNtile(scored,
      expr("-(CAST(score * 100 AS BIGINT) DIV 65536)"),
      Seq(col("score").desc, col("o_orderkey")), 10, "decile")
    val byDecile = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("resp").as("n_resp"))
    val tot = byDecile.agg(sum("n").as("tn"), sum("n_resp").as("tr"))
    byDecile.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum("n").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_resp", sum("n_resp").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("decile").cast("long").as("decile"), col("n"), col("n_resp"),
        round(col("n_resp").cast("double") / col("n"), 6).as("resp_rate"),
        round(expr(
          "(CAST(cum_resp AS DOUBLE) * tn) / (CAST(cum_n AS DOUBLE) * tr)"), 6)
          .as("cum_lift"),
        round(expr("CAST(cum_resp AS DOUBLE) / tr"), 6).as("capture_rate"))
      .orderBy("decile")
  }

  private val gainsOracle = """
    WITH scored AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS score,
        CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS resp, o_orderkey
      FROM orders),
    ranked AS (
      SELECT *, NTILE(10) OVER (ORDER BY score DESC, o_orderkey) AS decile
      FROM scored),
    by_decile AS (
      SELECT decile, COUNT(*) AS n, CAST(SUM(resp) AS BIGINT) AS n_resp
      FROM ranked GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
              CAST(SUM(n_resp) AS BIGINT) AS tr FROM by_decile),
    cum AS (
      SELECT decile, n, n_resp, tn, tr,
        SUM(n) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        SUM(n_resp) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_resp
      FROM by_decile, tot)
    SELECT CAST(decile AS BIGINT) AS decile, n, n_resp,
      ROUND(CAST(n_resp AS DOUBLE) / n, 6) AS resp_rate,
      ROUND((CAST(cum_resp AS DOUBLE) * tn) / (CAST(cum_n AS DOUBLE) * tr), 6)
        AS cum_lift,
      ROUND(CAST(cum_resp AS DOUBLE) / tr, 6) AS capture_rate
    FROM cum ORDER BY decile"""

  // ---------------------------------------------------------------- q323

  /** Bradley–Terry preference strengths over event types: each
    * (user, day) is a match — type a beats type b when the user fired
    * more a-events that day — and three synchronous fixed-point
    * MM iterations from a uniform start (the q275 fixed-iteration
    * convention: deterministic, not converged-to-tolerance) yield
    * comparative strengths. The corpus collapses to the 5×5 win matrix
    * in one shuffle; iterations run on the item-sized frame with
    * decimal-cast term sums (order-independent double folds).
    */
  def bradleyTerry(events: DataFrame, iters: Int = 3): DataFrame = {
    val daily = events.groupBy(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type")).agg(count(lit(1)).as("c"))
    val wins = daily.as("a").join(daily.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day")
          && col("a.event_type") =!= col("b.event_type")
          && col("a.c") > col("b.c"))
      .groupBy(col("a.event_type").as("i"), col("b.event_type").as("j"))
      .agg(count(lit(1)).as("w_ij"))
    val matrix = wins.unionAll(
        wins.select(col("j").as("i"), col("i").as("j"), lit(0L).as("w_ij")))
      .groupBy("i", "j").agg(sum("w_ij").as("w_ij"))
    // materialize the item²-sized frames once: every MM iteration joins
    // p TWICE, so an unmaterialized lineage doubles per iteration and
    // the final plan recomputes the corpus shuffle 2^iters times
    val nij = matrix.as("m").join(
        matrix.select(col("i").as("j2"), col("j").as("i2"),
          col("w_ij").as("w_ji")),
        col("i") === col("i2") && col("j") === col("j2"))
      .select(col("i"), col("j"), col("w_ij"),
        (col("w_ij") + col("w_ji")).as("n_ij"))
    // The pair matrix is |event_types|²-bounded (a fixed domain, never
    // corpus-proportional), so the MM iterations run on the driver over
    // the collected edge list — the per-iteration join/checkpoint chain
    // paid ~2 Spark-job floors per iteration to transform ≤dozens of
    // rows. The decimal steps mirror the SQL exactly: double→DECIMAL(28,9)
    // is shortest-repr HALF_UP (Spark's Cast), sums are exact BigDecimal
    // adds, DECIMAL→double is BigDecimal.doubleValue.
    val spark = events.sparkSession
    import spark.implicits._
    import java.math.{BigDecimal => JBig, RoundingMode}
    def dec9(d: Double): JBig =
      JBig.valueOf(d).setScale(9, RoundingMode.HALF_UP)
    val nijRows = nij
      .select(col("i"), col("j"), col("w_ij").cast("long"),
        col("n_ij").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val wTot: Map[String, Long] =
      nijRows.groupBy(_._1).map { case (i, xs) => i -> xs.map(_._3).sum }
    var p: Map[String, Double] = wTot.map { case (i, _) => i -> 1.0 }
    for (_ <- 1 to iters) {
      val denom: Map[String, JBig] = nijRows.groupBy(_._1).map {
        case (i, xs) =>
          i -> xs.map { case (_, j, _, nIj) =>
            dec9(nIj.toDouble / (p(i) + p(j)))
          }.reduce(_ add _)
      }
      val raw: Map[String, Double] = wTot.map { case (i, w) =>
        i -> w.toDouble / denom(i).doubleValue()
      }
      val z = raw.values.map(dec9).reduce(_ add _).doubleValue()
      p = raw.map { case (i, pr) => i -> pr / z }
    }
    wTot.toSeq.map { case (i, w) => (i, w, p(i)) }
      .toDF("item", "total_wins", "p")
      .select(col("item"), col("total_wins"),
        round(col("p"), 6).as("strength"))
      .orderBy("item")
  }

  // Every stage MATERIALIZED: DuckDB inlines an un-hinted CTE at each
  // reference, and the p3->t3->p2->...->p0 chain references each prior
  // stage twice — exponential re-expansion of the daily self-join
  // (observed: 61 GB spill at sf1; the iteration frames are
  // |event_types|-sized, so materializing them is free).
  private val btOracle = """
    WITH daily AS MATERIALIZED (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3),
    wins0 AS MATERIALIZED (
      SELECT a.event_type AS i, b.event_type AS j, COUNT(*) AS w_ij
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND a.day = b.day
        AND a.event_type <> b.event_type AND a.c > b.c
      GROUP BY 1, 2),
    matrix AS MATERIALIZED (
      SELECT i, j, CAST(SUM(w_ij) AS BIGINT) AS w_ij FROM (
        SELECT i, j, w_ij FROM wins0
        UNION ALL SELECT j, i, 0 FROM wins0)
      GROUP BY 1, 2),
    nij AS MATERIALIZED (
      SELECT m.i, m.j, m.w_ij, m.w_ij + r.w_ij AS n_ij
      FROM matrix m JOIN matrix r ON m.i = r.j AND m.j = r.i),
    w_tot AS MATERIALIZED (SELECT i, CAST(SUM(w_ij) AS BIGINT) AS w FROM nij GROUP BY 1),
    p0 AS MATERIALIZED (SELECT i AS item, CAST(1.0 AS DOUBLE) AS p FROM w_tot),
    t1 AS MATERIALIZED (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p0 pi ON n.i = pi.item JOIN p0 pj ON n.j = pj.item
      GROUP BY 1),
    r1 AS MATERIALIZED (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t1 t ON w.i = t.i),
    p1 AS MATERIALIZED (
      SELECT item, praw / CAST((SELECT CAST(SUM(CAST(praw AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) FROM r1) AS DOUBLE) AS p
      FROM r1),
    t2 AS MATERIALIZED (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p1 pi ON n.i = pi.item JOIN p1 pj ON n.j = pj.item
      GROUP BY 1),
    r2 AS MATERIALIZED (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t2 t ON w.i = t.i),
    p2 AS MATERIALIZED (
      SELECT item, praw / CAST((SELECT CAST(SUM(CAST(praw AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) FROM r2) AS DOUBLE) AS p
      FROM r2),
    t3 AS MATERIALIZED (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p2 pi ON n.i = pi.item JOIN p2 pj ON n.j = pj.item
      GROUP BY 1),
    r3 AS MATERIALIZED (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t3 t ON w.i = t.i),
    p3 AS MATERIALIZED (
      SELECT item, praw / CAST((SELECT CAST(SUM(CAST(praw AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) FROM r3) AS DOUBLE) AS p
      FROM r3)
    SELECT w.i AS item, w.w AS total_wins, ROUND(p.p, 6) AS strength
    FROM w_tot w JOIN p3 p ON w.i = p.item
    ORDER BY item"""

  // ---------------------------------------------------------------- q340

  /** Propensity-bucket 1:1 matching audit: users carry a covariate
    * (their exact decimal spend), split into treatment/control by the
    * md5 coin, stratify into covariate deciles, and match treated[i] ↔
    * control[i] by within-(decile, arm) rank. The report contrasts the
    * standardized mean difference of the covariate before vs after
    * matching per decile — the balance diagnostic every observational
    * study prints. Matching is rank-equijoin (never pairwise); deciles
    * are the documented global-ntile oracle form (q129 convention).
    */
  def propensityMatching(events: DataFrame): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(sum(dec(col("value"), 6)).cast("decimal(28,6)").as("x"))
      .withColumn("arm", expr(
        "ascii(substring(md5(cast(cast(user_id as string) as binary)), 1, 1)) % 2"))
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("x"), col("user_id"))).cast("long"))
      .localCheckpoint() // user-sized; feeds both the match and the moments
    val ranked = users.withColumn("rk", row_number().over(
      Window.partitionBy("decile", "arm").orderBy(col("x"), col("user_id"))))
    val matched = ranked.filter(col("arm") === 1)
      .select(col("decile"), col("rk"), col("x").as("xt"))
      .join(ranked.filter(col("arm") === 0)
        .select(col("decile"), col("rk"), col("x").as("xc")),
        Seq("decile", "rk"))
    val sq = (c: Column) => (c.cast("decimal(18,6)") * c.cast("decimal(18,6)"))
      .cast("decimal(38,12)")
    val moments = users.groupBy("decile")
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("x")).otherwise(lit(0)))
          .cast("decimal(28,6)").as("st"),
        sum(when(col("arm") === 0, col("x")).otherwise(lit(0)))
          .cast("decimal(28,6)").as("sc"),
        sum(when(col("arm") === 1, sq(col("x")))
          .otherwise(lit(0))).cast("decimal(38,12)").as("qt"),
        sum(when(col("arm") === 0, sq(col("x")))
          .otherwise(lit(0))).cast("decimal(38,12)").as("qc"))
    val after = matched.groupBy("decile")
      .agg(count(lit(1)).as("n_matched"),
        sum(col("xt")).cast("decimal(28,6)").as("sat"),
        sum(col("xc")).cast("decimal(28,6)").as("sac"),
        sum(sq(col("xt"))).cast("decimal(38,12)").as("qat"),
        sum(sq(col("xc"))).cast("decimal(38,12)").as("qac"))
    val smdExpr = (n1: String, s1: String, q1: String,
                   n2: String, s2: String, q2: String) => {
      val d1 = s"nullif($n1, 0)"; val d2 = s"nullif($n2, 0)"
      s"""(CAST($s1 AS DOUBLE) / $d1 - CAST($s2 AS DOUBLE) / $d2)
        / nullif(sqrt(((CAST($q1 AS DOUBLE) / $d1
            - (CAST($s1 AS DOUBLE) / $d1) * (CAST($s1 AS DOUBLE) / $d1))
          + (CAST($q2 AS DOUBLE) / $d2
            - (CAST($s2 AS DOUBLE) / $d2) * (CAST($s2 AS DOUBLE) / $d2))) / 2), 0.0)"""
    }
    moments.join(after, Seq("decile"), "left")
      .na.fill(0L, Seq("n_matched"))
      .select(col("decile"), col("n_t"), col("n_c"), col("n_matched"),
        round(expr(smdExpr("n_t", "st", "qt", "n_c", "sc", "qc")), 6)
          .as("smd_before"),
        round(expr(smdExpr("n_matched", "sat", "qat", "n_matched", "sac", "qac")), 6)
          .as("smd_after"))
      .orderBy("decile")
  }

  private val propensityOracle = """
    WITH users AS (
      SELECT user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS x,
        ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm
      FROM events GROUP BY user_id),
    deciled AS (
      SELECT *, CAST(NTILE(10) OVER (ORDER BY x, user_id) AS BIGINT) AS decile
      FROM users),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER
        (PARTITION BY decile, arm ORDER BY x, user_id) AS rk
      FROM deciled),
    matched AS (
      SELECT t.decile, t.x AS xt, c.x AS xc
      FROM (SELECT * FROM ranked WHERE arm = 1) t
      JOIN (SELECT * FROM ranked WHERE arm = 0) c
        ON t.decile = c.decile AND t.rk = c.rk),
    mom AS (
      SELECT decile,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS DECIMAL(28,6)) AS st,
        CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS DECIMAL(28,6)) AS sc,
        CAST(SUM(CASE WHEN arm = 1 THEN CAST(CAST(x AS DECIMAL(19,6))
          * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12)) ELSE 0 END)
          AS DECIMAL(38,12)) AS qt,
        CAST(SUM(CASE WHEN arm = 0 THEN CAST(CAST(x AS DECIMAL(19,6))
          * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12)) ELSE 0 END)
          AS DECIMAL(38,12)) AS qc
      FROM deciled GROUP BY decile),
    aft AS (
      SELECT decile, COUNT(*) AS n_matched,
        CAST(SUM(xt) AS DECIMAL(28,6)) AS sat,
        CAST(SUM(xc) AS DECIMAL(28,6)) AS sac,
        CAST(SUM(CAST(CAST(xt AS DECIMAL(19,6)) * CAST(xt AS DECIMAL(19,6))
          AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS qat,
        CAST(SUM(CAST(CAST(xc AS DECIMAL(19,6)) * CAST(xc AS DECIMAL(19,6))
          AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS qac
      FROM matched GROUP BY decile)
    SELECT m.decile, m.n_t, m.n_c,
      CAST(COALESCE(a.n_matched, 0) AS BIGINT) AS n_matched,
      ROUND((CAST(st AS DOUBLE) / nullif(n_t, 0) - CAST(sc AS DOUBLE) / nullif(n_c, 0))
        / nullif(sqrt(((CAST(qt AS DOUBLE) / nullif(n_t, 0)
            - (CAST(st AS DOUBLE) / nullif(n_t, 0)) * (CAST(st AS DOUBLE) / nullif(n_t, 0)))
          + (CAST(qc AS DOUBLE) / nullif(n_c, 0)
            - (CAST(sc AS DOUBLE) / nullif(n_c, 0)) * (CAST(sc AS DOUBLE) / nullif(n_c, 0)))) / 2),
          0.0), 6) AS smd_before,
      ROUND((CAST(sat AS DOUBLE) / a.n_matched
           - CAST(sac AS DOUBLE) / a.n_matched)
        / nullif(sqrt(((CAST(qat AS DOUBLE) / a.n_matched
            - (CAST(sat AS DOUBLE) / a.n_matched)
              * (CAST(sat AS DOUBLE) / a.n_matched))
          + (CAST(qac AS DOUBLE) / a.n_matched
            - (CAST(sac AS DOUBLE) / a.n_matched)
              * (CAST(sac AS DOUBLE) / a.n_matched))) / 2), 0.0), 6)
        AS smd_after
    FROM mom m LEFT JOIN aft a ON m.decile = a.decile
    ORDER BY m.decile"""

  // ------------------------------------------------------------ queries

  // ---------------------------------------------------------------- q364

  /** Empirical-Bayes Beta-Binomial shrinkage of per-user purchase
    * rates: the Beta prior comes from method-of-moments on the
    * observed rate distribution (m, v → α, β), then each user's rate
    * shrinks to (k+α)/(n+α+β) — the standard CTR-smoothing estimator,
    * fit from the data it smooths. Reports the 10 users the prior
    * moves most (small-sample users by construction). Two passes:
    * per-user rollup, then the 2-moment fit on that rollup; the
    * top-10 is a TakeOrdered.
    */
  def betaBinomialEb(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      .withColumn("r", col("k").cast("double") / col("n").cast("double"))
      .localCheckpoint()
    val mom = perUser.agg(count(lit(1)).as("nu"),
        sum(dec(col("r"), 8)).cast("decimal(28,8)").as("sr"),
        sum(dec(col("r") * col("r"), 8)).cast("decimal(28,8)").as("srr"))
      .select(col("nu"),
        expr("CAST(sr AS DOUBLE) / nu").as("m"),
        expr("GREATEST(CAST(srr AS DOUBLE) / nu "
          + "- (CAST(sr AS DOUBLE) / nu) * (CAST(sr AS DOUBLE) / nu), 1e-9)")
          .as("v"))
      .select(col("nu"), col("m"), col("v"),
        expr("GREATEST(m * (1 - m) / v - 1, 0.1)").as("nu0"))
      .select(col("nu"), col("m"), col("v"),
        (col("m") * col("nu0")).as("alpha"),
        ((lit(1.0) - col("m")) * col("nu0")).as("beta"))
      .localCheckpoint()
    perUser.crossJoin(broadcast(mom))
      .select(col("user_id"), col("n"), col("k"),
        round(col("r"), 6).as("raw_rate"),
        round((col("k").cast("double") + col("alpha"))
          / (col("n").cast("double") + col("alpha") + col("beta")), 6)
          .as("shrunk_rate"),
        round(col("alpha"), 4).as("alpha"), round(col("beta"), 4).as("beta"),
        abs(col("r") - (col("k").cast("double") + col("alpha"))
          / (col("n").cast("double") + col("alpha") + col("beta")))
          .as("moved"))
      .orderBy(col("moved").desc, col("user_id"))
      .limit(10)
      .select(col("user_id"), col("n"), col("k"), col("raw_rate"),
        col("shrunk_rate"), col("alpha"), col("beta"))
  }

  private val ebOracle = """
    WITH per_user AS MATERIALIZED (
      SELECT user_id, COUNT(*) AS n,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) AS k,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*) AS r
      FROM events GROUP BY 1),
    mom AS MATERIALIZED (
      SELECT COUNT(*) AS nu,
        CAST(CAST(SUM(CAST(r AS DECIMAL(18,8))) AS DECIMAL(28,8)) AS DOUBLE)
          / COUNT(*) AS m,
        GREATEST(
          CAST(CAST(SUM(CAST(r * r AS DECIMAL(18,8))) AS DECIMAL(28,8))
            AS DOUBLE) / COUNT(*)
          - (CAST(CAST(SUM(CAST(r AS DECIMAL(18,8))) AS DECIMAL(28,8))
              AS DOUBLE) / COUNT(*))
            * (CAST(CAST(SUM(CAST(r AS DECIMAL(18,8))) AS DECIMAL(28,8))
              AS DOUBLE) / COUNT(*)), 1e-9) AS v
      FROM per_user),
    prior AS (
      SELECT m * GREATEST(m * (1 - m) / v - 1, 0.1) AS alpha,
        (1 - m) * GREATEST(m * (1 - m) / v - 1, 0.1) AS beta
      FROM mom),
    scored AS (
      SELECT user_id, n, k, ROUND(r, 6) AS raw_rate,
        ROUND((CAST(k AS DOUBLE) + alpha)
          / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
        ROUND(alpha, 4) AS alpha, ROUND(beta, 4) AS beta,
        ABS(r - (CAST(k AS DOUBLE) + alpha)
          / (CAST(n AS DOUBLE) + alpha + beta)) AS moved
      FROM per_user, prior)
    SELECT user_id, n, k, raw_rate, shrunk_rate, alpha, beta
    FROM scored ORDER BY moved DESC, user_id LIMIT 10"""

  // ---------------------------------------------------------------- q365

  /** Difference-in-differences with the deterministic md5 treatment
    * coin and a mid-corpus pre/post cut (q314's 15-day convention):
    * DiD = (T̄post − T̄pre) − (C̄post − C̄pre), with the four cell
    * means, the estimate, and its pooled standard error. The classic
    * panel causal readout, exact to the cell level (decimal sums) —
    * the placebo law: a hash coin uncorrelated with time keeps DiD
    * near zero on untreated data. One corpus pass.
    */
  def diffInDiff(events: DataFrame): DataFrame = {
    val t0 = events.agg(min(unix_micros(col("ts"))).as("us0"))
    val cut = 15L * 86400L * 1000000L
    val cells = events.crossJoin(broadcast(t0))
      .select(col("value"),
        expr("ascii(substring(md5(cast(cast(user_id as string) as binary)), 1, 1)) % 2")
          .as("treated"),
        (unix_micros(col("ts")) >= col("us0") + cut).cast("int").as("post"))
      .groupBy("treated", "post")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"), 6)).cast("decimal(28,6)").as("s"),
        sum((dec(col("value"), 6) * dec(col("value"), 6))
          .cast("decimal(38,12)")).as("ss"))
      .select(col("treated"), col("post"), col("n"),
        expr("CAST(s AS DOUBLE) / n").as("mean"),
        expr("(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)")
          .as("var"))
      .localCheckpoint()
    def cell(t: Int, p: Int, c: String) = cells
      .filter(col("treated") === t && col("post") === p)
      .select(col("n").as(s"n_$c"), col("mean").as(s"m_$c"),
        col("var").as(s"v_$c"))
    cell(1, 1, "tp").crossJoin(cell(1, 0, "tq"))
      .crossJoin(cell(0, 1, "cp")).crossJoin(cell(0, 0, "cq"))
      .select(col("n_tp"), col("n_tq"), col("n_cp"), col("n_cq"),
        round(col("m_tp"), 6).as("mean_t_post"),
        round(col("m_tq"), 6).as("mean_t_pre"),
        round(col("m_cp"), 6).as("mean_c_post"),
        round(col("m_cq"), 6).as("mean_c_pre"),
        round((col("m_tp") - col("m_tq")) - (col("m_cp") - col("m_cq")), 6)
          .as("did"),
        round(sqrt(col("v_tp") / col("n_tp") + col("v_tq") / col("n_tq")
          + col("v_cp") / col("n_cp") + col("v_cq") / col("n_cq")), 6)
          .as("se"))
  }

  private val didOracle = """
    WITH t0 AS (SELECT MIN(epoch_us(ts)) AS us0 FROM events),
    base AS (
      SELECT ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2
          AS treated,
        CAST(epoch_us(ts) >= us0 + 1296000000000 AS INT) AS post,
        value
      FROM events, t0),
    cells AS MATERIALIZED (
      SELECT treated, post, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
          AS DOUBLE) AS s,
        CAST(SUM(CAST(CAST(value AS DECIMAL(19,6))
          * CAST(value AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS ss
      FROM base GROUP BY 1, 2),
    m AS (
      SELECT treated, post, n, s / n AS mean,
        (ss - s * s / n) / (n - 1) AS var
      FROM cells)
    SELECT tp.n AS n_tp, tq.n AS n_tq, cp.n AS n_cp, cq.n AS n_cq,
      ROUND(tp.mean, 6) AS mean_t_post, ROUND(tq.mean, 6) AS mean_t_pre,
      ROUND(cp.mean, 6) AS mean_c_post, ROUND(cq.mean, 6) AS mean_c_pre,
      ROUND((tp.mean - tq.mean) - (cp.mean - cq.mean), 6) AS did,
      ROUND(sqrt(tp.var / tp.n + tq.var / tq.n + cp.var / cp.n
        + cq.var / cq.n), 6) AS se
    FROM (SELECT * FROM m WHERE treated = 1 AND post = 1) tp,
         (SELECT * FROM m WHERE treated = 1 AND post = 0) tq,
         (SELECT * FROM m WHERE treated = 0 AND post = 1) cp,
         (SELECT * FROM m WHERE treated = 0 AND post = 0) cq"""

  override def queries: Seq[Q] = Seq(
    Q("q364_beta_binomial_eb",
      (s, d) => betaBinomialEb(events(s, d)), Some(ebOracle)),
    Q("q365_diff_in_diff",
      (s, d) => diffInDiff(events(s, d)), Some(didOracle)),
    Q("q340_propensity_matching",
      (s, d) => propensityMatching(events(s, d)), Some(propensityOracle)),
    Q("q314_cuped_preflight",
      (s, d) => cupedPreflight(events(s, d)), Some(cupedOracle)),
    Q("q316_funnel_attribution",
      (s, d) => funnelAttribution(events(s, d)), Some(attributionOracle)),
    Q("q319_gains_table", (s, d) => gainsTable(orders(s, d)), Some(gainsOracle)),
    Q("q323_bradley_terry",
      (s, d) => bradleyTerry(events(s, d)), Some(btOracle)),
  )
}
