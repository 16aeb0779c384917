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
    val ranked = scored.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("o_orderkey"))))
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
      .localCheckpoint()
    val wTot = nij.groupBy("i").agg(sum("w_ij").as("w")).localCheckpoint()
    var p = wTot.select(col("i").as("item"), lit(1.0).as("p"))
    for (_ <- 1 to iters) {
      val terms = nij
        .join(p.select(col("item").as("i"), col("p").as("pi")), "i")
        .join(p.select(col("item").as("j"), col("p").as("pj")), "j")
        .groupBy("i")
        .agg(sum(expr("CAST(n_ij / (pi + pj) AS DECIMAL(28,9))")).as("denom"))
      val raw = wTot.join(terms, "i")
        .select(col("i").as("item"),
          expr("CAST(w AS DOUBLE) / CAST(denom AS DOUBLE)").as("praw"))
      val z = raw.agg(sum(expr("CAST(praw AS DECIMAL(28,9))")).as("z"))
      p = raw.crossJoin(broadcast(z))
        .select(col("item"), expr("praw / CAST(z AS DOUBLE)").as("p"))
        .localCheckpoint() // |items| rows; keeps the iteration tree flat
    }
    wTot.select(col("i").as("item"), col("w")).join(p, "item")
      .select(col("item"), col("w").as("total_wins"),
        round(col("p"), 6).as("strength"))
      .orderBy("item")
  }

  private val btOracle = """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3),
    wins0 AS (
      SELECT a.event_type AS i, b.event_type AS j, COUNT(*) AS w_ij
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND a.day = b.day
        AND a.event_type <> b.event_type AND a.c > b.c
      GROUP BY 1, 2),
    matrix AS (
      SELECT i, j, CAST(SUM(w_ij) AS BIGINT) AS w_ij FROM (
        SELECT i, j, w_ij FROM wins0
        UNION ALL SELECT j, i, 0 FROM wins0)
      GROUP BY 1, 2),
    nij AS (
      SELECT m.i, m.j, m.w_ij, m.w_ij + r.w_ij AS n_ij
      FROM matrix m JOIN matrix r ON m.i = r.j AND m.j = r.i),
    w_tot AS (SELECT i, CAST(SUM(w_ij) AS BIGINT) AS w FROM nij GROUP BY 1),
    p0 AS (SELECT i AS item, CAST(1.0 AS DOUBLE) AS p FROM w_tot),
    t1 AS (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p0 pi ON n.i = pi.item JOIN p0 pj ON n.j = pj.item
      GROUP BY 1),
    r1 AS (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t1 t ON w.i = t.i),
    p1 AS (
      SELECT item, praw / CAST((SELECT CAST(SUM(CAST(praw AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) FROM r1) AS DOUBLE) AS p
      FROM r1),
    t2 AS (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p1 pi ON n.i = pi.item JOIN p1 pj ON n.j = pj.item
      GROUP BY 1),
    r2 AS (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t2 t ON w.i = t.i),
    p2 AS (
      SELECT item, praw / CAST((SELECT CAST(SUM(CAST(praw AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) FROM r2) AS DOUBLE) AS p
      FROM r2),
    t3 AS (
      SELECT n.i, CAST(SUM(CAST(n.n_ij / (pi.p + pj.p) AS DECIMAL(28,9)))
        AS DECIMAL(38,9)) AS denom
      FROM nij n JOIN p2 pi ON n.i = pi.item JOIN p2 pj ON n.j = pj.item
      GROUP BY 1),
    r3 AS (
      SELECT w.i AS item, CAST(w.w AS DOUBLE) / CAST(t.denom AS DOUBLE) AS praw
      FROM w_tot w JOIN t3 t ON w.i = t.i),
    p3 AS (
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

  override def queries: Seq[Q] = Seq(
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
