package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Corpus-insight and distribution-comparison operators a curation
  * platform layers over the engine (SURVEY.md §2.9 extension surface):
  * species-richness estimation (Chao1 / Good-Turing coverage) for vocab
  * growth planning, inter-arrival burstiness of the event stream,
  * weighted-Jaccard vocabulary overlap between sources, 1-D earth
  * mover's distance between per-type value histograms, and lead-lag
  * cross-correlation of each event type against the aggregate series.
  * None exist in the reference (its analysis surface stops at binary
  * classifier metrics, `03a_Model Training.py:300-330`).
  *
  * Oracle-exactness discipline (graft-oracle-exactness): every
  * statistic reduces exact integers/decimals (token counts, integer
  * micros, cross-multiplied cumulative counts); doubles appear only in
  * final fixed-shape closed forms over identical operands — no float
  * is ever summed across rows.
  *
  * Scale discipline: each operator touches the corpus in one grouped
  * pass (token counts, per-user lags, bin counts, daily rollups); all
  * pairwise phases run on dimension-bounded frames (sources², types²,
  * bin spine, calendar days).
  */
object Insights extends QueryModule {

  // ---------------------------------------------------------------- q255

  /** Chao1 species-richness estimate and Good-Turing coverage of each
    * source's vocabulary: S_obs observed types, N1/N2 singleton and
    * doubleton types, Chao1 = S + N1(N1-1)/(2(N2+1)) (bias-corrected
    * form), coverage = 1 - N1/N. Answers "how much unseen vocabulary
    * remains in this source" — the dual of q209's Heaps-law fit. One
    * token-count shuffle; everything else is a per-source fold of
    * exact integers into one closed double form.
    */
  def chao1Richness(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val agg = tf.groupBy("source").agg(
      count(lit(1)).as("s_obs"),
      sum("c").cast("long").as("n_tokens"),
      sum((col("c") === 1).cast("long")).as("n1"),
      sum((col("c") === 2).cast("long")).as("n2"))
    agg.select(col("source"), col("s_obs"), col("n_tokens"), col("n1"), col("n2"),
      round(expr("""CAST(s_obs AS DOUBLE)
        | + CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)
        |   / (2.0 * CAST(n2 + 1 AS DOUBLE))""".stripMargin), 4).as("chao1"),
      round(expr("1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)"), 6)
        .as("coverage"))
      .orderBy("source")
  }

  private val chao1Oracle = """
    WITH tf AS (
      SELECT source, tok, COUNT(*) AS c FROM (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2),
    agg AS (
      SELECT source, COUNT(*) AS s_obs, CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(SUM(CAST(c = 1 AS BIGINT)) AS BIGINT) AS n1,
        CAST(SUM(CAST(c = 2 AS BIGINT)) AS BIGINT) AS n2
      FROM tf GROUP BY 1)
    SELECT source, s_obs, n_tokens, n1, n2,
      ROUND(CAST(s_obs AS DOUBLE)
        + CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)
          / (2.0 * CAST(n2 + 1 AS DOUBLE)), 4) AS chao1,
      ROUND(1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS coverage
    FROM agg ORDER BY source"""

  // ---------------------------------------------------------------- q256

  /** Inter-arrival burstiness per event type: whole-second gaps between
    * a user's consecutive events of one type (lag over (type, user),
    * pinned (ts, event_id) order), then the Goh-Barabasi burstiness
    * B = (sigma - mu)/(sigma + mu) and the coefficient of variation from
    * exact integer power sums (gap seconds <= 2.6e6, gap^2 <= 6.8e12 —
    * products stay in BIGINT, addends cast to DECIMAL(38,0) before the
    * order-independent sum). B ~ -1 is periodic, 0 Poisson, +1 bursty.
    */
  def burstiness(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag("us", 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), expr("(us - prev) DIV 1000000").as("d"))
    gaps.groupBy("event_type").agg(
        count(lit(1)).as("n_gaps"),
        sum(col("d").cast("decimal(38,0)")).as("sd"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).as("sdd"))
      .select(col("event_type"), col("n_gaps"),
        round(expr("CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE)"), 3)
          .as("mean_gap_s"),
        round(expr(
          """CASE WHEN sd > 0 THEN
            | sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
            |   / CAST(sd AS DOUBLE)
            | ELSE NULL END""".stripMargin), 6).as("cv"),
        round(expr(
          """CASE WHEN sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) + CAST(sd AS DOUBLE) > 0 THEN
            | (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) - CAST(sd AS DOUBLE))
            |   / (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) + CAST(sd AS DOUBLE))
            | ELSE NULL END""".stripMargin), 6).as("burstiness"))
      .orderBy("event_type")
  }

  private val burstinessOracle = """
    WITH gaps AS (
      SELECT event_type, (us - prev) // 1000000 AS d FROM (
        SELECT event_type, epoch_us(ts) AS us,
          lag(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
            ORDER BY ts, event_id) AS prev
        FROM events)
      WHERE prev IS NOT NULL),
    agg AS (
      SELECT event_type, COUNT(*) AS n_gaps,
        CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
        CAST(SUM(CAST(d * d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sdd
      FROM gaps GROUP BY 1)
    SELECT event_type, n_gaps,
      ROUND(CAST(sd AS DOUBLE) / CAST(n_gaps AS DOUBLE), 3) AS mean_gap_s,
      ROUND(CASE WHEN sd > 0 THEN
        sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
          / CAST(sd AS DOUBLE)
        ELSE NULL END, 6) AS cv,
      ROUND(CASE WHEN sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) + CAST(sd AS DOUBLE) > 0 THEN
        (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) - CAST(sd AS DOUBLE))
          / (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) + CAST(sd AS DOUBLE))
        ELSE NULL END, 6) AS burstiness
    FROM agg ORDER BY event_type"""

  // ---------------------------------------------------------------- q257

  /** Weighted-Jaccard vocabulary overlap between every source pair:
    * WJ = sum_t min(f_a, f_b) / sum_t max(f_a, f_b) over relative token
    * frequencies — computed EXACTLY by cross-multiplying integer counts
    * (min(c_a*N_b, c_b*N_a)) and using sum max = 2*N_a*N_b - sum min,
    * so no float is ever summed. Complements q222's JSD (which weights
    * by log-ratios): WJ is the mass-overlap view. The corpus is touched
    * once (token-count shuffle); the pairwise phase joins postings on
    * token, bounded by |sources|^2 per token — the source dimension is
    * small at every scale, so no all-pairs blowup on hot tokens.
    */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint() // reused as both join sides + totals
    val tot = tf.groupBy("source").agg(sum("c").cast("long").as("n"))
    val a = tf.select(col("source").as("sa"), col("tok"), col("c").as("ca"))
    val b = tf.select(col("source").as("sb"), col("tok"), col("c").as("cb"))
    a.join(b, "tok").filter(col("sa") < col("sb"))
      .join(broadcast(tot.select(col("source").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(tot.select(col("source").as("sb"), col("n").as("nb"))), "sb")
      .groupBy("sa", "sb", "na", "nb")
      .agg(count(lit(1)).as("n_shared"),
        sum(least(col("ca") * col("nb"), col("cb") * col("na"))
          .cast("decimal(38,0)")).as("smin"))
      .select(col("sa"), col("sb"), col("n_shared"),
        round(expr(
          """CAST(smin AS DOUBLE)
            | / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) - CAST(smin AS DOUBLE))""".stripMargin), 6)
          .as("wjaccard"))
      .orderBy("sa", "sb")
  }

  private val vocabOverlapOracle = """
    WITH tf AS MATERIALIZED (
      SELECT source, tok, COUNT(*) AS c FROM (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY 1),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb, ta.n AS na, tb.n AS nb,
        COUNT(*) AS n_shared,
        CAST(SUM(CAST(LEAST(a.c * tb.n, b.c * ta.n) AS DECIMAL(38,0)))
          AS DECIMAL(38,0)) AS smin
      FROM tf a
      JOIN tf b ON a.tok = b.tok AND a.source < b.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
      GROUP BY 1, 2, 3, 4)
    SELECT sa, sb, n_shared,
      ROUND(CAST(smin AS DOUBLE)
        / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) - CAST(smin AS DOUBLE)), 6)
        AS wjaccard
    FROM pairs ORDER BY sa, sb"""

  // ---------------------------------------------------------------- q258

  /** 1-D earth mover's distance between every pair of event types'
    * value histograms (unit bins: floor(value)): EMD = integral of
    * |F_a - F_b| over the bin spine, computed exactly as
    * sum_b |cum_a*N_b - cum_b*N_a| / (N_a*N_b). The CDF view
    * complements q190's PSI and q222's JSD (density views): EMD is the
    * metric that sees HOW FAR mass moved, not just that it differs.
    * One bin-count shuffle over the corpus; the spine (global max bin)
    * and the |types|^2 pair phase are dimension-sized.
    */
  def histEmd(events: DataFrame): DataFrame = {
    val binned = events
      .select(col("event_type"), floor(col("value")).cast("long").as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      .localCheckpoint() // reused: spine bound, totals, both pair sides
    val mx = binned.agg(max("bin").as("mx"))
    val spine = binned.select("event_type").distinct()
      .crossJoin(broadcast(mx))
      .select(col("event_type"), explode(sequence(lit(0L), col("mx"))).as("bin"))
    val cum = spine.join(binned, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = binned.groupBy("event_type").agg(sum("c").as("n"))
    val withN = cum.join(broadcast(tot), "event_type")
    val ca = withN.select(col("event_type").as("ta"), col("bin"),
      col("cum").as("cuma"), col("n").as("na"))
    val cb = withN.select(col("event_type").as("tb"), col("bin"),
      col("cum").as("cumb"), col("n").as("nb"))
    ca.join(cb, "bin").filter(col("ta") < col("tb"))
      .groupBy("ta", "tb", "na", "nb")
      .agg(sum(abs(col("cuma") * col("nb") - col("cumb") * col("na"))
        .cast("decimal(38,0)")).as("sdiff"))
      .select(col("ta"), col("tb"), col("na"), col("nb"),
        round(expr(
          "CAST(sdiff AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"), 6)
          .as("emd_bins"))
      .orderBy("ta", "tb")
  }

  private val histEmdOracle = """
    WITH binned AS MATERIALIZED (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS bin, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    mx AS (SELECT MAX(bin) AS mx FROM binned),
    spine AS (
      SELECT t.event_type, u.bin
      FROM (SELECT DISTINCT event_type FROM binned) t
      CROSS JOIN (SELECT unnest(generate_series(0, mx)) AS bin FROM mx) u),
    cum AS (
      SELECT s.event_type, s.bin,
        SUM(COALESCE(b.c, 0)) OVER (PARTITION BY s.event_type ORDER BY s.bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spine s LEFT JOIN binned b
        ON s.event_type = b.event_type AND s.bin = b.bin),
    tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
            FROM binned GROUP BY 1),
    withn AS (
      SELECT c.event_type, c.bin, c.cum, t.n
      FROM cum c JOIN tot t ON c.event_type = t.event_type),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb, a.n AS na, b.n AS nb,
        CAST(SUM(CAST(ABS(a.cum * b.n - b.cum * a.n) AS DECIMAL(38,0)))
          AS DECIMAL(38,0)) AS sdiff
      FROM withn a
      JOIN withn b ON a.bin = b.bin AND a.event_type < b.event_type
      GROUP BY 1, 2, 3, 4)
    SELECT ta, tb, na, nb,
      ROUND(CAST(sdiff AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
        AS emd_bins
    FROM pairs ORDER BY ta, tb"""

  // ---------------------------------------------------------------- q259

  /** Lead-lag cross-correlation of each event type's daily revenue
    * against the aggregate daily series at lags -3..+3: does a type
    * lead or trail the market? Same exact-cent machinery as q199's ACF
    * (decimal daily sums, integer power sums, one closed Pearson form)
    * but across series; zero-variance sides yield NULL. One daily
    * rollup shuffle; the 7-lag recombination runs on the
    * calendar-bounded frame.
    */
  def crossCorrelation(events: DataFrame, maxLag: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("decimal(18,0)")).as("x"))
      .localCheckpoint() // both the per-type side and the total derive from it
    val total = daily.groupBy("day")
      .agg(sum("x").cast("decimal(38,0)").as("y"))
    val corr = (-maxLag to maxLag).map { k =>
      val a = daily.select(col("event_type"), col("day"), col("x").as("xa"))
      val b = total.select(date_add(col("day"), -k).as("day"), col("y").as("yb"))
      a.join(b, Seq("day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("xa")).cast("decimal(38,0)").as("sx"),
          sum(col("yb")).cast("decimal(38,0)").as("sy"),
          sum(col("xa") * col("xa")).cast("decimal(38,0)").as("sxx"),
          sum(col("yb") * col("yb")).cast("decimal(38,0)").as("syy"),
          sum(col("xa") * col("yb")).cast("decimal(38,0)").as("sxy"))
        .select(col("event_type"), lit(k.toLong).as("lag"), col("n").as("n_pairs"),
          round(expr(
            """CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
              |  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
              | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              | / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
              | ELSE NULL END""".stripMargin), 6).as("ccf"))
    }
    corr.reduce(_.union(_)).orderBy("event_type", "lag")
  }

  private def ccfLagSql(k: Int): String = s"""
    SELECT event_type, CAST($k AS BIGINT) AS lag, COUNT(*) AS n_pairs,
      ROUND(CASE WHEN CAST(COUNT(*) AS DOUBLE) * CAST(CAST(SUM(xa * xa) AS DECIMAL(38,0)) AS DOUBLE) - CAST(CAST(SUM(xa) AS DECIMAL(38,0)) AS DOUBLE) * CAST(CAST(SUM(xa) AS DECIMAL(38,0)) AS DOUBLE) > 0
            AND CAST(COUNT(*) AS DOUBLE) * CAST(CAST(SUM(yb * yb) AS DECIMAL(38,0)) AS DOUBLE) - CAST(CAST(SUM(yb) AS DECIMAL(38,0)) AS DOUBLE) * CAST(CAST(SUM(yb) AS DECIMAL(38,0)) AS DOUBLE) > 0 THEN
        (CAST(COUNT(*) AS DOUBLE) * CAST(CAST(SUM(xa * yb) AS DECIMAL(38,0)) AS DOUBLE)
          - CAST(CAST(SUM(xa) AS DECIMAL(38,0)) AS DOUBLE) * CAST(CAST(SUM(yb) AS DECIMAL(38,0)) AS DOUBLE))
        / (sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(CAST(SUM(xa * xa) AS DECIMAL(38,0)) AS DOUBLE)
            - CAST(CAST(SUM(xa) AS DECIMAL(38,0)) AS DOUBLE) * CAST(CAST(SUM(xa) AS DECIMAL(38,0)) AS DOUBLE))
          * sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(CAST(SUM(yb * yb) AS DECIMAL(38,0)) AS DOUBLE)
            - CAST(CAST(SUM(yb) AS DECIMAL(38,0)) AS DOUBLE) * CAST(CAST(SUM(yb) AS DECIMAL(38,0)) AS DOUBLE)))
        ELSE NULL END, 6) AS ccf
    FROM (SELECT a.event_type, a.x AS xa, t.y AS yb
          FROM daily a JOIN total t ON t.day = a.day + $k)
    GROUP BY event_type"""

  private def crossCorrOracle(maxLag: Int = 3): String = s"""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
        SUM(CAST(ROUND(value * 100, 0) AS DECIMAL(18,0))) AS x
      FROM events GROUP BY 1, 2),
    total AS MATERIALIZED (
      SELECT day, CAST(SUM(x) AS DECIMAL(38,0)) AS y FROM daily GROUP BY 1)
    ${(-maxLag to maxLag).map(ccfLagSql).mkString(" UNION ALL ")}
    ORDER BY event_type, lag"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q255_chao1_richness",
      (s, d) => chao1Richness(documents(s, d)), Some(chao1Oracle)),
    Q("q256_burstiness",
      (s, d) => burstiness(events(s, d)), Some(burstinessOracle)),
    Q("q257_vocab_overlap",
      (s, d) => vocabOverlap(documents(s, d)), Some(vocabOverlapOracle)),
    Q("q258_hist_emd",
      (s, d) => histEmd(events(s, d)), Some(histEmdOracle)),
    Q("q259_cross_correlation",
      (s, d) => crossCorrelation(events(s, d)), Some(crossCorrOracle())),
  )
}
