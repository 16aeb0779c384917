package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num._
import graft.Tables._

/** Distributed model-fitting operators, round 8 of the extension
  * surface (none exist in the reference): a two-component 1-D Gaussian
  * mixture fit by two synchronous EM iterations (the workhorse of
  * score/latency mixture decomposition), and the V-optimal histogram
  * dynamic program (Jagadish et al., VLDB'98) — the construction behind
  * optimizer statistics: how much SSE each extra bucket buys.
  *
  * Exactness: EM responsibilities are deterministic doubles of exact
  * decimal inputs, every M-step sum is decimal-cast (order-free), and
  * the DP costs are doubles assembled from exact integer cent prefix
  * sums, so min/argmin agree across engines. Scale: each EM iteration
  * is ONE corpus pass against a broadcast 1-row parameter frame; the
  * DP runs on the 33-row prefix lattice — the corpus is touched once.
  */
object Fit extends QueryModule {

  // ---------------------------------------------------------------- q344

  /** Two-component 1-D GMM over event values, 2 EM iterations from a
    * mean-split init (component 1 = below-mean half, component 2 =
    * above-mean half — the 1-D k-means++ analogue, so EM starts inside
    * the right basin). Deterministic: every responsibility is one fixed
    * double expression of decimal sums; variances carry a 1e-6 floor on
    * both engines so a constant half cannot zero a denominator.
    * Corpus invariant (documented, like q276/q280): value is
    * non-constant, so both halves of the mean split are non-empty.
    */
  def gmmEm(events: DataFrame): DataFrame = {
    val x = events.select(dec(col("value"), 6).cast("double").as("x"))
    val m = x.agg(count(lit(1)).as("n"),
        sum(dec(col("x"), 6)).cast("decimal(28,6)").as("s1"))
      .select(col("n"), expr("CAST(s1 AS DOUBLE) / n").as("m"))
    val hl = (hi: Boolean, c: Column) =>
      sum(when(if (hi) col("x") > col("m") else col("x") <= col("m"), c))
    val init = x.crossJoin(broadcast(m))
      .agg(max("n").as("n"),
        sum((col("x") > col("m")).cast("long")).as("n2"),
        hl(false, dec(col("x"), 6)).cast("decimal(28,6)").as("s1l"),
        hl(false, (dec(col("x"), 6) * dec(col("x"), 6))
          .cast("decimal(38,12)")).cast("decimal(38,12)").as("s2l"),
        hl(true, dec(col("x"), 6)).cast("decimal(28,6)").as("s1h"),
        hl(true, (dec(col("x"), 6) * dec(col("x"), 6))
          .cast("decimal(38,12)")).cast("decimal(38,12)").as("s2h"))
      .select(col("n"),
        expr("CAST(n2 AS DOUBLE) / n").as("pi2"),
        expr("CAST(s1l AS DOUBLE) / (n - n2)").as("mu1"),
        expr("CAST(s1h AS DOUBLE) / n2").as("mu2"),
        expr("""GREATEST(CAST(s2l AS DOUBLE) / (n - n2)
          - (CAST(s1l AS DOUBLE) / (n - n2))
            * (CAST(s1l AS DOUBLE) / (n - n2)), 1e-6)""").as("v1"),
        expr("""GREATEST(CAST(s2h AS DOUBLE) / n2
          - (CAST(s1h AS DOUBLE) / n2)
            * (CAST(s1h AS DOUBLE) / n2), 1e-6)""").as("v2"))
      .localCheckpoint()
    def step(p: DataFrame): DataFrame = {
      val phi = (mu: String, v: String) =>
        s"exp(-(x - $mu) * (x - $mu) / (2 * $v)) / sqrt(2 * pi() * $v)"
      x.crossJoin(broadcast(p))
        .withColumn("r2", expr(
          s"pi2 * ${phi("mu2", "v2")} / ((1.0 - pi2) * ${phi("mu1", "v1")} + pi2 * ${phi("mu2", "v2")})"))
        .agg(max("n").as("n"),
          sum(dec(col("r2"), 10)).as("sr2"),
          sum(dec(expr("r2 * x"), 6)).cast("decimal(28,6)").as("sx2"),
          sum(dec(expr("r2 * x * x"), 6)).cast("decimal(28,6)").as("sq2"),
          sum(dec(expr("(1.0 - r2) * x"), 6)).cast("decimal(28,6)").as("sx1"),
          sum(dec(expr("(1.0 - r2) * x * x"), 6)).cast("decimal(28,6)")
            .as("sq1"))
        .withColumn("pi2", expr("CAST(sr2 AS DOUBLE) / n"))
        .withColumn("mu2", expr("CAST(sx2 AS DOUBLE) / CAST(sr2 AS DOUBLE)"))
        .withColumn("mu1", expr(
          "CAST(sx1 AS DOUBLE) / (n - CAST(sr2 AS DOUBLE))"))
        .withColumn("v2", expr(
          "GREATEST(CAST(sq2 AS DOUBLE) / CAST(sr2 AS DOUBLE) - mu2 * mu2, 1e-6)"))
        .withColumn("v1", expr(
          "GREATEST(CAST(sq1 AS DOUBLE) / (n - CAST(sr2 AS DOUBLE)) - mu1 * mu1, 1e-6)"))
        .select("n", "pi2", "mu1", "mu2", "v1", "v2")
        .localCheckpoint()
    }
    val fit = step(step(init))
    fit.select(col("n"), round(col("pi2"), 6).as("pi2"),
      round(col("mu1"), 6).as("mu1"), round(col("mu2"), 6).as("mu2"),
      round(expr("sqrt(v1)"), 6).as("sigma1"),
      round(expr("sqrt(v2)"), 6).as("sigma2"))
  }

  private val gmmOracle = """
    WITH x AS MATERIALIZED (
      SELECT CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS x FROM events),
    g AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS s1
      FROM x),
    mm AS (SELECT n, CAST(s1 AS DOUBLE) / n AS m FROM g),
    init0 AS (
      SELECT MAX(mm.n) AS n,
        CAST(SUM(CASE WHEN x > mm.m THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN x <= mm.m THEN CAST(x AS DECIMAL(18,6)) END)
          AS DECIMAL(28,6)) AS s1l,
        CAST(SUM(CASE WHEN x <= mm.m THEN
            CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
              AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS s2l,
        CAST(SUM(CASE WHEN x > mm.m THEN CAST(x AS DECIMAL(18,6)) END)
          AS DECIMAL(28,6)) AS s1h,
        CAST(SUM(CASE WHEN x > mm.m THEN
            CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))
              AS DECIMAL(38,12)) END) AS DECIMAL(38,12)) AS s2h
      FROM x, mm),
    p0 AS (
      SELECT n, CAST(n2 AS DOUBLE) / n AS pi2,
        CAST(s1l AS DOUBLE) / (n - n2) AS mu1,
        CAST(s1h AS DOUBLE) / n2 AS mu2,
        GREATEST(CAST(s2l AS DOUBLE) / (n - n2)
          - (CAST(s1l AS DOUBLE) / (n - n2))
            * (CAST(s1l AS DOUBLE) / (n - n2)), 1e-6) AS v1,
        GREATEST(CAST(s2h AS DOUBLE) / n2
          - (CAST(s1h AS DOUBLE) / n2)
            * (CAST(s1h AS DOUBLE) / n2), 1e-6) AS v2
      FROM init0),
    e1 AS (
      SELECT p.n,
        p.pi2 * (exp(-(x - p.mu2) * (x - p.mu2) / (2 * p.v2))
          / sqrt(2 * pi() * p.v2))
        / ((1.0 - p.pi2) * (exp(-(x - p.mu1) * (x - p.mu1) / (2 * p.v1))
            / sqrt(2 * pi() * p.v1))
          + p.pi2 * (exp(-(x - p.mu2) * (x - p.mu2) / (2 * p.v2))
            / sqrt(2 * pi() * p.v2))) AS r2,
        x
      FROM x, p0 p),
    p1 AS (
      SELECT MAX(n) AS n,
        CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) / MAX(n) AS pi2,
        CAST(CAST(SUM(CAST((1.0 - r2) * x AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE)
          / (MAX(n) - CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE)) AS mu1,
        CAST(CAST(SUM(CAST(r2 * x AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE)
          / CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) AS mu2,
        CAST(CAST(SUM(CAST((1.0 - r2) * x * x AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE)
          / (MAX(n) - CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE))
          AS sq1n,
        CAST(CAST(SUM(CAST(r2 * x * x AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE)
          / CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) AS sq2n
      FROM e1),
    p1f AS (
      SELECT n, pi2, mu1, mu2,
        GREATEST(sq1n - mu1 * mu1, 1e-6) AS v1,
        GREATEST(sq2n - mu2 * mu2, 1e-6) AS v2
      FROM p1),
    e2 AS (
      SELECT p.n,
        p.pi2 * (exp(-(x - p.mu2) * (x - p.mu2) / (2 * p.v2))
          / sqrt(2 * pi() * p.v2))
        / ((1.0 - p.pi2) * (exp(-(x - p.mu1) * (x - p.mu1) / (2 * p.v1))
            / sqrt(2 * pi() * p.v1))
          + p.pi2 * (exp(-(x - p.mu2) * (x - p.mu2) / (2 * p.v2))
            / sqrt(2 * pi() * p.v2))) AS r2,
        x
      FROM x, p1f p),
    p2 AS (
      SELECT MAX(n) AS n,
        CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) / MAX(n) AS pi2,
        CAST(CAST(SUM(CAST((1.0 - r2) * x AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE)
          / (MAX(n) - CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE)) AS mu1,
        CAST(CAST(SUM(CAST(r2 * x AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE)
          / CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) AS mu2,
        CAST(CAST(SUM(CAST((1.0 - r2) * x * x AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE)
          / (MAX(n) - CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE))
          AS sq1n,
        CAST(CAST(SUM(CAST(r2 * x * x AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE)
          / CAST(SUM(CAST(r2 AS DECIMAL(18,10))) AS DOUBLE) AS sq2n
      FROM e2)
    SELECT n, ROUND(pi2, 6) AS pi2, ROUND(mu1, 6) AS mu1,
      ROUND(mu2, 6) AS mu2,
      ROUND(sqrt(GREATEST(sq1n - mu1 * mu1, 1e-6)), 6) AS sigma1,
      ROUND(sqrt(GREATEST(sq2n - mu2 * mu2, 1e-6)), 6) AS sigma2
    FROM p2"""

  // ---------------------------------------------------------------- q347

  /** V-optimal histogram DP over 32 equal-width cent pre-bins of order
    * prices: best_r(32) = the minimum total within-bucket SSE using r
    * buckets, r = 1..8 — the optimizer-statistics planning curve. The
    * lattice is 33 prefix rows; SSE(i,j) is a double of exact integer
    * cent sums, so the min is engine-independent.
    */
  def voptHistogram(orders: DataFrame): DataFrame = {
    val cents = orders.select(
      round(col("o_totalprice") * 100).cast("decimal(18,0)").cast("long")
        .as("c"))
    val maxc = cents.agg(max("c").as("maxc"))
    val binned = cents.crossJoin(broadcast(maxc))
      .withColumn("b", least(expr("c * 32 DIV (maxc + 1)"), lit(31L)))
      .groupBy("b")
      .agg(count(lit(1)).as("nb"),
        sum("c").cast("decimal(38,0)").as("s1"),
        sum((col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("s2"))
    val dense = binned.sparkSession.range(0, 32).select(col("id").as("b"))
      .join(binned, Seq("b"), "left")
      .na.fill(0L, Seq("nb"))
      .select(col("b"), col("nb"), coalesce(col("s1"), lit(0)).as("s1"),
        coalesce(col("s2"), lit(0)).as("s2"))
    val wo = Window.orderBy("b")
    val prefix = dense
      .select((col("b") + 1).as("j"), sum("nb").over(wo).as("pn"),
        sum("s1").over(wo).as("ps1"), sum("s2").over(wo).as("ps2"))
      .unionAll(binned.sparkSession.range(1).select(lit(0L).as("j"),
        lit(0L).as("pn"), lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
          .as("ps1"), lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
          .as("ps2")))
      .localCheckpoint() // 33 rows; the whole DP runs on this lattice
    // The DP runs on the driver over the COLLECTED 33-row prefix
    // lattice (bounded by construction: 33 rows regardless of corpus
    // size) — 8 rounds of 3-row Spark jobs cost seconds of scheduler
    // time for microseconds of arithmetic. ps2 diffs exceed 2^53:
    // BigDecimal->double (Spark) and int128->double (DuckDB) round such
    // casts differently (the q140 hazard), so split into exact <2^53
    // hi/lo parts and reassemble in IEEE double ops — bit-identical to
    // the oracle's identical formula.
    val lattice = prefix.orderBy("j").collect().map { r =>
      (r.getAs[Long]("j").toInt, r.getAs[Long]("pn"),
        r.getAs[java.math.BigDecimal]("ps1").toBigInteger,
        r.getAs[java.math.BigDecimal]("ps2").toBigInteger)
    }
    val pn = lattice.map(_._2); val ps1 = lattice.map(_._3)
    val ps2 = lattice.map(_._4)
    val M = java.math.BigInteger.valueOf(67108864L)
    def sse(i: Int, j: Int): Double = {
      val dn = pn(j) - pn(i)
      if (dn <= 0) 0.0
      else {
        val db = ps2(j).subtract(ps2(i))
        val Array(hi, lo) = db.divideAndRemainder(M)
        val da = ps1(j).subtract(ps1(i)).doubleValue()
        hi.doubleValue() * 67108864.0 + lo.doubleValue() - da * da / dn
      }
    }
    var best = Array.tabulate(33)(j => if (j >= 1) sse(0, j) else Double.NaN)
    val out = Seq.newBuilder[(Long, Double)]
    out += ((1L, best(32)))
    for (r <- 2 to 8) {
      val next = Array.fill(33)(Double.NaN)
      for (j <- 2 to 32) {
        var m = Double.PositiveInfinity
        for (i <- 1 until j) {
          val v = best(i) + sse(i, j)
          if (v < m) m = v
        }
        next(j) = m
      }
      best = next
      out += ((r.toLong, best(32)))
    }
    val s = orders.sparkSession
    import s.implicits._
    out.result().toDF("r", "c")
      .select(col("r"), round(expr("c / 10000.0"), 4).as("sse_dollars2"))
      .orderBy("r")
  }

  private val voptOracle = """
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
    mx AS (SELECT MAX(c) AS maxc FROM cents),
    binned AS (
      SELECT LEAST(c * 32 // (maxc + 1), 31) AS b, COUNT(*) AS nb,
        CAST(SUM(c) AS DECIMAL(38,0)) AS s1,
        SUM(CAST(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
          AS DECIMAL(38,0))) AS s2
      FROM cents, mx GROUP BY 1),
    dense AS (
      SELECT g.b, COALESCE(nb, 0) AS nb, COALESCE(s1, 0) AS s1,
        COALESCE(s2, 0) AS s2
      FROM (SELECT CAST(UNNEST(generate_series(0, 31)) AS BIGINT) AS b) g
      LEFT JOIN binned USING (b)),
    prefix AS MATERIALIZED (
      SELECT b + 1 AS j,
        CAST(SUM(nb) OVER (ORDER BY b) AS BIGINT) AS pn,
        SUM(s1) OVER (ORDER BY b) AS ps1,
        SUM(s2) OVER (ORDER BY b) AS ps2
      FROM dense
      UNION ALL SELECT 0, 0, 0, 0),
    sse AS MATERIALIZED (
      SELECT l.j AS i, h.j AS j,
        CASE WHEN h.pn - l.pn > 0 THEN
          (CAST(CAST(h.ps2 - l.ps2 AS HUGEINT) // 67108864 AS DOUBLE)
              * CAST(67108864 AS DOUBLE)
            + CAST(CAST(h.ps2 - l.ps2 AS HUGEINT) % 67108864 AS DOUBLE))
            - CAST(h.ps1 - l.ps1 AS DOUBLE) * CAST(h.ps1 - l.ps1 AS DOUBLE)
              / (h.pn - l.pn)
        ELSE 0.0 END AS c
      FROM prefix l, prefix h WHERE l.j < h.j),
    b1 AS (SELECT j, c FROM sse WHERE i = 0),
    b2 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b1 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b3 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b2 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b4 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b3 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b5 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b4 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b6 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b5 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b7 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b6 p JOIN sse s ON s.i = p.j
           GROUP BY s.j),
    b8 AS (SELECT s.j, MIN(p.c + s.c) AS c FROM b7 p JOIN sse s ON s.i = p.j
           GROUP BY s.j)
    SELECT CAST(r AS BIGINT) AS r, ROUND(c / 10000.0, 4) AS sse_dollars2 FROM (
      SELECT 1 AS r, c FROM b1 WHERE j = 32
      UNION ALL SELECT 2, c FROM b2 WHERE j = 32
      UNION ALL SELECT 3, c FROM b3 WHERE j = 32
      UNION ALL SELECT 4, c FROM b4 WHERE j = 32
      UNION ALL SELECT 5, c FROM b5 WHERE j = 32
      UNION ALL SELECT 6, c FROM b6 WHERE j = 32
      UNION ALL SELECT 7, c FROM b7 WHERE j = 32
      UNION ALL SELECT 8, c FROM b8 WHERE j = 32)
    ORDER BY r"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q344_gmm_em", (s, d) => gmmEm(events(s, d)), Some(gmmOracle)),
    Q("q347_vopt_histogram",
      (s, d) => voptHistogram(orders(s, d)), Some(voptOracle)),
  )
}
