package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Sequential/iterative operators (SURVEY.md §2.9 extension surface):
  * Wald's SPRT early-stopping audit over the event stream, a
  * personalized-PageRank proximity walk on the trade digraph, a
  * two-step EM fit of the bigram/unigram LM interpolation weight, and
  * the Markov stationary distribution of the event-type chain. The
  * reference has none of these (its testing surface is a single offline
  * AUC, `03a_Model Training.py:300-330`).
  *
  * Oracle-exactness discipline (graft-oracle-exactness): both walks are
  * pure BIGINT arithmetic — SPRT uses micro-scaled log-likelihood
  * constants (the rounding of ln(4/3)/ln(6/7)/ln(19) to 1e-6 is part of
  * the pinned spec), PPR uses the q275 truncating fixed-point scheme —
  * so every step is bit-identical across engines.
  *
  * Scale discipline: SPRT is one window pass partitioned by event type
  * (the statistic itself is sequential per stream; types scan in
  * parallel); PPR's corpus pass is one edge rollup, the iteration runs
  * on the dimension-bounded graph.
  */
object Walks extends QueryModule {

  // ---------------------------------------------------------------- q281

  /** Wald SPRT per event type: H0 p=0.3 vs H1 p=0.4 on the success
    * indicator value>50, alpha=beta=0.05. The log-likelihood walk uses
    * micro-scaled integer increments a=+287682 (success, ln(4/3)·1e6)
    * and b=-154151 (failure, ln(6/7)·1e6) against the threshold
    * ±2944439 (ln(19)·1e6); the decision row is the first crossing in
    * the pinned (ts, event_id) order. Reports the stopping time, the
    * decision, and the empirical rate at the stop — the early-stopping
    * audit that replaces fixed-n tests in streaming experiments.
    */
  def sprtDecision(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
    val walk = events
      .withColumn("s", (col("value") > 50.0).cast("long"))
      .withColumn("n", row_number().over(byType).cast("long"))
      .withColumn("k", sum("s").over(byType))
      .withColumn("llr_micro",
        col("k") * lit(287682L) + (col("n") - col("k")) * lit(-154151L))
    val crossings = walk
      .filter(abs(col("llr_micro")) >= 2944439L)
      .groupBy(col("event_type").as("ct")).agg(min("n").as("decision_n"))
    walk.join(crossings,
        col("event_type") === col("ct") && col("n") === col("decision_n"))
      .select(col("event_type"), col("decision_n"), col("llr_micro"),
        when(col("llr_micro") > 0, "accept_h1").otherwise("accept_h0")
          .as("decision"),
        round(col("k").cast("double") / col("n"), 6).as("p_hat_at_stop"))
      .orderBy("event_type")
  }

  private val sprtOracle = """
    WITH walk AS (
      SELECT event_type,
        ROW_NUMBER() OVER w AS n,
        SUM(CAST(value > 50.0 AS BIGINT)) OVER w AS k
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    llr AS (
      SELECT event_type, n, k,
        CAST(k * 287682 + (n - k) * -154151 AS BIGINT) AS llr_micro
      FROM walk),
    crossings AS (
      SELECT event_type, MIN(n) AS decision_n FROM llr
      WHERE ABS(llr_micro) >= 2944439 GROUP BY 1)
    SELECT l.event_type, c.decision_n, l.llr_micro,
      CASE WHEN l.llr_micro > 0 THEN 'accept_h1' ELSE 'accept_h0' END
        AS decision,
      ROUND(CAST(l.k AS DOUBLE) / l.n, 6) AS p_hat_at_stop
    FROM llr l JOIN crossings c
      ON l.event_type = c.event_type AND l.n = c.decision_n
    ORDER BY l.event_type"""

  // ---------------------------------------------------------------- q282

  /** Personalized PageRank (restart 0.15, two q275-style fixed-point
    * micro-unit rounds) from the lowest-keyed supplier nation: all
    * restart and dangling mass teleports to the seed, so the scores
    * rank nations by trade proximity TO that seed rather than global
    * centrality. Seed choice, truncating division, and iteration count
    * are pinned, making the walk bit-identical across engines.
    */
  def personalizedPagerank(li: DataFrame, orders: DataFrame,
      supplier: DataFrame, customer: DataFrame): DataFrame = {
    val edges = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .distinct()
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
    val seed = edges.agg(min("src").as("s"))

    def step(pr: DataFrame): DataFrame = {
      val contrib = edges
        .join(pr.withColumnRenamed("n", "src"), "src")
        .join(broadcast(outdeg), "src")
        .groupBy(col("dst").as("n"))
        .agg(sum(expr("850000L * pr DIV (1000000L * od)")).as("in_mass"))
      val dangling = pr.join(broadcast(outdeg.withColumnRenamed("src", "n")),
          Seq("n"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0L)).as("d"))
      nodes.crossJoin(broadcast(seed)).crossJoin(broadcast(dangling))
        .join(contrib, Seq("n"), "left")
        .select(col("n"),
          (when(col("n") === col("s"),
            lit(150000L) + expr("850000L * d DIV 1000000L"))
            .otherwise(lit(0L))
            + coalesce(col("in_mass"), lit(0L))).as("pr"))
    }
    val pr0 = nodes.crossJoin(broadcast(seed))
      .select(col("n"),
        when(col("n") === col("s"), lit(1000000L)).otherwise(lit(0L)).as("pr"))
    val pr2 = step(step(pr0))
    pr2.crossJoin(broadcast(seed))
      .select(col("n").cast("long").as("nationkey"),
        col("s").cast("long").as("seed_nation"),
        col("pr").cast("long").as("ppr_micro"),
        round(col("pr").cast("double") / 1e6, 6).as("ppr"))
      .filter(col("ppr_micro") > 0)
      .orderBy(col("ppr_micro").desc, col("nationkey"))
  }

  private val pprOracle = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey),
    outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY 1),
    nodes AS MATERIALIZED (
      SELECT src AS n FROM edges UNION SELECT dst AS n FROM edges),
    seed AS (SELECT MIN(src) AS s FROM edges),
    pr0 AS MATERIALIZED (
      SELECT n, CASE WHEN n = s THEN CAST(1000000 AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS pr
      FROM nodes CROSS JOIN seed),
    c1 AS (
      SELECT e.dst AS n, SUM(850000 * p.pr // (1000000 * o.od)) AS in_mass
      FROM edges e JOIN pr0 p ON e.src = p.n JOIN outdeg o ON e.src = o.src
      GROUP BY 1),
    d1 AS (
      SELECT COALESCE(SUM(pr), 0) AS d FROM pr0
      WHERE n NOT IN (SELECT src FROM outdeg)),
    pr1 AS MATERIALIZED (
      SELECT nodes.n,
        CASE WHEN nodes.n = s THEN 150000 + 850000 * d // 1000000 ELSE 0 END
          + COALESCE(c1.in_mass, 0) AS pr
      FROM nodes CROSS JOIN seed CROSS JOIN d1
      LEFT JOIN c1 ON nodes.n = c1.n),
    c2 AS (
      SELECT e.dst AS n, SUM(850000 * p.pr // (1000000 * o.od)) AS in_mass
      FROM edges e JOIN pr1 p ON e.src = p.n JOIN outdeg o ON e.src = o.src
      GROUP BY 1),
    d2 AS (
      SELECT COALESCE(SUM(pr), 0) AS d FROM pr1
      WHERE n NOT IN (SELECT src FROM outdeg)),
    pr2 AS (
      SELECT nodes.n,
        CASE WHEN nodes.n = s THEN 150000 + 850000 * d // 1000000 ELSE 0 END
          + COALESCE(c2.in_mass, 0) AS pr
      FROM nodes CROSS JOIN seed CROSS JOIN d2
      LEFT JOIN c2 ON nodes.n = c2.n)
    SELECT CAST(pr2.n AS BIGINT) AS nationkey, CAST(s AS BIGINT) AS seed_nation,
      CAST(pr AS BIGINT) AS ppr_micro,
      ROUND(CAST(pr AS DOUBLE) / 1e6, 6) AS ppr
    FROM pr2 CROSS JOIN seed
    WHERE pr > 0
    ORDER BY ppr_micro DESC, nationkey"""

  // ---------------------------------------------------------------- q283

  /** Two EM steps for the interpolation weight λ of the mixed bigram/
    * unigram LM P(w2|w1) = λ·p2 + (1-λ)·p1, per source: the E-step
    * posterior λ·p2/(λ·p2+(1-λ)·p1) is a fixed closed form over exact
    * count ratios, the M-step mean accumulates 1e-12-rounded decimals
    * (order-independent), and λ re-enters the next step rounded to the
    * 1e-12 grid — the textbook Jelinek-Mercer tuning loop, determinized.
    * Two corpus passes (one per EM step); the LM tables are
    * postings-sized and join on the bigram key.
    */
  def emInterpolation(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), split(col("text"), " ").as("t"))
    val bg = toks.select(col("source"),
        explode(expr("""CASE WHEN size(t) >= 2
          |THEN transform(sequence(0, size(t)-2),
          |  i -> named_struct('w1', t[i], 'w2', t[i+1]))
          |ELSE array() END""".stripMargin)).as("b"))
      .select(col("source"), col("b.w1"), col("b.w2"))
    // ONE corpus groupBy (distinct bigram counts); the unigram/total
    // frames derive from it, and the EM passes run over DISTINCT bigrams
    // weighted by cb — every occurrence of a bigram contributes the
    // identical posterior, so sum(post) over occurrences equals
    // sum(post·cb) over distinct bigrams EXACTLY (decimal × integer).
    // The previous shape checkpointed the corpus-occurrence frame, ran
    // four groupBys over it, and carried per-OCCURRENCE posterior rows
    // through both EM shuffles.
    val cb = bg.groupBy("source", "w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // reused: cu/c2/n derivations + both EM passes
    val cu = cb.groupBy("source", "w1").agg(sum("cb").as("cu"))
    val c2 = cb.groupBy("source", "w2").agg(sum("cb").as("c2"))
    val n = cb.groupBy("source").agg(sum("cb").as("n"))
    val probs = cb
      .join(cu, Seq("source", "w1"))
      .join(c2, Seq("source", "w2")).join(n, Seq("source"))
      .select(col("source"), col("cb"), col("n"),
        (col("cb").cast("double") / col("cu")).as("p2"),
        (col("c2").cast("double") / col("n")).as("p1"))
      .localCheckpoint()

    def emStep(lam: DataFrame): DataFrame =
      probs.join(broadcast(lam), "source")
        .withColumn("post", expr(
          """CAST(lam AS DOUBLE) * p2
            | / (CAST(lam AS DOUBLE) * p2 + (1.0 - CAST(lam AS DOUBLE)) * p1)
            |""".stripMargin))
        .groupBy("source")
        .agg(round(
          // post ∈ [0,1]: DECIMAL(13,12) rounds at the same scale the
          // occurrence form's DECIMAL(28,12) cast did; × DECIMAL(10,0)
          // stays exact at DECIMAL(24,12) (no precision-overflow rescale)
          sum(expr("CAST(post AS DECIMAL(13,12)) * CAST(cb AS DECIMAL(10,0))"))
            .cast("double") / max(col("n")), 12)
          .cast("decimal(14,12)").as("lam"))

    val lam0 = n.select(col("source"),
      lit(BigDecimal("0.5")).cast("decimal(14,12)").as("lam"))
    val lam1 = emStep(lam0).localCheckpoint()
    val lam2 = emStep(lam1)
    lam1.withColumnRenamed("lam", "l1")
      .join(lam2.withColumnRenamed("lam", "l2"), "source")
      .join(n, "source")
      .select(col("source"), col("n").cast("long").as("n_bigrams"),
        round(col("l1").cast("double"), 6).as("lambda_em1"),
        round(col("l2").cast("double"), 6).as("lambda_em2"))
      .orderBy("source")
  }

  private val emOracle = """
    WITH toks AS (
      SELECT source, string_split(text, ' ') AS t FROM documents),
    bg AS MATERIALIZED (
      SELECT source, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM toks),
    cb AS (SELECT source, w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2, 3),
    cu AS (SELECT source, w1, COUNT(*) AS cu FROM bg GROUP BY 1, 2),
    c2 AS (SELECT source, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    n AS (SELECT source, COUNT(*) AS n FROM bg GROUP BY 1),
    probs AS MATERIALIZED (
      SELECT b.source,
        CAST(cb.cb AS DOUBLE) / cu.cu AS p2,
        CAST(c2.c2 AS DOUBLE) / n.n AS p1
      FROM bg b
      JOIN cb ON b.source = cb.source AND b.w1 = cb.w1 AND b.w2 = cb.w2
      JOIN cu ON b.source = cu.source AND b.w1 = cu.w1
      JOIN c2 ON b.source = c2.source AND b.w2 = c2.w2
      JOIN n ON b.source = n.source),
    lam1 AS MATERIALIZED (
      SELECT source, CAST(ROUND(CAST(SUM(CAST(
          0.5 * p2 / (0.5 * p2 + 0.5 * p1)
        AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 12) AS DECIMAL(14,12))
        AS lam
      FROM probs GROUP BY 1),
    lam2 AS (
      SELECT p.source, CAST(ROUND(CAST(SUM(CAST(
          CAST(l.lam AS DOUBLE) * p.p2
            / (CAST(l.lam AS DOUBLE) * p.p2
               + (1.0 - CAST(l.lam AS DOUBLE)) * p.p1)
        AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 12) AS DECIMAL(14,12))
        AS lam
      FROM probs p JOIN lam1 l ON p.source = l.source
      GROUP BY 1)
    SELECT n.source, CAST(n.n AS BIGINT) AS n_bigrams,
      ROUND(CAST(l1.lam AS DOUBLE), 6) AS lambda_em1,
      ROUND(CAST(l2.lam AS DOUBLE), 6) AS lambda_em2
    FROM n JOIN lam1 l1 ON n.source = l1.source
    JOIN lam2 l2 ON n.source = l2.source
    ORDER BY n.source"""

  // ---------------------------------------------------------------- q284

  /** Stationary distribution of the per-user event-type Markov chain:
    * the transition matrix comes from one corpus pass (q159's
    * consecutive-pair rollup), then three q275-style fixed-point
    * micro-unit iterations from the uniform start — truncating integer
    * division keeps the walk bit-identical across engines. Complements
    * q241 (entropy rate of the same chain) with its long-run occupancy.
    */
  def markovStationary(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("nxt", lead("event_type", 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // |types|² rows; reused by all iterations
    val rows = trans.groupBy("a").agg(sum("c").as("rs"))
    val states = trans.select(col("a").as("st"))
      .union(trans.select(col("b").as("st"))).distinct()
    val nStates = states.agg(count(lit(1)).as("ns"))

    def step(pi: DataFrame): DataFrame =
      trans
        .join(pi.withColumnRenamed("st", "a"), "a")
        .join(broadcast(rows), "a")
        .groupBy(col("b").as("st"))
        .agg(sum(expr("pi * c DIV rs")).as("pi"))

    val pi0 = states.crossJoin(broadcast(nStates))
      .select(col("st"), expr("1000000L DIV ns").as("pi"))
    val pi3 = step(step(step(pi0)))
    pi3.select(col("st").as("event_type"), col("pi").cast("long").as("pi_micro"),
        round(col("pi").cast("double") / 1e6, 6).as("stationary"))
      .orderBy("event_type")
  }

  private val markovOracle = """
    WITH seq AS (
      SELECT event_type AS a,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS b
      FROM events),
    trans AS MATERIALIZED (
      SELECT a, b, COUNT(*) AS c FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
    rows_ AS (SELECT a, CAST(SUM(c) AS BIGINT) AS rs FROM trans GROUP BY 1),
    states AS MATERIALIZED (
      SELECT a AS st FROM trans UNION SELECT b AS st FROM trans),
    ns AS (SELECT COUNT(*) AS ns FROM states),
    pi0 AS MATERIALIZED (
      SELECT st, 1000000 // ns AS pi FROM states CROSS JOIN ns),
    pi1 AS MATERIALIZED (
      SELECT t.b AS st, CAST(SUM(p.pi * t.c // r.rs) AS BIGINT) AS pi
      FROM trans t JOIN pi0 p ON t.a = p.st JOIN rows_ r ON t.a = r.a
      GROUP BY 1),
    pi2 AS MATERIALIZED (
      SELECT t.b AS st, CAST(SUM(p.pi * t.c // r.rs) AS BIGINT) AS pi
      FROM trans t JOIN pi1 p ON t.a = p.st JOIN rows_ r ON t.a = r.a
      GROUP BY 1),
    pi3 AS (
      SELECT t.b AS st, CAST(SUM(p.pi * t.c // r.rs) AS BIGINT) AS pi
      FROM trans t JOIN pi2 p ON t.a = p.st JOIN rows_ r ON t.a = r.a
      GROUP BY 1)
    SELECT st AS event_type, pi AS pi_micro,
      ROUND(CAST(pi AS DOUBLE) / 1e6, 6) AS stationary
    FROM pi3 ORDER BY event_type"""

  // ---------------------------------------------------------------- q361

  /** Expected steps to absorption in the per-user event-type chain,
    * with 'purchase' absorbing: E = 1 + Q·E restricted to transient
    * states, run as six q284-style micro-unit fixed-point iterations
    * from E⁰ = 0 (monotone increasing; fixed iteration count, not
    * converged-to-tolerance — documented audit semantics). The
    * truncating per-term `e·c DIV rs` keeps every iteration exact
    * integer micro-steps on both engines. Answers "how many more
    * actions until a user converts, given where they are now".
    */
  def absorbingSteps(events: DataFrame, iters: Int = 6): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("nxt", lead("event_type", 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("a") =!= "purchase") // rows OUT of transient states only
      .localCheckpoint()
    val rows = trans.groupBy("a").agg(sum("c").as("rs")).localCheckpoint()
    var e = rows.select(col("a").as("st"), lit(0L).as("e"))
    for (_ <- 1 to iters) {
      val qe = trans
        .join(e.select(col("st").as("b"), col("e")), "b") // transient b only
        .groupBy("a")
        .agg(sum(expr("e * c")).as("sec"))
      e = rows.join(qe, Seq("a"), "left")
        .select(col("a").as("st"),
          (lit(1000000L) + coalesce(expr("sec DIV rs"), lit(0L))).as("e"))
        .localCheckpoint() // |transient| rows; keeps the tree flat
    }
    e.select(col("st").as("event_type"), col("e").as("e_steps_micro"),
        round(col("e").cast("double") / 1e6, 4).as("expected_steps"))
      .orderBy("event_type")
  }

  private val absorbingOracle = """
    WITH seq AS (
      SELECT event_type AS a,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS b
      FROM events),
    trans AS MATERIALIZED (
      SELECT a, b, COUNT(*) AS c FROM seq
      WHERE b IS NOT NULL AND a <> 'purchase' GROUP BY 1, 2),
    rows_ AS MATERIALIZED (
      SELECT a, CAST(SUM(c) AS BIGINT) AS rs FROM trans GROUP BY 1),
    e0 AS (SELECT a AS st, CAST(0 AS BIGINT) AS e FROM rows_),
    e1 AS MATERIALIZED (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e0 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a),
    e2 AS MATERIALIZED (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e1 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a),
    e3 AS MATERIALIZED (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e2 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a),
    e4 AS MATERIALIZED (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e3 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a),
    e5 AS MATERIALIZED (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e4 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a),
    e6 AS (
      SELECT r.a AS st, 1000000 + COALESCE(q.sec // r.rs, 0) AS e
      FROM rows_ r LEFT JOIN (
        SELECT t.a, CAST(SUM(p.e * t.c) AS BIGINT) AS sec
        FROM trans t JOIN e5 p ON t.b = p.st GROUP BY 1) q ON q.a = r.a)
    SELECT st AS event_type, CAST(e AS BIGINT) AS e_steps_micro,
      ROUND(CAST(e AS DOUBLE) / 1e6, 4) AS expected_steps
    FROM e6 ORDER BY event_type"""

  // ------------------------------------------------------------ queries

  // ---------------------------------------------------------------- q406

  /** BFS hop distances from the smallest node of the top-quintile
    * trade graph — multi-hop reachability as an iterative frontier
    * expansion (the relational form of a recursive query, which Spark
    * lacks natively; the DuckDB oracle IS a recursive CTE, so the two
    * engines cross-check genuinely different evaluation strategies).
    * Edges keep only weights ≥ the 80th percentile so the graph is
    * sparse enough to have real distances. Each round is one
    * dimension-sized join + anti-join; rounds are bounded by the
    * diameter, and the only driver-side signal is the per-round
    * empty-frontier check (a count on a ≤|nations| frame).
    */
  def bfsHops(li: DataFrame, orders: DataFrame, supplier: DataFrame,
      customer: DataFrame): DataFrame = {
    val weighted = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val cut = weighted.agg(expr("percentile(w, 0.8)").as("cw"))
    val und = weighted.crossJoin(broadcast(cut))
      .filter(col("w").cast("double") >= col("cw"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint() // reused every round
    val seed = adj.agg(min("u").as("s"))
    var dist = adj.crossJoin(broadcast(seed)).filter(col("u") === col("s"))
      .select(col("u").as("node"), lit(0L).as("hops")).distinct()
      .localCheckpoint()
    var frontier = dist
    var d = 0L
    var done = frontier.isEmpty
    while (!done && d < 30) {
      d += 1
      val next = adj.join(frontier, adj("u") === frontier("node"))
        .select(adj("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(d).as("hops"))
        .localCheckpoint()
      done = next.isEmpty
      if (!done) { dist = dist.union(next).localCheckpoint(); frontier = next }
    }
    dist.orderBy("hops", "node")
      .select(col("node").cast("long").as("node"), col("hops"))
  }

  private val bfsOracle = """
    WITH RECURSIVE weighted AS MATERIALIZED (
      SELECT s_nationkey AS src, c_nationkey AS dst, COUNT(*) AS w
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      WHERE s_nationkey <> c_nationkey GROUP BY 1, 2),
    cut AS (SELECT quantile_cont(w, 0.8) AS cw FROM weighted),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM weighted, cut WHERE CAST(w AS DOUBLE) >= cw),
    adj AS MATERIALIZED (
      SELECT a AS u, b AS v FROM und
      UNION ALL SELECT b AS u, a AS v FROM und),
    seed AS (SELECT MIN(u) AS s FROM adj),
    bfs AS (
      SELECT s AS node, 0 AS d FROM seed
      UNION
      SELECT a.v AS node, b.d + 1 AS d
      FROM bfs b JOIN adj a ON a.u = b.node WHERE b.d < 30)
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(d) AS BIGINT) AS hops
    FROM bfs GROUP BY node ORDER BY hops, node"""

  override def queries: Seq[Q] = Seq(
    Q("q406_bfs_hops",
      (s, d) => bfsHops(lineitem(s, d), orders(s, d), supplier(s, d),
        customer(s, d)),
      Some(bfsOracle)),
    Q("q361_absorbing_steps",
      (s, d) => absorbingSteps(events(s, d)), Some(absorbingOracle)),
    Q("q281_sprt_decision",
      (s, d) => sprtDecision(events(s, d)), Some(sprtOracle)),
    Q("q282_personalized_pagerank",
      (s, d) => personalizedPagerank(lineitem(s, d), orders(s, d),
        supplier(s, d), customer(s, d)),
      Some(pprOracle)),
    Q("q283_em_interpolation",
      (s, d) => emInterpolation(documents(s, d)), Some(emOracle)),
    Q("q284_markov_stationary",
      (s, d) => markovStationary(events(s, d)), Some(markovOracle)),
  )
}
