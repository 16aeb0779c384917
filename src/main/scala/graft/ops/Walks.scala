package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Sequential-decision operators (SURVEY.md §2.9 extension surface):
  * Wald's SPRT early-stopping audit over the event stream and a
  * personalized-PageRank proximity walk on the trade digraph. The
  * reference has neither (its testing surface is a single offline AUC,
  * `03a_Model Training.py:300-330`).
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

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q281_sprt_decision",
      (s, d) => sprtDecision(events(s, d)), Some(sprtOracle)),
    Q("q282_personalized_pagerank",
      (s, d) => personalizedPagerank(lineitem(s, d), orders(s, d),
        supplier(s, d), customer(s, d)),
      Some(pprOracle)),
  )
}
