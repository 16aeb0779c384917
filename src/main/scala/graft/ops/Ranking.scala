package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Ranking-pipeline diagnostics, round 8 of the extension surface
  * (none exist in the reference): position-bias estimation from
  * within-session event positions (the position-based click model's
  * examination curve) and class-balanced loss weights via the
  * effective number of samples (Cui et al. CVPR'19) — the two tables a
  * ranking/classification trainer materializes before fitting.
  *
  * Exactness: positions are rank-exact windows over the documented
  * (ts, event_id) order; CTRs and weights are doubles of exact integer
  * counts (β powers via the C-library pow both engines share). Scale:
  * one window pass + position-sized rollups; nothing quadratic.
  */
object Ranking extends QueryModule {

  // ---------------------------------------------------------------- q377

  /** Position-based click-model audit: position = rank of the event in
    * its (user, day) session; click-through rate per position 1..10,
    * and the examination ratio CTR(p)/CTR(1) — the classical PBM bias
    * curve that debiases logged feedback before training a ranker.
    */
  def positionBias(events: DataFrame, maxPos: Int = 10): DataFrame = {
    val sess = events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_id"), col("ts"),
        (col("event_type") === "click").cast("long").as("is_click"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("user_id", "day").orderBy(col("ts"), col("event_id"))))
      .filter(col("pos") <= maxPos)
    val byPos = sess.groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("is_click").as("clicks"))
      .withColumn("ctr",
        col("clicks").cast("double") / col("n").cast("double"))
    val top = byPos.filter(col("pos") === 1)
      .select(col("ctr").as("ctr1"))
    byPos.crossJoin(broadcast(top))
      .select(col("pos").cast("long").as("pos"), col("n"), col("clicks"),
        round(col("ctr") * 1000000.0, 1).as("ctr_ppm"),
        when(col("ctr1") > 0, round(col("ctr") / col("ctr1"), 6))
          .as("examination_ratio"))
      .orderBy("pos")
  }

  private def positionOracle(maxPos: Int = 10): String = s"""
    WITH sess AS MATERIALIZED (
      SELECT user_id, CAST(ts AS DATE) AS day,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
          ORDER BY ts, event_id) AS pos
      FROM events),
    by_pos AS (
      SELECT pos, COUNT(*) AS n, CAST(SUM(is_click) AS BIGINT) AS clicks,
        CAST(SUM(is_click) AS DOUBLE) / COUNT(*) AS ctr
      FROM sess WHERE pos <= $maxPos GROUP BY 1),
    top AS (SELECT ctr AS ctr1 FROM by_pos WHERE pos = 1)
    SELECT CAST(pos AS BIGINT) AS pos, n, clicks,
      ROUND(ctr * 1000000.0, 1) AS ctr_ppm,
      CASE WHEN ctr1 > 0 THEN ROUND(ctr / ctr1, 6) END AS examination_ratio
    FROM by_pos, top ORDER BY pos"""

  // ---------------------------------------------------------------- q378

  /** Class-balanced loss weights via the effective number of samples:
    * E_n = (1 − β^n)/(1 − β), weight ∝ 1/E_n, normalized so weights
    * sum to the class count — the re-weighting table for long-tailed
    * label distributions, at β ∈ {0.9, 0.99, 0.999}. The β^n powers
    * are C-library pow of exact integer counts; normalization divides
    * by an exact-decimal sum of the per-class inverse effective
    * numbers.
    */
  def classBalanceWeights(events: DataFrame): DataFrame = {
    val counts = events.groupBy(col("event_type").as("label"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val k = counts.agg(count(lit(1)).as("k"))
    Seq(0.9, 0.99, 0.999).map { beta =>
      // both factors forced through DOUBLE literals: a decimal-typed
      // (1.0 - β) converts to double differently than double 1.0 − β
      val inv = counts
        .withColumn("inv_en", expr(
          s"""(CAST(1.0 AS DOUBLE) - CAST($beta AS DOUBLE))
             / (CAST(1.0 AS DOUBLE)
               - power(CAST($beta AS DOUBLE), CAST(n AS DOUBLE)))"""))
      val z = inv.agg(
        sum(expr("CAST(inv_en AS DECIMAL(18,12))")).cast("decimal(28,12)")
          .as("z"))
      inv.crossJoin(broadcast(z)).crossJoin(broadcast(k))
        .select(lit(beta).as("beta"), col("label"), col("n"),
          round(expr("inv_en * k / CAST(z AS DOUBLE)"), 6).as("weight"))
    }.reduce(_ unionAll _).orderBy("beta", "label")
  }

  private val cbOracle = """
    WITH counts AS MATERIALIZED (
      SELECT event_type AS label, COUNT(*) AS n FROM events GROUP BY 1),
    k AS (SELECT COUNT(*) AS k FROM counts),
    betas AS (SELECT CAST(unnest([0.9, 0.99, 0.999]) AS DOUBLE) AS beta),
    inv AS MATERIALIZED (
      SELECT b.beta, c.label, c.n,
        (CAST(1.0 AS DOUBLE) - b.beta)
          / (CAST(1.0 AS DOUBLE) - power(b.beta, CAST(c.n AS DOUBLE)))
          AS inv_en
      FROM counts c CROSS JOIN betas b),
    z AS (
      SELECT beta,
        CAST(SUM(CAST(inv_en AS DECIMAL(18,12))) AS DECIMAL(28,12)) AS z
      FROM inv GROUP BY 1)
    SELECT i.beta, i.label, i.n,
      ROUND(i.inv_en * k.k / CAST(z.z AS DOUBLE), 6) AS weight
    FROM inv i JOIN z ON z.beta = i.beta CROSS JOIN k
    ORDER BY i.beta, i.label"""

  // ---------------------------------------------------------------- q375

  /** Feature-hashing (hashing-trick) collision audit: the corpus
    * vocabulary hashed into d ∈ {64, 256, 1024} buckets with the
    * portable md5 fold; per dimension, buckets used, colliding
    * tokens, the collision rate and the max bucket load — the table
    * that picks a hash-feature width before training a linear model
    * on text. One vocabulary rollup (corpus touched once), then three
    * conditional aggregations over the token table.
    */
  def featureHashing(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("h", expr(
        "aggregate(transform(split(md5(cast(w as binary)), ''), " +
          "c -> cast(ascii(c) as bigint)), cast(-1 as bigint), " +
          "(h, a) -> if(h = -1L, a, pmod(h * 31 + a, 1000000007L)))"))
      .localCheckpoint()
    Seq(64, 256, 1024).map { d =>
      vocab.groupBy((col("h") % d).as("bucket"))
        .agg(count(lit(1)).as("nt"))
        .agg(sum("nt").as("distinct_tokens"),
          count(lit(1)).as("buckets_used"),
          max("nt").as("max_bucket_load"))
        .select(lit(d.toLong).as("dims"), col("distinct_tokens"),
          col("buckets_used"),
          (col("distinct_tokens") - col("buckets_used"))
            .as("colliding_tokens"),
          round((col("distinct_tokens") - col("buckets_used"))
            .cast("double") * 100.0 / col("distinct_tokens").cast("double"),
            3).as("collision_pct"),
          col("max_bucket_load"))
    }.reduce(_ unionAll _).orderBy("dims")
  }

  private val hashingOracle = """
    WITH vocab AS MATERIALIZED (
      SELECT w,
        list_reduce(list_transform(string_split_regex(md5(w), ''),
          c -> CAST(ascii(c) AS BIGINT)),
          (h, a) -> (h * 31 + a) % 1000000007) AS h
      FROM (
        SELECT w, COUNT(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY 1)),
    dims AS (SELECT unnest([64, 256, 1024]) AS d),
    per AS (
      SELECT d, h % d AS bucket, COUNT(*) AS nt
      FROM vocab CROSS JOIN dims GROUP BY 1, 2),
    agg AS (
      SELECT d, CAST(SUM(nt) AS BIGINT) AS distinct_tokens,
        COUNT(*) AS buckets_used, CAST(MAX(nt) AS BIGINT) AS max_bucket_load
      FROM per GROUP BY 1)
    SELECT CAST(d AS BIGINT) AS dims, distinct_tokens, buckets_used,
      distinct_tokens - buckets_used AS colliding_tokens,
      ROUND(CAST(distinct_tokens - buckets_used AS DOUBLE) * 100.0
        / CAST(distinct_tokens AS DOUBLE), 3) AS collision_pct,
      max_bucket_load
    FROM agg ORDER BY dims"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q375_feature_hashing",
      (s, d) => featureHashing(documents(s, d)), Some(hashingOracle)),
    Q("q377_position_bias",
      (s, d) => positionBias(events(s, d)), Some(positionOracle())),
    Q("q378_class_balance_weights",
      (s, d) => classBalanceWeights(events(s, d)), Some(cbOracle)),
  )
}
