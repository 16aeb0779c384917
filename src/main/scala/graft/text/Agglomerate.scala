package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._
import graft.Num.dec

/** Corpus-structure comparison operators (SURVEY.md §2.9 extension
  * surface): single-linkage agglomeration of label centroids in
  * embedding space and Burrows' Delta stylometric distance between
  * sources. Both reduce the corpus to a dimension-bounded frame in one
  * pass (centroids / word-frequency profiles) and run the comparison on
  * that frame — the only shape that survives 100 TB. The reference has
  * neither.
  *
  * Oracle-exactness discipline (graft-oracle-exactness): centroid
  * distances and z-score deltas accumulate exact decimals of identical
  * double operands; merge decisions and rankings compare those decimals
  * with pinned tie-breaks.
  */
object Agglomerate extends QueryModule {

  // ---------------------------------------------------------------- q285

  /** Three rounds of single-linkage agglomerative clustering over the
    * label centroids of the embedding corpus: centroids from one exact
    * moment pass, the 45-pair squared-distance matrix as exact decimals,
    * then greedy minimum-distance merges (cluster = min member label;
    * ties by label pair). The merge loop runs on the collected
    * |labels|²/2 matrix — dimension-bounded driver state, like q35's
    * sampleBy fraction map — while the corpus contributes exactly one
    * grouped pass.
    */
  def centroidLinkage(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    // raw-xv sum on the exact 2^50 grid (graft.Num.bin50: a scale-10
    // decimal cast ties on coarse float32 dyadics, the q308/sf1 hazard)
    val cent = emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "xv")))
      .groupBy("label", "dim")
      .agg(sum(graft.Num.bin50(col("xv").cast("double"))).as("cs"),
        count(lit(1)).as("cm"))
      .select(col("label"), col("dim"),
        expr(graft.Num.bin50MeanSql("cs", "cm")).as("c"))
    val m = cent.as("x").join(cent.as("y"),
        col("x.dim") === col("y.dim") && col("x.label") < col("y.label"))
      .groupBy(col("x.label").as("a"), col("y.label").as("b"))
      .agg(sum(dec((col("x.c") - col("y.c")) * (col("x.c") - col("y.c")), 10))
        .as("d2"))
      .collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong,
        r.getDecimal(2)))

    // greedy single-linkage on the tiny matrix; cluster id = min member
    var clusterOf = m.flatMap(t => Seq(t._1, t._2)).distinct
      .map(l => l -> l).toMap
    val merges = Seq.newBuilder[(Long, Long, Long, java.math.BigDecimal, Long)]
    for (step <- 1L to 3L) {
      val cand = m.iterator
        .map { case (a, b, d) => (clusterOf(a), clusterOf(b), d) }
        .filter { case (ca, cb, _) => ca != cb }
        .map { case (ca, cb, d) => (math.min(ca, cb), math.max(ca, cb), d) }
        .toSeq
        .groupBy(t => (t._1, t._2))
        .map { case ((ca, cb), ts) => (ca, cb, ts.map(_._3).min) }
        .toSeq
        .sortBy { case (ca, cb, d) => (d, ca, cb) }
      val (ca, cb, d) = cand.head
      clusterOf = clusterOf.map { case (l, c) => l -> (if (c == cb) ca else c) }
      merges += ((step, ca, cb, d, clusterOf.values.toSet.size.toLong))
    }
    merges.result()
      .map { case (s, a, b, d, k) => (s, a, b, d.doubleValue(), k) }
      .toDF("step", "cluster_a", "cluster_b", "d2raw", "n_clusters_after")
      .select(col("step"), col("cluster_a"), col("cluster_b"),
        round(col("d2raw"), 6).as("link_d2"), col("n_clusters_after"))
      .orderBy("step")
  }

  private val linkageOracle = s"""
    WITH x AS MATERIALIZED (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS xv
      FROM embeddings),
    cent AS MATERIALIZED (
      SELECT label, dim, ${graft.Num.bin50MeanDuck("cs", "cm")} AS c FROM (
        SELECT label, dim,
          SUM(CAST(xv * 1.125899906842624e15 AS HUGEINT)) AS cs,
          COUNT(*) AS cm
        FROM x GROUP BY 1, 2)),
    m AS MATERIALIZED (
      SELECT CAST(a.label AS BIGINT) AS a, CAST(b.label AS BIGINT) AS b,
        SUM(CAST((a.c - b.c) * (a.c - b.c) AS DECIMAL(18,10))) AS d2
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2),
    s1 AS MATERIALIZED (
      SELECT a, b, d2 FROM m ORDER BY d2, a, b LIMIT 1),
    -- after merge 1 cluster(x) = a1 if x = b1 else x
    m2 AS MATERIALIZED (
      SELECT LEAST(ca, cb) AS a, GREATEST(ca, cb) AS b, MIN(d2) AS d2 FROM (
        SELECT CASE WHEN m.a = s1.b THEN s1.a ELSE m.a END AS ca,
          CASE WHEN m.b = s1.b THEN s1.a ELSE m.b END AS cb, m.d2
        FROM m CROSS JOIN s1)
      WHERE ca <> cb GROUP BY 1, 2),
    s2 AS MATERIALIZED (
      SELECT a, b, d2 FROM m2 ORDER BY d2, a, b LIMIT 1),
    m3 AS MATERIALIZED (
      SELECT LEAST(ca, cb) AS a, GREATEST(ca, cb) AS b, MIN(d2) AS d2 FROM (
        SELECT CASE WHEN m2.a = s2.b THEN s2.a ELSE m2.a END AS ca,
          CASE WHEN m2.b = s2.b THEN s2.a ELSE m2.b END AS cb, m2.d2
        FROM m2 CROSS JOIN s2)
      WHERE ca <> cb GROUP BY 1, 2),
    s3 AS (
      SELECT a, b, d2 FROM m3 ORDER BY d2, a, b LIMIT 1),
    nl AS (SELECT COUNT(DISTINCT label) AS n0 FROM x),
    out AS (
      SELECT 1 AS step, s1.a AS cluster_a, s1.b AS cluster_b,
        CAST(s1.d2 AS DOUBLE) AS d2raw, n0 - 1 AS k FROM s1 CROSS JOIN nl
      UNION ALL SELECT 2, s2.a, s2.b, CAST(s2.d2 AS DOUBLE), n0 - 2
        FROM s2 CROSS JOIN nl
      UNION ALL SELECT 3, s3.a, s3.b, CAST(s3.d2 AS DOUBLE), n0 - 3
        FROM s3 CROSS JOIN nl)
    SELECT CAST(step AS BIGINT) AS step, cluster_a, cluster_b,
      ROUND(d2raw, 6) AS link_d2, CAST(k AS BIGINT) AS n_clusters_after
    FROM out ORDER BY step"""

  // ---------------------------------------------------------------- q286

  /** Burrows' Delta stylometric distance between sources: per-source
    * relative frequencies (per mille) of the corpus's top-30 words,
    * z-scored per word across sources, Delta(a,b) = mean |z_a - z_b|.
    * The corpus reduces to a |sources|×30 profile in one token pass;
    * the 190-pair comparison accumulates 1e-9-rounded decimals so the
    * top-10 most stylistically similar pairs rank identically in both
    * engines. The classic authorship-attribution screen, repurposed as
    * a source-similarity audit.
    */
  def burrowsDelta(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(filter(split(col("text"), " "), t => t =!= lit(""))).as("w"))
    val bySrcWord = toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint() // reused: totals, top-word pick, profiles
    val totals = bySrcWord.groupBy("source").agg(sum("c").as("n"))
    val top = bySrcWord.groupBy("w").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("w")).limit(30)
      .select(col("w"))
    val f = bySrcWord.join(broadcast(top), "w").join(totals, "source")
      .select(col("source"), col("w"),
        (col("c").cast("double") * 1000.0 / col("n")).as("f"))
    val stats = f.groupBy("w").agg(
        count(lit(1)).as("ns"),
        sum(dec(col("f"), 9)).as("s1"),
        sum(dec(col("f") * col("f"), 9)).as("s2"))
      .select(col("w"),
        (col("s1").cast("double") / col("ns")).as("mu"),
        sqrt(col("s2").cast("double") / col("ns")
          - (col("s1").cast("double") / col("ns"))
            * (col("s1").cast("double") / col("ns"))).as("sd"))
    val z = f.join(broadcast(stats), "w")
      .select(col("source"), col("w"),
        ((col("f") - col("mu")) / col("sd")).as("z"))
    val pairs = z.as("a").join(z.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg((sum(dec(abs(col("a.z") - col("b.z")), 9)).cast("double")
        / count(lit(1))).as("delta_raw"),
        count(lit(1)).as("n_words"))
    pairs
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("delta_raw"), col("src_a"), col("src_b"))))
      .filter(col("rnk") <= 10)
      .select(col("rnk").cast("long").as("rank"), col("src_a"), col("src_b"),
        round(col("delta_raw"), 6).as("delta"), col("n_words"))
      .orderBy("rank")
  }

  private val burrowsOracle = """
    WITH toks AS (
      SELECT source,
        unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
      FROM documents),
    bsw AS MATERIALIZED (
      SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    totals AS (SELECT source, SUM(c) AS n FROM bsw GROUP BY 1),
    top AS (
      SELECT w FROM (SELECT w, SUM(c) AS ct FROM bsw GROUP BY 1)
      ORDER BY ct DESC, w LIMIT 30),
    f AS MATERIALIZED (
      SELECT b.source, b.w, CAST(b.c AS DOUBLE) * 1000.0 / t.n AS f
      FROM bsw b JOIN top USING (w) JOIN totals t ON b.source = t.source),
    stats AS (
      SELECT w, CAST(SUM(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mu,
        SQRT(CAST(SUM(CAST(f * f AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
          - (CAST(SUM(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*))
            * (CAST(SUM(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)))
          AS sd
      FROM f GROUP BY 1),
    z AS MATERIALIZED (
      SELECT f.source, f.w, (f.f - s.mu) / s.sd AS z
      FROM f JOIN stats s USING (w)),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
        CAST(SUM(CAST(ABS(a.z - b.z) AS DECIMAL(18,9))) AS DOUBLE)
          / COUNT(*) AS delta_raw,
        COUNT(*) AS n_words
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2),
    ranked AS (
      SELECT src_a, src_b, delta_raw, n_words,
        ROW_NUMBER() OVER (ORDER BY delta_raw, src_a, src_b) AS rnk
      FROM pairs)
    SELECT CAST(rnk AS BIGINT) AS rank, src_a, src_b,
      ROUND(delta_raw, 6) AS delta, n_words
    FROM ranked WHERE rnk <= 10 ORDER BY rank"""

  // ------------------------------------------------------------ queries

  override def queries: Seq[Q] = Seq(
    Q("q285_centroid_linkage",
      (s, d) => centroidLinkage(s, embeddings(s, d)), Some(linkageOracle)),
    Q("q286_burrows_delta",
      (s, d) => burrowsDelta(documents(s, d)), Some(burrowsOracle)),
  )
}
