package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SquaredL2.squared_l2

import graft.{Q, QueryModule}
import graft.Num.dec
import graft.Tables._

/** Cluster-quality and neighborhood diagnostics over the embedding
  * corpus, round 8 of the extension surface (the reference has no
  * embedding surface): simplified silhouette, Davies–Bouldin,
  * Calinski–Harabasz — the three standard internal cluster-validity
  * indices, here over the label partition — plus a hubness audit
  * (k-occurrence skew, the curse-of-dimensionality failure mode of
  * kNN retrieval) and the TwoNN intrinsic-dimension estimator (Facco
  * et al. 2017).
  *
  * Oracle-exactness discipline (graft-oracle-exactness): centroid
  * distances are per-dimension DECIMAL-cast sums (exact,
  * order-independent); the anchor-distance paths (hubness, TwoNN) use
  * VecDist.d2Fold — a pure-double fold in array (dim) order whose
  * DuckDB twin performs the bit-identical IEEE add sequence. Every
  * derived double is one fixed-shape expression; ties break by id. Scale discipline: each index is one or two corpus passes
  * against a BROADCAST side (k centroids or the 64-anchor budget —
  * absolute counts, never corpus fractions), the E-step shape of
  * distributed k-means.
  */
object ClusterQuality extends QueryModule {

  private def explodeDims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim0", "xv")))
      .select(col("vec_id"), col("label"), (col("dim0") + 1).as("dim"),
        col("xv").cast("double").as("xv"))

  /** Per-(label, dim) centroid means as exact-sum/count doubles. Raw
    * float32 elements sum on the exact 2^50 binary grid ([[graft.Num.bin50]])
    * — a plain scale-10 decimal cast ties on coarse dyadics (q308/sf1).
    */
  private def centroids(x: DataFrame): DataFrame =
    x.groupBy(col("label").as("clabel"), col("dim"))
      .agg(sum(graft.Num.bin50(col("xv"))).as("s1"), count(lit(1)).as("cn"))
      .select(col("clabel"), col("dim"),
        expr(graft.Num.bin50MeanSql("s1", "cn")).as("mu"), col("cn"))

  /** Exact-decimal squared distance of every vector to every label
    * centroid: the k-means E-step join (corpus×dims vs broadcast
    * k×dims).
    */
  private def vecToCentroid(x: DataFrame): DataFrame =
    x.join(broadcast(centroids(x)), Seq("dim"))
      .groupBy("vec_id", "label", "clabel")
      .agg(sum(dec((col("xv") - col("mu")) * (col("xv") - col("mu")), 9))
        .as("d2"))

  private val xSql = """
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS xv
      FROM embeddings"""

  private val centroidsSql = s"""
      SELECT clabel, dim, ${graft.Num.bin50MeanDuck("s1", "cn")} AS mu, cn
      FROM (
        SELECT label AS clabel, dim,
          SUM(CAST(xv * 1.125899906842624e15 AS HUGEINT)) AS s1,
          COUNT(*) AS cn
        FROM x GROUP BY 1, 2)"""

  private val vecToCentroidSql = """
      SELECT x.vec_id, x.label, c.clabel,
        SUM(CAST((x.xv - c.mu) * (x.xv - c.mu) AS DECIMAL(18,9))) AS d2
      FROM x JOIN cents c USING (dim)
      GROUP BY 1, 2, 3"""

  // ---------------------------------------------------------------- q306

  /** Simplified (centroid-based) silhouette per label cluster:
    * a = distance to own centroid, b = distance to the nearest other
    * centroid, s = (b−a)/max(a,b) — the O(N·k) silhouette used when the
    * O(N²) pairwise version is off the table, which at 100 TB is
    * always. Negative s marks vectors closer to a foreign centroid.
    */
  def silhouetteLite(emb: DataFrame): DataFrame = {
    val d = vecToCentroid(explodeDims(emb))
    val ab = d.groupBy("vec_id", "label").agg(
      min(when(col("label") === col("clabel"), col("d2"))).as("a2"),
      min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
    val s = ab
      .withColumn("s", expr(
        """(sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
          | / greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))"""
          .stripMargin))
    s.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(s AS DECIMAL(18,12))")).as("ssum"),
        sum((col("s") < 0).cast("long")).as("n_negative"))
      .select(col("label"), col("n_vecs"),
        round(col("ssum").cast("double") / col("n_vecs"), 6)
          .as("mean_silhouette"),
        col("n_negative"))
      .orderBy("label")
  }

  private val silhouetteOracle = s"""
    WITH x AS MATERIALIZED ($xSql),
    cents AS MATERIALIZED ($centroidsSql),
    d AS MATERIALIZED ($vecToCentroidSql),
    ab AS (
      SELECT vec_id, label,
        MIN(CASE WHEN label = clabel THEN d2 END) AS a2,
        MIN(CASE WHEN label <> clabel THEN d2 END) AS b2
      FROM d GROUP BY 1, 2),
    s AS (
      SELECT vec_id, label,
        (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
          / greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE))) AS s
      FROM ab)
    SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
      ROUND(CAST(SUM(CAST(s AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6)
        AS mean_silhouette,
      CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
    FROM s GROUP BY 1 ORDER BY label"""

  // ---------------------------------------------------------------- q307

  /** Davies–Bouldin decomposition per cluster: scatter S_i (mean member
    * distance to centroid), and R_i = max_{j≠i} (S_i+S_j)/M_ij over
    * centroid separations M_ij — the per-cluster view whose mean is the
    * DB index (lower = tighter, farther-apart clusters). Centroid pairs
    * are k², a broadcast-sized frame.
    */
  def daviesBouldin(emb: DataFrame): DataFrame = {
    val x = explodeDims(emb)
    val cents = centroids(x)
    val scatter = vecToCentroid(x)
      .filter(col("label") === col("clabel"))
      .groupBy(col("clabel"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(sqrt(CAST(d2 AS DOUBLE)) AS DECIMAL(18,9))")).as("sd"))
      .select(col("clabel"), col("n_vecs"),
        (col("sd").cast("double") / col("n_vecs")).as("s_i"))
    val cj = cents.select(col("clabel").as("ci"), col("dim"), col("mu").as("mi"))
      .join(cents.select(col("clabel").as("cj"), col("dim"), col("mu").as("mj")),
        "dim")
      .filter(col("ci") =!= col("cj"))
      .groupBy("ci", "cj")
      .agg(sum(dec((col("mi") - col("mj")) * (col("mi") - col("mj")), 9))
        .as("m2"))
    val ratios = cj
      .join(scatter.select(col("clabel").as("ci"), col("s_i")), "ci")
      .join(scatter.select(col("clabel").as("cj"), col("s_i").as("s_j")), "cj")
      .withColumn("r", expr("(s_i + s_j) / sqrt(CAST(m2 AS DOUBLE))"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("ci").orderBy(col("r").desc, col("cj"))))
      .filter(col("rnk") === 1)
    ratios
      .join(scatter.select(col("clabel").as("ci"), col("n_vecs")), "ci")
      .select(col("ci").cast("long").as("label"), col("n_vecs"),
        round(col("s_i"), 6).as("scatter"),
        col("cj").cast("long").as("nearest_worst"),
        round(col("r"), 6).as("r_i"))
      .orderBy("label")
  }

  private val dbOracle = s"""
    WITH x AS MATERIALIZED ($xSql),
    cents AS MATERIALIZED ($centroidsSql),
    d AS MATERIALIZED ($vecToCentroidSql),
    scatter AS (
      SELECT clabel, COUNT(*) AS n_vecs,
        CAST(SUM(CAST(sqrt(CAST(d2 AS DOUBLE)) AS DECIMAL(18,9))) AS DOUBLE)
          / COUNT(*) AS s_i
      FROM d WHERE label = clabel GROUP BY 1),
    cj AS (
      SELECT a.clabel AS ci, b.clabel AS cj,
        SUM(CAST((a.mu - b.mu) * (a.mu - b.mu) AS DECIMAL(18,9))) AS m2
      FROM cents a JOIN cents b USING (dim)
      WHERE a.clabel <> b.clabel
      GROUP BY 1, 2),
    ratios AS (
      SELECT ci, cj,
        (si.s_i + sj.s_i) / sqrt(CAST(m2 AS DOUBLE)) AS r,
        si.s_i AS s_i,
        ROW_NUMBER() OVER (PARTITION BY ci
          ORDER BY (si.s_i + sj.s_i) / sqrt(CAST(m2 AS DOUBLE)) DESC, cj) AS rnk
      FROM cj
      JOIN scatter si ON si.clabel = ci
      JOIN scatter sj ON sj.clabel = cj)
    SELECT CAST(ci AS BIGINT) AS label, sc.n_vecs,
      ROUND(r.s_i, 6) AS scatter,
      CAST(cj AS BIGINT) AS nearest_worst, ROUND(r.r, 6) AS r_i
    FROM ratios r JOIN scatter sc ON sc.clabel = r.ci
    WHERE rnk = 1 ORDER BY label"""

  // ---------------------------------------------------------------- q308

  /** Calinski–Harabasz (variance-ratio) index over the label partition:
    * CH = [SSB/(k−1)] / [SSW/(N−k)], with SSW the exact-decimal member
    * scatter and SSB the centroid-to-grand-centroid scatter weighted by
    * cluster size. Two passes: one per-dim moment reduce, one E-step
    * join.
    */
  def calinskiHarabasz(emb: DataFrame): DataFrame = {
    val x = explodeDims(emb)
    val ssw = vecToCentroid(x)
      .filter(col("label") === col("clabel"))
      .agg(sum("d2").as("ssw"), count(lit(1)).as("n_vecs"))
    val cents = centroids(x)
    val grand = x.groupBy("dim")
      .agg(sum(graft.Num.bin50(col("xv"))).as("gs"), count(lit(1)).as("gn"))
      .select(col("dim"), expr(graft.Num.bin50MeanSql("gs", "gn")).as("gmu"))
    val ssb = cents.join(broadcast(grand), "dim")
      .groupBy("clabel", "cn")
      .agg(sum(dec((col("mu") - col("gmu")) * (col("mu") - col("gmu")), 9))
        .as("cd2"))
      // type the product so Spark keeps scale 9: a LONG×DECIMAL(38,9)
      // product exceeds precision 38 and the precision-loss rule trims
      // to scale 6 — which rounded ssb onto an artificial .5 display
      // tie at sf1 (9.67164996 → 9.671650 → HALF_UP → 9.6717)
      .agg(sum(col("cn").cast("decimal(10,0)")
          * col("cd2").cast("decimal(18,9)")).as("ssb"),
        count(lit(1)).as("k"))
    // The index itself is an exact integer ppm quotient (the q250
    // discipline): a rounded double ratio landed exactly on a 0.5e-6
    // rounding tie at sf0.001, where Spark and DuckDB round-on-double
    // disagree — integer division cannot.
    // display rounding happens in DECIMAL space (HALF_UP on both
    // engines): ROUND(double, 4) of an exact scale-9 decimal lands on a
    // .5 tie whenever the fraction ends in ...5000, where Spark and
    // DuckDB round binary doubles to opposite sides (seen at sf1)
    ssw.crossJoin(broadcast(ssb))
      .select(col("n_vecs"), col("k"),
        col("ssw").cast("decimal(38,4)").cast("double").as("ssw"),
        col("ssb").cast("decimal(38,4)").cast("double").as("ssb"),
        expr("""CAST((CAST(CAST(ssb AS DECIMAL(28,9)) * 1000000000 AS DECIMAL(38,0))
               |      * (n_vecs - k) * 1000000)
               | DIV (CAST(CAST(ssw AS DECIMAL(28,9)) * 1000000000 AS DECIMAL(38,0))
               |      * (k - 1)) AS BIGINT)""".stripMargin).as("ch_index_ppm"))
  }

  private val chOracle = s"""
    WITH x AS MATERIALIZED ($xSql),
    cents AS MATERIALIZED ($centroidsSql),
    d AS MATERIALIZED ($vecToCentroidSql),
    ssw AS (
      SELECT SUM(d2) AS ssw, COUNT(*) AS n_vecs
      FROM d WHERE label = clabel),
    grand AS (
      SELECT dim, ${graft.Num.bin50MeanDuck("gs", "gn")} AS gmu FROM (
        SELECT dim, SUM(CAST(xv * 1.125899906842624e15 AS HUGEINT)) AS gs,
          COUNT(*) AS gn
        FROM x GROUP BY 1)),
    ssb AS (
      SELECT SUM(cn * cd2) AS ssb, COUNT(*) AS k FROM (
        SELECT c.clabel, MAX(c.cn) AS cn,
          SUM(CAST((c.mu - g.gmu) * (c.mu - g.gmu) AS DECIMAL(18,9))) AS cd2
        FROM cents c JOIN grand g USING (dim)
        GROUP BY 1))
    SELECT n_vecs, k,
      CAST(ROUND(ssw, 4) AS DOUBLE) AS ssw,
      CAST(ROUND(ssb, 4) AS DOUBLE) AS ssb,
      CAST(CAST(CAST(ssb AS DECIMAL(28,9)) * 1000000000 AS HUGEINT)
             * (n_vecs - k) * 1000000
           // (CAST(CAST(ssw AS DECIMAL(28,9)) * 1000000000 AS HUGEINT)
              * (k - 1)) AS BIGINT)
        AS ch_index_ppm
    FROM ssw, ssb"""

  // ---------------------------------------------------------------- q309

  /** Hubness audit: with the md5-ordered 64-anchor budget (the q290
    * absolute-count convention), every corpus vector votes for its 3
    * nearest anchors; the per-anchor k-occurrence distribution exposes
    * hubs (anchors that appear in everyone's neighbor lists) and
    * anti-hubs (k_occ = 0) — the high-dimensional pathology that skews
    * kNN-based dedup and retrieval. One corpus pass against the
    * broadcast anchors.
    */
  def hubness(emb: DataFrame, nAnchors: Int = 64, k: Int = 3): DataFrame = {
    val anchorIds = emb
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nAnchors)
      .select(col("vec_id").as("aid"))
    val anchors = emb.join(broadcast(anchorIds), col("vec_id") === col("aid"))
      .select(col("aid"), col("label").as("alabel"),
        col("embedding").as("aemb"))
    // one corpus pass × broadcast anchor ARRAYS (VecDist fold — no
    // dims-explode, no corpus×anchors×dims aggregation shuffle)
    val d2 = emb.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("aid"))
      .select(col("vec_id"), col("aid"),
        squared_l2(col("embedding"), col("aemb")).as("d2"))
    val votes = d2
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("aid"))))
      .filter(col("rn") <= k)
      .groupBy("aid").agg(count(lit(1)).as("k_occ"))
    anchors.select("aid", "alabel").distinct()
      .join(votes, Seq("aid"), "left")
      .withColumn("k_occ", coalesce(col("k_occ"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("k_occ").desc, col("aid"))))
      .select(col("rank").cast("long").as("rank"), col("aid"),
        col("alabel").cast("long").as("label"), col("k_occ"))
      .orderBy("rank")
  }

  // list_zip whole-array folds (same dim-order double arithmetic) — the
  // per-dim x JOIN anchors explode blew the checker's DuckDB budget at
  // sf1 (|vecs|*dims*anchors rows plus list() buffers); see tripletOracle
  private val hubnessOracle = s"""
    WITH anchor_ids AS (
      SELECT vec_id AS aid FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64),
    anchors AS MATERIALIZED (
      SELECT e.vec_id AS aid, e.label AS alabel, e.embedding AS aemb
      FROM embeddings e JOIN anchor_ids a ON e.vec_id = a.aid),
    d2 AS (
      SELECT x.vec_id, a.aid,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list_zip(x.embedding, a.aemb),
            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
          (acc, v) -> acc + v) AS d2
      FROM embeddings x JOIN anchors a ON x.vec_id <> a.aid),
    votes AS (
      SELECT aid, COUNT(*) AS k_occ FROM (
        SELECT vec_id, aid,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, aid) AS rn
        FROM d2)
      WHERE rn <= 3 GROUP BY 1),
    base AS (SELECT DISTINCT aid, alabel FROM anchors)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY COALESCE(k_occ, 0) DESC, aid)
        AS BIGINT) AS rank,
      aid, CAST(alabel AS BIGINT) AS label,
      CAST(COALESCE(k_occ, 0) AS BIGINT) AS k_occ
    FROM base LEFT JOIN votes USING (aid)
    ORDER BY rank"""

  // ---------------------------------------------------------------- q310

  /** TwoNN intrinsic-dimension estimate (Facco et al. 2017): for each
    * of the 64 md5-budget anchors, the ratio μ = d₂/d₁ of its two
    * nearest corpus neighbors gives ln μ; the MLE intrinsic dimension
    * is n/Σln μ — the curse-of-dimensionality measurement that says how
    * "thin" the embedding manifold really is versus its 64 ambient
    * dims. Zero distances (exact duplicates) are excluded exactly —
    * distances are exact decimals, so the d₁ > 0 guard cannot flicker.
    */
  def twonnDimension(emb: DataFrame, nAnchors: Int = 64): DataFrame = {
    val anchorIds = emb
      .select(col("vec_id"),
        md5(col("vec_id").cast("string").cast("binary")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nAnchors)
      .select(col("vec_id").as("aid"))
    val anchors = emb.join(broadcast(anchorIds), col("vec_id") === col("aid"))
      .select(col("aid"), col("embedding").as("aemb"))
    // one corpus pass × broadcast anchor ARRAYS (VecDist fold)
    val d2 = emb.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("aid"))
      .select(col("aid"), col("vec_id"),
        squared_l2(col("embedding"), col("aemb")).as("d2"))
      .filter(col("d2") > 0)
    val nn = d2
      .withColumn("rn", row_number().over(
        Window.partitionBy("aid").orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 2)
      .groupBy("aid")
      .agg(min(when(col("rn") === 1, col("d2"))).as("d1"),
        min(when(col("rn") === 2, col("d2"))).as("d2nd"))
      .filter(col("d1").isNotNull && col("d2nd").isNotNull)
      .withColumn("logmu", expr(
        "CAST(0.5 * ln(CAST(d2nd AS DOUBLE) / CAST(d1 AS DOUBLE)) AS DECIMAL(18,12))"))
    nn.agg(count(lit(1)).as("n_anchors"),
        sum("logmu").cast("double").as("sum_log_mu"))
      .select(col("n_anchors"),
        round(col("sum_log_mu"), 6).as("sum_log_mu"),
        round(col("n_anchors").cast("double") / col("sum_log_mu"), 4)
          .as("id_twonn"))
  }

  // list_zip whole-array folds — same rationale as hubnessOracle
  private val twonnOracle = s"""
    WITH anchor_ids AS (
      SELECT vec_id AS aid FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64),
    anchors AS MATERIALIZED (
      SELECT e.vec_id AS aid, e.embedding AS aemb
      FROM embeddings e JOIN anchor_ids a ON e.vec_id = a.aid),
    d2 AS (
      SELECT a.aid, x.vec_id,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list_zip(x.embedding, a.aemb),
            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
          (acc, v) -> acc + v) AS d2
      FROM embeddings x JOIN anchors a ON x.vec_id <> a.aid),
    nn AS (
      SELECT aid,
        MIN(CASE WHEN rn = 1 THEN d2 END) AS d1,
        MIN(CASE WHEN rn = 2 THEN d2 END) AS d2nd
      FROM (
        SELECT aid, vec_id, d2,
          ROW_NUMBER() OVER (PARTITION BY aid ORDER BY d2, vec_id) AS rn
        FROM d2 WHERE d2 > 0)
      GROUP BY 1
      HAVING MIN(CASE WHEN rn = 1 THEN d2 END) IS NOT NULL
         AND MIN(CASE WHEN rn = 2 THEN d2 END) IS NOT NULL),
    lm AS (
      SELECT aid,
        CAST(0.5 * ln(CAST(d2nd AS DOUBLE) / CAST(d1 AS DOUBLE))
          AS DECIMAL(18,12)) AS logmu
      FROM nn)
    SELECT COUNT(*) AS n_anchors,
      ROUND(CAST(SUM(logmu) AS DOUBLE), 6) AS sum_log_mu,
      ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(logmu) AS DOUBLE), 4) AS id_twonn
    FROM lm"""

  // ------------------------------------------------------------ queries

  // ---------------------------------------------------------------- q338

  /** Semi-supervised label spreading over the sign-LSH bucket graph
    * (the q269 family): vec_id % 17 keeps its true label as a seed;
    * round 1 assigns each unlabeled vector the majority seed label of
    * its own bucket; round 2 covers seedless buckets from the majority
    * over their 8 Hamming-1 neighbor buckets. Ties break to the
    * smallest label — fully deterministic. The report scores the
    * propagation against the held-out truth per true label. Scale:
    * bucket→label histograms are 2^bits·|labels| rows; the corpus is
    * scanned twice and never self-joined.
    */
  def labelSpreading(emb: DataFrame): DataFrame = {
    val bucketExpr = (0 until 8).map(i =>
      (element_at(col("embedding"), i + 1) >= 0f).cast("int") * lit(1 << i))
      .reduce(_ + _)
    val b = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      bucketExpr.as("bucket"),
      (col("vec_id") % 17 === 0).cast("int").as("is_seed"))
    val seedHist = b.filter(col("is_seed") === 1)
      .groupBy("bucket", "label").agg(count(lit(1)).as("c"))
      .localCheckpoint() // <= 2^8 * |labels| rows; feeds r1 + r2
    val w = Window.partitionBy("bucket")
      .orderBy(col("c").desc, col("label").asc)
    val r1 = seedHist.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("bucket"), col("label").as("pred1"))
    val nbr = seedHist
      .select(explode(expr(
        "transform(sequence(0, 7), k -> cast(bucket as int) ^ shiftleft(1, k))"))
        .as("nb"), col("label"), col("c"))
      .groupBy(col("nb").as("bucket"), col("label"))
      .agg(sum("c").as("c"))
    val w2 = Window.partitionBy("bucket")
      .orderBy(col("c").desc, col("label").asc)
    val r2 = nbr.withColumn("rn", row_number().over(w2))
      .filter(col("rn") === 1).select(col("bucket"), col("label").as("pred2"))
    b.join(broadcast(r1), Seq("bucket"), "left")
      .join(broadcast(r2), Seq("bucket"), "left")
      .withColumn("pred", when(col("is_seed") === 1, col("label"))
        .otherwise(coalesce(col("pred1"), col("pred2"))))
      .withColumn("round", when(col("is_seed") === 1, lit(0))
        .when(col("pred1").isNotNull, lit(1))
        .when(col("pred2").isNotNull, lit(2)).otherwise(lit(-1)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum("is_seed").cast("long").as("n_seeds"),
        sum((col("round") === 1).cast("long")).as("n_r1"),
        sum((col("round") === 2).cast("long")).as("n_r2"),
        sum(col("pred").isNull.cast("long")).as("n_unassigned"),
        sum((col("pred") === col("label")).cast("long")).as("n_correct"))
      .withColumn("acc_ppm", expr(
        "n_correct * 1000000 DIV (n_vecs - n_unassigned)"))
      .orderBy("label")
  }

  private val spreadingOracle = """
    WITH b AS MATERIALIZED (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
        CAST(embedding[1] >= 0 AS INT) * 1 + CAST(embedding[2] >= 0 AS INT) * 2
        + CAST(embedding[3] >= 0 AS INT) * 4 + CAST(embedding[4] >= 0 AS INT) * 8
        + CAST(embedding[5] >= 0 AS INT) * 16 + CAST(embedding[6] >= 0 AS INT) * 32
        + CAST(embedding[7] >= 0 AS INT) * 64 + CAST(embedding[8] >= 0 AS INT) * 128
          AS bucket,
        CAST(vec_id % 17 = 0 AS INT) AS is_seed
      FROM embeddings),
    hist AS MATERIALIZED (
      SELECT bucket, label, COUNT(*) AS c FROM b WHERE is_seed = 1
      GROUP BY 1, 2),
    r1 AS (
      SELECT bucket, label AS pred1 FROM (
        SELECT bucket, label,
          ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY c DESC, label) AS rn
        FROM hist) WHERE rn = 1),
    nbr AS (
      SELECT xor(h.bucket, 1 << k.k) AS bucket, h.label, SUM(h.c) AS c
      FROM hist h, (SELECT UNNEST(generate_series(0, 7)) AS k) k
      GROUP BY 1, 2),
    r2 AS (
      SELECT bucket, label AS pred2 FROM (
        SELECT bucket, label,
          ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY c DESC, label) AS rn
        FROM nbr) WHERE rn = 1),
    scored AS (
      SELECT b.label, b.is_seed,
        CASE WHEN b.is_seed = 1 THEN b.label
             ELSE COALESCE(r1.pred1, r2.pred2) END AS pred,
        CASE WHEN b.is_seed = 1 THEN 0
             WHEN r1.pred1 IS NOT NULL THEN 1
             WHEN r2.pred2 IS NOT NULL THEN 2 ELSE -1 END AS round
      FROM b LEFT JOIN r1 ON b.bucket = r1.bucket
             LEFT JOIN r2 ON b.bucket = r2.bucket)
    SELECT label, COUNT(*) AS n_vecs,
      CAST(SUM(is_seed) AS BIGINT) AS n_seeds,
      CAST(SUM(CASE WHEN round = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_r1,
      CAST(SUM(CASE WHEN round = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_r2,
      CAST(SUM(CASE WHEN pred IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_unassigned,
      CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
        AS n_correct,
      CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) * 1000000
        // (COUNT(*) - SUM(CASE WHEN pred IS NULL THEN 1 ELSE 0 END))
        AS BIGINT) AS acc_ppm
    FROM scored GROUP BY label ORDER BY label"""

  override def queries: Seq[Q] = Seq(
    Q("q338_label_spreading",
      (s, d) => labelSpreading(embeddings(s, d)), Some(spreadingOracle)),
    Q("q306_silhouette_lite",
      (s, d) => silhouetteLite(embeddings(s, d)), Some(silhouetteOracle)),
    Q("q307_davies_bouldin",
      (s, d) => daviesBouldin(embeddings(s, d)), Some(dbOracle)),
    Q("q308_calinski_harabasz",
      (s, d) => calinskiHarabasz(embeddings(s, d)), Some(chOracle)),
    Q("q309_hubness", (s, d) => hubness(embeddings(s, d)), Some(hubnessOracle)),
    Q("q310_twonn_dimension",
      (s, d) => twonnDimension(embeddings(s, d)), Some(twonnOracle)),
  )
}
