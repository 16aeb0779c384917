package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num.dec
import graft.Tables._

/** Corpus-comparison statistics for training-data curation (SURVEY.md
  * §2.9 extension surface): Dunning log-likelihood keyness between a
  * target slice and the rest of the corpus, PMI collocation mining,
  * frequency-spectrum lexical richness (Yule's K / Simpson's D),
  * inter-rater agreement (Cohen's kappa) between two deterministic
  * labeling rules, and DSIR-style importance weights from hashed-free
  * char-bigram features. None exist in the reference (its text surface
  * is the filename-parsing expressions, `02_Data Ingest.py:95-99`).
  *
  * Shared scale discipline:
  *  - token/bigram phases are postings-shaped: one explode + one
  *    group-keyed shuffle whose width is the vocabulary, not the
  *    corpus; corpus-wide scalars travel as one-row broadcasts;
  *  - every statistic derives from exact integer counts (or exact
  *    decimal sums of 6-decimal log-ratios), so results are
  *    independent of partition/merge order and bit-identical across
  *    engines;
  *  - top-k outputs rank on the RAW double (identical in both
  *    engines) with full lexicographic tiebreaks, so the LIMIT
  *    boundary is deterministic.
  */
object CorpusStats extends QueryModule {

  /** Dunning (1993) log-likelihood keyness of each token between the
    * English slice and the rest of the corpus: G² = 2·Σᵢ kᵢ·ln(kᵢ/Eᵢ)
    * with Eᵢ = nᵢ(k₁+k₂)/(n₁+n₂). Counts are exact integers; G² is one
    * fixed-shape double expression over them.
    */
  def llrKeyness(docs: DataFrame): DataFrame = {
    val toks = docs.select((col("lang") === "en").as("t"),
      explode(split(col("text"), " ")).as("token"))
    val counts = toks.groupBy("token").agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("k1"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("k2"))
    val tot = counts.agg(sum("k1").as("n1"), sum("k2").as("n2"))
    counts.filter(col("k1") + col("k2") >= 10)
      .crossJoin(broadcast(tot))
      .withColumn("g2raw", expr(
        """2.0 * (
          |  CASE WHEN k1 > 0 THEN CAST(k1 AS DOUBLE) * ln(CAST(k1 AS DOUBLE) /
          |    ((CAST(n1 AS DOUBLE) * CAST(k1 + k2 AS DOUBLE)) / CAST(n1 + n2 AS DOUBLE))) ELSE 0.0 END +
          |  CASE WHEN k2 > 0 THEN CAST(k2 AS DOUBLE) * ln(CAST(k2 AS DOUBLE) /
          |    ((CAST(n2 AS DOUBLE) * CAST(k1 + k2 AS DOUBLE)) / CAST(n1 + n2 AS DOUBLE))) ELSE 0.0 END)""".stripMargin))
      .withColumn("leans",
        when(col("k1").cast("double") * col("n2").cast("double") >
          col("k2").cast("double") * col("n1").cast("double"), lit("en"))
          .otherwise(lit("other")))
      .orderBy(col("g2raw").desc, col("token").asc)
      .limit(25)
      .select(col("token"), col("k1"), col("k2"), col("leans"),
        round(col("g2raw"), 6).as("g2"))
  }

  private val llrOracle = """
    WITH toks AS (
      SELECT lang = 'en' AS t, unnest(string_split(text, ' ')) AS token
      FROM documents),
    counts AS (
      SELECT token,
        CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS k2
      FROM toks GROUP BY 1),
    tot AS (SELECT CAST(SUM(k1) AS BIGINT) AS n1, CAST(SUM(k2) AS BIGINT) AS n2 FROM counts),
    g AS (
      SELECT token, k1, k2,
        2.0 * (
          CASE WHEN k1 > 0 THEN CAST(k1 AS DOUBLE) * ln(CAST(k1 AS DOUBLE) /
            ((CAST(n1 AS DOUBLE) * CAST(k1 + k2 AS DOUBLE)) / CAST(n1 + n2 AS DOUBLE))) ELSE 0.0 END +
          CASE WHEN k2 > 0 THEN CAST(k2 AS DOUBLE) * ln(CAST(k2 AS DOUBLE) /
            ((CAST(n2 AS DOUBLE) * CAST(k1 + k2 AS DOUBLE)) / CAST(n1 + n2 AS DOUBLE))) ELSE 0.0 END) AS g2raw,
        CASE WHEN CAST(k1 AS DOUBLE) * CAST(n2 AS DOUBLE) >
                  CAST(k2 AS DOUBLE) * CAST(n1 AS DOUBLE)
             THEN 'en' ELSE 'other' END AS leans
      FROM counts, tot
      WHERE k1 + k2 >= 10)
    SELECT token, k1, k2, leans, ROUND(g2raw, 6) AS g2
    FROM g ORDER BY g2raw DESC, token LIMIT 25"""

  /** PMI collocations: pointwise mutual information of adjacent token
    * pairs, ln(c_xy·Nu²/(Nb·c_x·c_y)), over exact bigram/unigram
    * counts. The pair phase is an in-array transform (no self-join);
    * candidate pairs (count ≥ 5) join the unigram table on its key.
    */
  def pmiCollocations(docs: DataFrame): DataFrame = {
    val arr = docs.select(split(col("text"), " ").as("a")).filter(size(col("a")) >= 2)
    val uni = arr.select(explode(col("a")).as("w")).groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum("c").as("n_uni"))
    val bc = arr.select(expr(
        "explode(transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2)))").as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
    val nb = bc.agg(sum("cxy").as("n_big"))
    bc.filter(col("cxy") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("pmiraw", expr(
        """ln(((CAST(cxy AS DOUBLE) * CAST(n_uni AS DOUBLE)) * CAST(n_uni AS DOUBLE)) /
          |   ((CAST(n_big AS DOUBLE) * CAST(cx AS DOUBLE)) * CAST(cy AS DOUBLE)))""".stripMargin))
      .orderBy(col("pmiraw").desc, col("w1").asc, col("w2").asc)
      .limit(25)
      .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
        round(col("pmiraw"), 6).as("pmi"))
  }

  private val pmiOracle = """
    WITH d AS (
      SELECT string_split(text, ' ') AS a FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    uc AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(a) AS w FROM d) GROUP BY 1),
    nu AS (SELECT SUM(c) AS n_uni FROM uc),
    pos AS (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i FROM d),
    bc AS (
      SELECT a[i] AS w1, a[i + 1] AS w2, COUNT(*) AS cxy
      FROM pos GROUP BY 1, 2),
    nb AS (SELECT SUM(cxy) AS n_big FROM bc),
    j AS (
      SELECT b.w1, b.w2, b.cxy, x.c AS cx, y.c AS cy,
        ln(((CAST(b.cxy AS DOUBLE) * CAST(n_uni AS DOUBLE)) * CAST(n_uni AS DOUBLE)) /
           ((CAST(n_big AS DOUBLE) * CAST(x.c AS DOUBLE)) * CAST(y.c AS DOUBLE))) AS pmiraw
      FROM bc b JOIN uc x ON b.w1 = x.w JOIN uc y ON b.w2 = y.w, nu, nb
      WHERE b.cxy >= 5)
    SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy, CAST(cx AS BIGINT) AS cx,
      CAST(cy AS BIGINT) AS cy, ROUND(pmiraw, 6) AS pmi
    FROM j ORDER BY pmiraw DESC, w1, w2 LIMIT 25"""

  /** Frequency-spectrum lexical richness per language: Yule's K =
    * 10⁴(Σf² − N)/N², Simpson's D = Σf(f−1)/(N(N−1)), type-token
    * ratio. Σf² ≡ Σr²·V_r over the spectrum, so no spectrum
    * materialization is needed — one vocabulary-keyed aggregate.
    */
  def lexicalRichness(docs: DataFrame): DataFrame = {
    val f = docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("f"))
    f.groupBy("lang").agg(
        sum("f").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("f") * col("f")).cast("decimal(38,0)")).as("f2"),
        sum((col("f") * (col("f") - 1)).cast("decimal(38,0)")).as("fp"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        round(expr(
          """10000.0 * (CAST(f2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) /
            | (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))""".stripMargin), 6)
          .as("yule_k"),
        round(expr(
          """CAST(fp AS DOUBLE) /
            | (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))""".stripMargin), 6)
          .as("simpson_d"),
        round(expr("CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)"), 6).as("ttr"))
      .orderBy("lang")
  }

  private val richnessOracle = """
    WITH f AS (
      SELECT lang, w, COUNT(*) AS f
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1, 2),
    g AS (
      SELECT lang, CAST(SUM(f) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
        CAST(SUM(f * f) AS DECIMAL(38,0)) AS f2,
        CAST(SUM(f * (f - 1)) AS DECIMAL(38,0)) AS fp
      FROM f GROUP BY 1)
    SELECT lang, n_tokens, CAST(n_types AS BIGINT) AS n_types,
      ROUND(10000.0 * (CAST(f2 AS DOUBLE) - CAST(n_tokens AS DOUBLE)) /
        (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yule_k,
      ROUND(CAST(fp AS DOUBLE) /
        (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)), 6) AS simpson_d,
      ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr
    FROM g ORDER BY lang"""

  /** Cohen's kappa between two deterministic annotation rules (a
    * char-length rater and a token-length rater) — the standard
    * agreement audit before trusting heuristic quality labels. The
    * 2×2 confusion counts are exact; κ = (p_o − p_e)/(1 − p_e).
    */
  def cohensKappa(docs: DataFrame): DataFrame = {
    val r = docs.select(
      (col("n_chars") > 300).as("ra"),
      (size(split(col("text"), " ")) > 55).as("rb"))
    r.agg(
        count(lit(1)).as("n"),
        sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"))
      .withColumn("po", expr("(CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .withColumn("pe", expr(
        """(CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
          |+ (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round(col("po"), 6).as("po"), round(col("pe"), 6).as("pe"),
        round(when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(null).cast("double")), 6).as("kappa"))
  }

  private val kappaOracle = """
    WITH r AS (
      SELECT n_chars > 300 AS ra,
        len(string_split(text, ' ')) > 55 AS rb
      FROM documents),
    c AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM r),
    p AS (
      SELECT *,
        (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE) AS po,
        (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
        + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) AS pe
      FROM c)
    SELECT CAST(n AS BIGINT) AS n, n11, n10, n01, n00,
      ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
      ROUND(CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) ELSE NULL END, 6) AS kappa
    FROM p"""

  /** DSIR-style importance weights (Xie et al. 2023): per-document
    * log-ratio score Σ_f c_f·ln(p_target(f)/p_raw(f)) over char-bigram
    * features with add-1 smoothing (target = English slice). Feature
    * log-ratios are rounded to 6 decimals and carried as DECIMAL, so
    * the per-document score is an exact decimal dot product — order
    * independent. The feature table is vocabulary-sized and
    * broadcast; output is the per-language score histogram.
    */
  def dsirWeights(docs: DataFrame): DataFrame = {
    // native per-doc bigram counting (graft.functions.CharNGramCounts):
    // the previous per-position explode + groupBy(doc, f) shuffled one
    // row per corpus CHARACTER; counting in-task leaves only per-doc
    // count maps, checkpointed ONCE so the feature-stats pass and the
    // scoring pass share a single text scan. Empty-feature docs are
    // dropped up front (they had no cnt rows in the exploded form, so
    // they never scored).
    // The empty-map guard runs on the RAW text (length(text) >= 2 ⇔ a
    // nonempty bigram count map — both sides are UTF8String.numChars):
    // the former filter(size(fcs) > 0) was pushed below the projection
    // with the counting expression SUBSTITUTED into it, so every doc
    // paid char_ngram_counts twice (Filter + Project — the guide's
    // §4.4 duplicated-evaluation trap; it was ~40% of this query's
    // dominant stage at sf1).
    // fanout: the per-doc counting pass otherwise runs as ONE task on
    // the one-row-group driver corpus (§2.5)
    val perDoc = graft.Tables.fanout(
        docs.select(col("doc_id"), col("lang"), col("text"))
          .filter(length(col("text")) >= 2))
      .select(col("doc_id"), col("lang"),
        graft.functions.CharNGramCounts.char_ngram_counts(col("text"), 2).as("fcs"))
      .localCheckpoint()
    val fstats = perDoc
      .select(col("lang"), explode(col("fcs")).as("fc"))
      .select(col("lang"), col("fc.f").as("f"), col("fc.c").as("c"))
      .groupBy("f").agg(
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("kt"),
        sum(when(col("lang") =!= "en", col("c")).otherwise(0L)).as("kr"))
    val tots = fstats.agg(sum("kt").as("nt"), sum("kr").as("nr"), count(lit(1)).as("v"))
    // The feature table is charset²-bounded (≤ ~9.4k on ASCII corpora;
    // 385 observed at sf1) — collect it and inline the log-ratios as ONE
    // map literal, so scoring is an in-task fold over each doc's count
    // map: no per-feature join, no |docs|×features shuffle. The
    // per-document score is the same exact decimal dot product (terms
    // quantized to DECIMAL(38,6); exact adds are order-independent).
    val lrRows = fstats.crossJoin(broadcast(tots))
      .select(col("f"), round(expr(
        """ln((CAST(kt + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)) /
          |   (CAST(kr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)))""".stripMargin), 6)
        .cast("decimal(18,6)").as("lr"))
      .collect() // bounded: |charset|² features, see above
    val lrMap = org.apache.spark.sql.GraftBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        lrRows.map(r => r.getString(0) -> r.getDecimal(1)).toMap,
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.DecimalType(18, 6), valueContainsNull = false)))
    val score = perDoc.select(col("doc_id"), col("lang"),
      graft.functions.CountMapDot.count_map_dot(col("fcs"), lrMap).as("score"))
    score.groupBy(col("lang"),
        floor(col("score").cast("double") / 10.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_score"))
      .orderBy("lang", "bucket")
  }

  private val dsirOracle = """
    WITH feats AS (
      SELECT doc_id, lang,
        substr(text, CAST(i AS INTEGER), 2) AS f
      FROM (SELECT doc_id, lang, text,
              unnest(generate_series(1, len(text) - 1)) AS i
            FROM documents)),
    cnt AS (
      SELECT doc_id, lang, f, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3),
    fstats AS (
      SELECT f,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS kt,
        CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS kr
      FROM feats GROUP BY 1),
    tots AS (
      SELECT CAST(SUM(kt) AS BIGINT) AS nt, CAST(SUM(kr) AS BIGINT) AS nr,
        COUNT(*) AS v
      FROM fstats),
    lr AS (
      SELECT f, CAST(ROUND(
        ln((CAST(kt + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)) /
           (CAST(kr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE))), 6) AS DECIMAL(18,6)) AS lr
      FROM fstats, tots),
    score AS (
      SELECT c.doc_id, c.lang,
        CAST(SUM(CAST(CAST(c.c AS DECIMAL(18,0)) * l.lr AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS score
      FROM cnt c JOIN lr l USING (f)
      GROUP BY 1, 2)
    SELECT lang,
      CAST(floor(CAST(score AS DOUBLE) / 10.0) AS BIGINT) AS bucket,
      COUNT(*) AS n_docs,
      ROUND(CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score
    FROM score GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---------------------------------------------------------------- q357

  /** word2vec-style negative-sampling table: unigram counts raised to
    * the 3/4 power (Mikolov et al. NIPS'13), normalized to ppm
    * weights, for the top 20 tokens by count. The ¾ power flattens the
    * Zipf head so rare tokens get sampled; the report shows each
    * token's raw frequency share vs its smoothed sampling share — the
    * table a pretraining pipeline materializes once per corpus. The
    * normalizer is an exact decimal sum of per-token pow() doubles
    * (order-free); shares are doubles of that exact pair.
    */
  def negativeSampling(docs: DataFrame, top: Int = 20): DataFrame = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = counts.agg(
      sum("c").as("n_tokens"),
      sum(dec(pow(col("c").cast("double"), 0.75), 6)).cast("decimal(28,6)")
        .as("z"))
    counts.crossJoin(broadcast(tot))
      .select(col("token"), col("c").as("count"),
        round(col("c").cast("double") * 1000000.0
          / col("n_tokens").cast("double"), 1).as("freq_ppm"),
        round(pow(col("c").cast("double"), 0.75) * 1000000.0
          / col("z").cast("double"), 1).as("sample_ppm"))
      .orderBy(col("count").desc, col("token"))
      .limit(top)
  }

  private def negSamplingOracle(top: Int = 20): String = s"""
    WITH counts AS MATERIALIZED (
      SELECT token, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE len(token) > 0 GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(SUM(CAST(pow(CAST(c AS DOUBLE), 0.75) AS DECIMAL(18,6)))
          AS DECIMAL(28,6)) AS z
      FROM counts)
    SELECT token, c AS count,
      ROUND(CAST(c AS DOUBLE) * 1000000.0 / CAST(n_tokens AS DOUBLE), 1)
        AS freq_ppm,
      ROUND(pow(CAST(c AS DOUBLE), 0.75) * 1000000.0 / CAST(z AS DOUBLE), 1)
        AS sample_ppm
    FROM counts, tot
    ORDER BY count DESC, token LIMIT $top"""

  override def queries: Seq[Q] = Seq(
    Q("q357_negative_sampling",
      (s, d) => negativeSampling(documents(s, d)),
      Some(negSamplingOracle())),
    Q("q229_llr_keyness", (s, d) => llrKeyness(documents(s, d)), Some(llrOracle)),
    Q("q231_pmi_collocations", (s, d) => pmiCollocations(documents(s, d)), Some(pmiOracle)),
    Q("q232_lexical_richness", (s, d) => lexicalRichness(documents(s, d)), Some(richnessOracle)),
    Q("q234_cohens_kappa", (s, d) => cohensKappa(documents(s, d)), Some(kappaOracle)),
    Q("q235_dsir_weights", (s, d) => dsirWeights(documents(s, d)), Some(dsirOracle)),
  )
}
