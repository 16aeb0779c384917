package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Num.dec
import graft.Tables._

/** Training-data pipeline operators (SURVEY.md §2.9 extension surface):
  * deterministic weighted sampling, T5-style span-corruption auditing,
  * tokenizer-fertility profiling, RAKE keyword extraction, per-node
  * clustering coefficients on the trade graph, and LSH-bucket density
  * outlier detection over the embedding corpus. None exist in the
  * reference (its data prep stops at a fixed-fraction `sampleBy`,
  * `03a_Model Training.py:81`).
  *
  * Oracle-exactness discipline (graft-oracle-exactness): every rank key
  * and score is exact integer/decimal arithmetic (hash-derived uniforms,
  * cross-multiplied priorities, micro-scaled rational scores); doubles
  * appear only in final fixed-shape closed forms over identical operands.
  *
  * Scale discipline: sampling/masking/fertility are single grouped
  * passes over the corpus; RAKE's word-statistics join is per-source
  * vocabulary-sized (broadcastable); the clustering-coefficient closure
  * runs on the dimension-bounded nation graph; density outliers bucket
  * by sign-LSH so the only corpus shuffle is the bucket count.
  */
object Training extends QueryModule {

  // ---------------------------------------------------------------- q264

  /** Sequential Poisson sampling (Ohlsson 1998): a deterministic
    * weighted without-replacement sample of k=5 docs per source with
    * inclusion probability ~ n_chars. Each doc draws a pseudo-uniform
    * u from a multiplicative integer hash of its id and ranks by the
    * priority u/w — realized here as the EXACT integer (u*1e9) DIV w so
    * both engines sort identical BIGINTs (no float rank-flip risk), ties
    * broken by doc_id. At 100 TB this is one hash + one per-source
    * top-k: no RNG state, no driver coordination, restart-idempotent.
    */
  def poissonSample(docs: DataFrame): DataFrame = {
    val u = expr("((doc_id % 1000000007L) + 1L) * 2654435761L % 1000000007L")
    val prio = expr("u * 1000000000L DIV n_chars")
    val w = Window.partitionBy("source")
    val ranked = docs
      .withColumn("u", u)
      .withColumn("priority", prio)
      .withColumn("w_total", sum(col("n_chars")).over(w))
      .withColumn("rnk", row_number().over(
        w.orderBy(col("priority"), col("doc_id"))))
    ranked.filter(col("rnk") <= 5)
      .select(col("source"), col("rnk").as("rank"), col("doc_id"),
        col("n_chars"), col("priority"),
        round(col("n_chars").cast("double") / col("w_total"), 8)
          .as("w_share"))
      .orderBy("source", "rank")
  }

  private val poissonOracle = """
    WITH d AS (
      SELECT source, doc_id, n_chars,
        ((doc_id % 1000000007) + 1) * 2654435761 % 1000000007 AS u,
        SUM(n_chars) OVER (PARTITION BY source) AS w_total
      FROM documents),
    r AS (
      SELECT source, doc_id, n_chars, w_total,
        u * 1000000000 // n_chars AS priority,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY u * 1000000000 // n_chars, doc_id) AS rnk
      FROM d)
    SELECT source, rnk AS rank, doc_id, n_chars, priority,
      ROUND(CAST(n_chars AS DOUBLE) / w_total, 8) AS w_share
    FROM r WHERE rnk <= 5 ORDER BY source, rank"""

  // ---------------------------------------------------------------- q265

  /** T5-style span-corruption audit: tokens are masked by a
    * deterministic position hash (15% rate), maximal runs of masked
    * tokens form corruption spans (gaps-and-islands on the token
    * position), and the per-source report gives mask ratio, span count,
    * mean/max span length — the exact shape audit run before emitting
    * denoising training pairs. All statistics fold exact integers; the
    * corpus is touched once (posexplode, narrow) and shuffles only the
    * per-doc span rollup.
    */
  def spanCorruption(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
        posexplode(filter(split(col("text"), " "), t => t =!= lit("")))
          .as(Seq("pos", "tok")))
      .withColumn("masked", expr(
        "((pos + 1L) * 1315423911L + ((doc_id % 1000003L) + 1L) * 2654435761L) % 100 < 15"))
    val perDoc = toks.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"))
    val spans = toks.filter(col("masked"))
      .withColumn("island", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "island").agg(count(lit(1)).as("span_len"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum("span_len").as("n_masked"),
        max("span_len").as("max_span"))
    perDoc.join(spans, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("total_tokens"),
        coalesce(sum("n_masked"), lit(0)).cast("long").as("total_masked"),
        coalesce(sum("n_spans"), lit(0)).cast("long").as("total_spans"),
        max(coalesce(col("max_span"), lit(0))).cast("long").as("max_span"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("total_masked"),
        round(col("total_masked").cast("double") / col("total_tokens"), 6)
          .as("mask_ratio"),
        col("total_spans"),
        round(when(col("total_spans") > 0,
          col("total_masked").cast("double") / col("total_spans")), 6)
          .as("mean_span"),
        col("max_span"))
      .orderBy("source")
  }

  private val spanOracle = """
    WITH t0 AS (
      SELECT doc_id, source,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    toks AS (
      SELECT doc_id, source, generate_subscripts(toks, 1) - 1 AS pos,
        unnest(toks) AS tok FROM t0),
    m AS (
      SELECT doc_id, source, pos,
        ((pos + 1) * 1315423911 + ((doc_id % 1000003) + 1) * 2654435761) % 100 < 15 AS masked
      FROM toks),
    per_doc AS (
      SELECT doc_id, source, COUNT(*) AS n_tok FROM m GROUP BY 1, 2),
    islands AS (
      SELECT doc_id,
        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM m WHERE masked),
    span_lens AS (
      SELECT doc_id, island, COUNT(*) AS span_len
      FROM islands GROUP BY 1, 2),
    span_rollup AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(span_len) AS n_masked,
        MAX(span_len) AS max_span
      FROM span_lens GROUP BY 1),
    agg AS (
      SELECT p.source, COUNT(*) AS n_docs,
        CAST(SUM(p.n_tok) AS BIGINT) AS total_tokens,
        CAST(COALESCE(SUM(s.n_masked), 0) AS BIGINT) AS total_masked,
        CAST(COALESCE(SUM(s.n_spans), 0) AS BIGINT) AS total_spans,
        CAST(MAX(COALESCE(s.max_span, 0)) AS BIGINT) AS max_span
      FROM per_doc p LEFT JOIN span_rollup s USING (doc_id)
      GROUP BY 1)
    SELECT source, n_docs, total_tokens, total_masked,
      ROUND(CAST(total_masked AS DOUBLE) / total_tokens, 6) AS mask_ratio,
      total_spans,
      ROUND(CASE WHEN total_spans > 0
        THEN CAST(total_masked AS DOUBLE) / total_spans END, 6) AS mean_span,
      max_span
    FROM agg ORDER BY source"""

  // ---------------------------------------------------------------- q266

  /** Tokenizer fertility profile per language: BPE-ish pre-tokenizer
    * token count (alpha runs + digit runs + symbol singletons) over
    * whitespace words gives the fertility ratio — the statistic that
    * decides per-language token budgets in a multilingual mixture.
    * Complements q24's absolute class counts with the ratio surface
    * (fertility, chars/token, tokens/doc). One grouped pass of exact
    * integer counts; ratios are fixed-shape closed forms.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum((regexp_count(col("text"), lit("[a-z]+"))
          + regexp_count(col("text"), lit("[0-9]+"))
          + regexp_count(col("text"), lit("[^a-z0-9 ]"))).cast("long"))
          .as("bpe_tokens"),
        sum(size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long")).as("ws_words"),
        sum(col("n_chars")).cast("long").as("chars"))
      .select(col("lang"), col("n_docs"), col("bpe_tokens"), col("ws_words"),
        round(col("bpe_tokens").cast("double") / col("ws_words"), 6)
          .as("fertility"),
        round(col("chars").cast("double") / col("bpe_tokens"), 6)
          .as("chars_per_token"),
        round(col("bpe_tokens").cast("double") / col("n_docs"), 3)
          .as("tokens_per_doc"))
      .orderBy("lang")

  private val fertilityOracle = """
    WITH a AS (
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))
          + len(regexp_extract_all(text, '[0-9]+'))
          + len(regexp_extract_all(text, '[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
        CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS ws_words,
        CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1)
    SELECT lang, n_docs, bpe_tokens, ws_words,
      ROUND(CAST(bpe_tokens AS DOUBLE) / ws_words, 6) AS fertility,
      ROUND(CAST(chars AS DOUBLE) / bpe_tokens, 6) AS chars_per_token,
      ROUND(CAST(bpe_tokens AS DOUBLE) / n_docs, 3) AS tokens_per_doc
    FROM a ORDER BY lang"""

  // ---------------------------------------------------------------- q267

  /** RAKE keyword extraction (Rose et al. 2010) per source: stopword
    * positions split each document into candidate phrases
    * (gaps-and-islands over token positions), every content word gets
    * the classic degree/frequency score from its source's co-occurrence
    * statistics, and a phrase scores the sum of its member-word scores.
    * Scores are micro-scaled exact integers ((degree*1e6) DIV freq,
    * summed as BIGINTs) so the per-source top-8 ranks identically in
    * both engines. The word-statistics frame is per-source vocabulary
    * (tiny, broadcast); the corpus is touched once.
    */
  def rakeKeywords(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "is", "in")
    // Doc-local gaps-and-islands in one native pass
    // (graft.functions.RakeIslands): the previous shape shuffled every
    // corpus token through a per-doc row_number window, a per-island
    // groupBy and a join just to delimit phrases. An island occurrence
    // carries (plen, phrase); split(phrase) recovers the member-token
    // multiset losslessly, so word statistics (freq = member
    // occurrences, degree = Σ plen) and the per-occurrence score
    // (Σ member micro — identical across occurrences of a phrase, the
    // quantity the old groupBy(doc, island) + max() computed) all
    // derive from the island frame without doc-level keys.
    val isl = docs.select(col("source"),
        explode(graft.functions.RakeIslands.rake_islands(col("text"), stop)).as("i"))
      .select(col("source"), col("i.plen").as("plen"), col("i.phrase").as("phrase"))
      .localCheckpoint() // reused: word stats + phrase rollup
    val wordStats = isl
      .select(col("source"), col("plen").cast("long").as("plen_l"),
        explode(split(col("phrase"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("freq"), sum("plen_l").as("degree"))
      .withColumn("micro", expr("degree * 1000000L DIV freq"))
    val ranked = isl.filter(col("plen") <= 6)
      .groupBy("source", "phrase")
      .agg(count(lit(1)).as("n_occ"), max("plen").as("plen"))
      .select(col("source"), col("phrase"), col("n_occ"), col("plen"),
        explode(split(col("phrase"), " ")).as("tok"))
      .join(broadcast(wordStats.select("source", "tok", "micro")),
        Seq("source", "tok"))
      .groupBy("source", "phrase")
      .agg(max("n_occ").as("n_occ"), max("plen").as("plen"),
        sum("micro").cast("long").as("score_micro"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("score_micro").desc, col("phrase"))))
    ranked.filter(col("rnk") <= 8)
      .select(col("source"), col("rnk").as("rank"), col("phrase"),
        col("plen").cast("long").as("n_words"), col("n_occ"),
        round(col("score_micro").cast("double") / 1000000.0, 4).as("score"))
      .orderBy("source", "rank")
  }

  private val rakeOracle = """
    WITH t0 AS (
      SELECT doc_id, source,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    toks AS (
      SELECT doc_id, source, generate_subscripts(toks, 1) - 1 AS pos,
        unnest(toks) AS tok FROM t0),
    content AS (
      SELECT doc_id, source, pos, tok,
        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM toks
      WHERE tok NOT IN ('the','a','of','to','and','is','in')),
    phrase_len AS (
      SELECT doc_id, source, island, COUNT(*) AS plen
      FROM content GROUP BY 1, 2, 3),
    occ AS (
      SELECT c.doc_id, c.source, c.island, c.pos, c.tok, p.plen
      FROM content c JOIN phrase_len p USING (doc_id, source, island)),
    word_stats AS (
      SELECT source, tok, COUNT(*) AS freq,
        CAST(SUM(plen) AS BIGINT) AS degree,
        CAST(SUM(plen) AS BIGINT) * 1000000 // COUNT(*) AS micro
      FROM occ GROUP BY 1, 2),
    phrases AS (
      SELECT o.doc_id, o.source, o.island,
        MAX(o.plen) AS plen,
        CAST(SUM(w.micro) AS BIGINT) AS score_micro,
        string_agg(o.tok, ' ' ORDER BY o.pos) AS phrase
      FROM occ o JOIN word_stats w USING (source, tok)
      WHERE o.plen <= 6
      GROUP BY 1, 2, 3),
    ranked AS (
      SELECT source, phrase, COUNT(*) AS n_occ, MAX(plen) AS plen,
        MAX(score_micro) AS score_micro
      FROM phrases GROUP BY 1, 2),
    top AS (
      SELECT source, phrase, n_occ, plen, score_micro,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY score_micro DESC, phrase) AS rnk
      FROM ranked)
    SELECT source, rnk AS rank, phrase, CAST(plen AS BIGINT) AS n_words,
      n_occ, ROUND(CAST(score_micro AS DOUBLE) / 1000000.0, 4) AS score
    FROM top WHERE rnk <= 8 ORDER BY source, rank"""

  // ---------------------------------------------------------------- q268

  /** Per-node local clustering coefficient on the nation co-trade graph
    * (same graph as q174's global triangle count, which this refines):
    * for each nation, degree, incident triangle count, and
    * lcc = 2*tri / (deg*(deg-1)). The corpus contributes exactly one
    * distinct-edges aggregation; the triangle closure runs on the
    * ≤ |nations|² edge list via broadcast joins — the canonical shape
    * when the graph is dimension-bounded but the edge evidence is 100 TB.
    */
  def clusteringCoeff(li: DataFrame, orders: DataFrame, supplier: DataFrame,
      customer: DataFrame): DataFrame = {
    val edges = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        least(col("s_nationkey"), col("c_nationkey")).as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint() // ≤ |nations|² rows; reused by degree + closure
    val deg = edges.select(col("a").as("n")).union(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val e1 = edges.select(col("a").as("x"), col("b").as("y"))
    val e2 = edges.select(col("a").as("y2"), col("b").as("z"))
    val e3 = edges.select(col("a").as("x3"), col("b").as("z3"))
    val triNodes = e1
      .join(broadcast(e2), col("y") === col("y2"))
      .join(broadcast(e3), col("x") === col("x3") && col("z") === col("z3"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    deg.join(triNodes, Seq("n"), "left")
      .select(col("n").as("nationkey"), col("deg").cast("long").as("degree"),
        coalesce(col("tri"), lit(0)).cast("long").as("triangles"),
        round(when(col("deg") > 1,
          coalesce(col("tri"), lit(0)).cast("double") * 2.0
            / (col("deg") * (col("deg") - 1)).cast("double")), 6).as("lcc"))
      .orderBy("nationkey")
  }

  private val clusteringOracle = """
    WITH edges AS (
      SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey) AS a,
        GREATEST(s.s_nationkey, c.c_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE LEAST(s.s_nationkey, c.c_nationkey)
          < GREATEST(s.s_nationkey, c.c_nationkey)),
    deg AS (
      SELECT n, COUNT(*) AS deg FROM (
        SELECT a AS n FROM edges UNION ALL SELECT b AS n FROM edges)
      GROUP BY 1),
    tri AS (
      SELECT n, COUNT(*) AS tri FROM (
        SELECT unnest([e1.x, e1.y, e2.z]) AS n FROM
          (SELECT a AS x, b AS y FROM edges) e1
          JOIN (SELECT a AS y2, b AS z FROM edges) e2 ON e1.y = e2.y2
          JOIN (SELECT a AS x3, b AS z3 FROM edges) e3
            ON e1.x = e3.x3 AND e2.z = e3.z3)
      GROUP BY 1)
    SELECT d.n AS nationkey, CAST(d.deg AS BIGINT) AS degree,
      CAST(COALESCE(t.tri, 0) AS BIGINT) AS triangles,
      ROUND(CASE WHEN d.deg > 1 THEN
        CAST(COALESCE(t.tri, 0) AS DOUBLE) * 2.0
          / CAST(d.deg * (d.deg - 1) AS DOUBLE) END, 6) AS lcc
    FROM deg d LEFT JOIN tri t ON d.n = t.n
    ORDER BY nationkey"""

  // ---------------------------------------------------------------- q333

  /** 3-hop-bounded harmonic centrality over the same nation trade graph
    * as q268/q275: exact BFS distances by two rounds of min-merge edge
    * relaxation (all ≤3-hop walks reach the true ≤3-hop distance), then
    * per-source reach, eccentricity and Σ 1/d — the distance-based
    * centrality family (closeness/harmonic) that complements the
    * spectral ones (q261 HITS, q275 PageRank). Each 1/d term is an
    * exact integer ppm quotient, so the score is an exact integer.
    * Scale: the corpus collapses to the dimension-bounded edge set in
    * one shuffle; relaxation joins are |V|²-sized frames.
    */
  def harmonicCentrality(li: DataFrame, orders: DataFrame, supplier: DataFrame,
      customer: DataFrame): DataFrame = {
    val edges = li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        least(col("s_nationkey"), col("c_nationkey")).as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val und = edges.select(col("a").as("s"), col("b").as("t"))
      .unionAll(edges.select(col("b").as("s"), col("a").as("t")))
      .localCheckpoint() // dimension-bounded; reused by both relaxations
    var dist = und.select(col("s"), col("t"), lit(1L).as("d"))
    for (_ <- 2 to 3) {
      val ext = dist.join(und.select(col("s").as("m"), col("t").as("t2")),
          col("t") === col("m"))
        .filter(col("s") =!= col("t2"))
        .select(col("s"), col("t2").as("t"), (col("d") + 1L).as("d"))
      dist = dist.unionAll(ext).groupBy("s", "t").agg(min("d").as("d"))
        .localCheckpoint()
    }
    dist.groupBy("s")
      .agg(count(lit(1)).as("reach3"),
        sum(expr("1000000 DIV d")).as("harmonic_ppm"),
        max("d").as("ecc3"))
      .select(col("s").as("nationkey"), col("reach3"),
        col("harmonic_ppm"), col("ecc3"))
      .orderBy("nationkey")
  }

  private val harmonicOracle = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey) AS a,
        GREATEST(s.s_nationkey, c.c_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE LEAST(s.s_nationkey, c.c_nationkey)
          < GREATEST(s.s_nationkey, c.c_nationkey)),
    und AS MATERIALIZED (
      SELECT a AS s, b AS t FROM edges
      UNION ALL SELECT b AS s, a AS t FROM edges),
    d1 AS (SELECT s, t, 1 AS d FROM und),
    d2 AS MATERIALIZED (
      SELECT s, t, MIN(d) AS d FROM (
        SELECT * FROM d1
        UNION ALL
        SELECT p.s, u.t, p.d + 1 FROM d1 p JOIN und u ON p.t = u.s
        WHERE u.t <> p.s)
      GROUP BY s, t),
    d3 AS (
      SELECT s, t, MIN(d) AS d FROM (
        SELECT * FROM d2
        UNION ALL
        SELECT p.s, u.t, p.d + 1 FROM d2 p JOIN und u ON p.t = u.s
        WHERE u.t <> p.s)
      GROUP BY s, t)
    SELECT s AS nationkey, COUNT(*) AS reach3,
      CAST(SUM(1000000 // d) AS BIGINT) AS harmonic_ppm,
      CAST(MAX(d) AS BIGINT) AS ecc3
    FROM d3 GROUP BY s ORDER BY nationkey"""

  // ---------------------------------------------------------------- q269

  /** LSH-bucket density outliers over the embedding corpus: vectors
    * bucket by their first-8-dimension sign pattern (the same
    * deterministic sign-LSH family as q31/q38), sparse buckets (size
    * below threshold) mark their members as density outliers, and the
    * report gives per-label outlier rates — the cheap distribution-edge
    * screen run before expensive exact kNN audits. The only corpus
    * shuffle is the bucket count; at 100 TB the bucket histogram is
    * 2^bits rows and broadcasts back onto the scan.
    */
  def densityOutliers(emb: DataFrame): DataFrame = {
    val bucket = (0 until 8).map(i =>
      (element_at(col("embedding"), i + 1) >= 0f).cast("int") * lit(1 << i))
      .reduce(_ + _)
    val b = emb.withColumn("bucket", bucket)
    val sizes = b.groupBy("bucket").agg(count(lit(1)).as("bsize"))
    b.join(broadcast(sizes), Seq("bucket"))
      .groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        sum((col("bsize") < 8).cast("long")).as("n_outliers"),
        countDistinct(col("bucket")).as("n_buckets"),
        min("bsize").cast("long").as("min_bucket"),
        max("bsize").cast("long").as("max_bucket"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n_vecs"), 6)
          .as("outlier_rate"),
        col("n_buckets"), col("min_bucket"), col("max_bucket"))
      .orderBy("label")
  }

  private val densityOracle = """
    WITH b AS (
      SELECT label, vec_id,
        CAST(embedding[1] >= 0 AS INT) * 1 + CAST(embedding[2] >= 0 AS INT) * 2
        + CAST(embedding[3] >= 0 AS INT) * 4 + CAST(embedding[4] >= 0 AS INT) * 8
        + CAST(embedding[5] >= 0 AS INT) * 16 + CAST(embedding[6] >= 0 AS INT) * 32
        + CAST(embedding[7] >= 0 AS INT) * 64 + CAST(embedding[8] >= 0 AS INT) * 128
          AS bucket
      FROM embeddings),
    sizes AS (SELECT bucket, COUNT(*) AS bsize FROM b GROUP BY 1)
    SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
      CAST(SUM(CAST(s.bsize < 8 AS BIGINT)) AS BIGINT) AS n_outliers,
      ROUND(CAST(SUM(CAST(s.bsize < 8 AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
        AS outlier_rate,
      COUNT(DISTINCT b.bucket) AS n_buckets,
      CAST(MIN(s.bsize) AS BIGINT) AS min_bucket,
      CAST(MAX(s.bsize) AS BIGINT) AS max_bucket
    FROM b JOIN sizes s USING (bucket)
    GROUP BY label ORDER BY label"""

  // ------------------------------------------------------------ queries

  // ---------------------------------------------------------------- q373

  /** Churn-label generation: per (user, week) activity panel with the
    * supervised label a retention model trains on — churned_next_week
    * = active this week, silent the next. The panel is built from one
    * rollup + a per-user lead window; the report aggregates to the
    * weekly label distribution (panel rows are the training set, the
    * audit row-counts it). The canonical forward-looking label join
    * that MUST be window-based — a self-join on user×week would skew
    * at 100 TB fan-out.
    */
  def churnLabels(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"),
        weekofyear(col("ts")).as("week"),
        dec(col("value"), 2).as("v"))
      .groupBy("user_id", "week")
      .agg(count(lit(1)).as("n_events"),
        sum("v").cast("decimal(28,2)").as("week_value"))
    val labeled = weekly
      .withColumn("next_week", lead("week", 1).over(
        Window.partitionBy("user_id").orderBy("week")))
      .withColumn("churned_next_week",
        (col("next_week").isNull || col("next_week") =!= col("week") + 1)
          .cast("long"))
    labeled.groupBy("week")
      .agg(count(lit(1)).as("n_active_users"),
        sum("churned_next_week").as("n_churned"),
        sum("n_events").as("n_events"),
        sum("week_value").cast("decimal(28,2)").cast("double")
          .as("week_value"))
      .withColumn("churn_bp",
        expr("n_churned * 10000 DIV n_active_users"))
      .orderBy("week")
  }

  private val churnOracle = """
    WITH weekly AS MATERIALIZED (
      SELECT user_id, weekofyear(ts) AS week, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
          AS week_value
      FROM events GROUP BY 1, 2),
    labeled AS (
      SELECT *,
        LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
      FROM weekly),
    lab AS (
      SELECT *, CASE WHEN next_week IS NULL OR next_week <> week + 1
        THEN 1 ELSE 0 END AS churned
      FROM labeled)
    SELECT week, COUNT(*) AS n_active_users,
      CAST(SUM(churned) AS BIGINT) AS n_churned,
      CAST(SUM(n_events) AS BIGINT) AS n_events,
      CAST(CAST(SUM(week_value) AS DECIMAL(28,2)) AS DOUBLE) AS week_value,
      CAST(SUM(churned) AS BIGINT) * 10000 // COUNT(*) AS churn_bp
    FROM lab GROUP BY week ORDER BY week"""

  // ---------------------------------------------------------------- q374

  /** Group k-fold leakage audit: row-level folds (event_id % 5) put
    * the SAME user on both sides of almost every split — the classic
    * leakage bug — while group folds (user hash % 5) guarantee zero.
    * The audit measures both: per scheme, the count of users straddling
    * folds and the share of rows whose user appears in another fold.
    * Two rollups over the user×fold frame; no joins at corpus scale.
    */
  def groupKfold(events: DataFrame, folds: Int = 5): DataFrame = {
    def audit(name: String, foldCol: org.apache.spark.sql.Column) = {
      val uf = events.select(col("user_id"), foldCol.as("fold"))
        .groupBy("user_id")
        .agg(countDistinct("fold").as("nf"), count(lit(1)).as("rows"))
      uf.agg(count(lit(1)).as("n_users"),
          sum((col("nf") > 1).cast("long")).as("straddling_users"),
          sum(when(col("nf") > 1, col("rows")).otherwise(lit(0L)))
            .as("leaky_rows"),
          sum("rows").as("n_rows"))
        .select(lit(name).as("scheme"), col("n_users"),
          col("straddling_users"), col("n_rows"),
          expr("leaky_rows * 10000 DIV n_rows").as("leaky_rows_bp"))
    }
    audit("row_fold", pmod(col("event_id"), lit(folds.toLong)))
      .unionAll(audit("group_fold", expr(
        s"""pmod(aggregate(transform(split(md5(cast(cast(user_id as string)
           | as binary)), ''), c -> cast(ascii(c) as bigint)),
           | cast(-1 as bigint),
           | (h, a) -> if(h = -1L, a, pmod(h * 31 + a, 1000000007L))),
           | ${folds}L)""".stripMargin.replaceAll("\n", ""))))
      .orderBy("scheme")
  }

  private def groupKfoldOracle(folds: Int = 5): String = s"""
    WITH rf AS (
      SELECT user_id, event_id % $folds AS fold FROM events),
    gf AS (
      SELECT user_id,
        list_reduce(list_transform(
          string_split_regex(md5(CAST(user_id AS VARCHAR)), ''),
          c -> CAST(ascii(c) AS BIGINT)),
          (h, a) -> (h * 31 + a) % 1000000007) % $folds AS fold
      FROM events),
    rfa AS (
      SELECT 'row_fold' AS scheme, COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS straddling_users,
        CAST(SUM(rows_) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN nf > 1 THEN rows_ ELSE 0 END) AS BIGINT)
          * 10000 // CAST(SUM(rows_) AS BIGINT) AS leaky_rows_bp
      FROM (SELECT user_id, COUNT(DISTINCT fold) AS nf, COUNT(*) AS rows_
            FROM rf GROUP BY 1)),
    gfa AS (
      SELECT 'group_fold', COUNT(*),
        CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT),
        CAST(SUM(rows_) AS BIGINT),
        CAST(SUM(CASE WHEN nf > 1 THEN rows_ ELSE 0 END) AS BIGINT)
          * 10000 // CAST(SUM(rows_) AS BIGINT)
      FROM (SELECT user_id, COUNT(DISTINCT fold) AS nf, COUNT(*) AS rows_
            FROM gf GROUP BY 1))
    SELECT * FROM rfa UNION ALL SELECT * FROM gfa ORDER BY scheme"""

  // ---------------------------------------------------------------- q379

  /** Temporal-leakage audit on the churn panel: the same feature
    * (mean event value) computed PAST-ONLY (prefix window up to the
    * label week) vs ALL-TIME (the classic leak — it sees the weeks
    * after the label cutoff). Reports the point-biserial correlation
    * of each variant with the churn label; the all-time variant's
    * inflated |corr| is the leakage signature. Correlations are
    * doubles of exact decimal sums (q140 discipline); the panel adds
    * one prefix window to the q373 rollup.
    */
  def leakageAudit(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"), weekofyear(col("ts")).as("week"),
        dec(col("value"), 2).as("v"))
      .groupBy("user_id", "week")
      .agg(count(lit(1)).as("n_events"),
        sum("v").cast("decimal(28,2)").as("wv"))
    val byUser = Window.partitionBy("user_id").orderBy("week")
    val panel = weekly
      .withColumn("next_week", lead("week", 1).over(byUser))
      .withColumn("label",
        (col("next_week").isNull || col("next_week") =!= col("week") + 1)
          .cast("long"))
      .withColumn("cum_n", sum("n_events").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_v", sum("wv").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,2)"))
      .withColumn("tot_n", sum("n_events").over(Window.partitionBy("user_id")))
      .withColumn("tot_v", sum("wv").over(Window.partitionBy("user_id"))
        .cast("decimal(38,2)"))
      .select(col("label"),
        expr("CAST(cum_v AS DOUBLE) / cum_n").as("f_past"),
        expr("CAST(tot_v AS DOUBLE) / tot_n").as("f_alltime"))
    def corrWith(f: String) = Seq(
      sum(dec(col(f), 6)).cast("decimal(38,6)").as(s"s_$f"),
      sum((dec(col(f), 6) * dec(col(f), 6)).cast("decimal(38,12)"))
        .as(s"ss_$f"),
      sum(when(col("label") === 1, dec(col(f), 6))).cast("decimal(38,6)")
        .as(s"sl_$f"))
    val aggCols = Seq(count(lit(1)).as("n"), sum("label").as("sl")) ++
      corrWith("f_past") ++ corrWith("f_alltime")
    val agg = panel.agg(aggCols.head, aggCols.tail: _*)
    def corr(f: String) = s"""
      (n * CAST(sl_$f AS DOUBLE) - sl * CAST(s_$f AS DOUBLE))
      / sqrt((CAST(n AS DOUBLE) * sl - CAST(sl AS DOUBLE) * sl)
        * (n * CAST(ss_$f AS DOUBLE)
          - CAST(s_$f AS DOUBLE) * CAST(s_$f AS DOUBLE)))"""
    agg.select(col("n").as("n_panel_rows"), col("sl").as("n_churned"),
      round(expr(corr("f_past")), 6).as("corr_past_only"),
      round(expr(corr("f_alltime")), 6).as("corr_alltime"),
      round(expr(s"abs(${corr("f_alltime")}) - abs(${corr("f_past")})"), 6)
        .as("leakage_gain"))
  }

  private val leakageOracle = """
    WITH weekly AS MATERIALIZED (
      SELECT user_id, weekofyear(ts) AS week, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS wv
      FROM events GROUP BY 1, 2),
    panel AS MATERIALIZED (
      SELECT
        CASE WHEN LEAD(week) OVER (PARTITION BY user_id ORDER BY week)
          IS NULL OR LEAD(week) OVER (PARTITION BY user_id ORDER BY week)
          <> week + 1 THEN 1 ELSE 0 END AS label,
        CAST(CAST(SUM(wv) OVER (PARTITION BY user_id ORDER BY week
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DECIMAL(38,2)) AS DOUBLE)
          / CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY week
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS f_past,
        CAST(CAST(SUM(wv) OVER (PARTITION BY user_id) AS DECIMAL(38,2))
          AS DOUBLE)
          / CAST(SUM(n_events) OVER (PARTITION BY user_id) AS BIGINT)
          AS f_alltime
      FROM weekly),
    agg AS (
      SELECT COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS sl,
        CAST(SUM(CAST(f_past AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s_p,
        SUM(CAST(CAST(f_past AS DECIMAL(19,6)) * CAST(f_past AS DECIMAL(19,6))
          AS DECIMAL(38,12))) AS ss_p,
        CAST(SUM(CASE WHEN label = 1 THEN CAST(f_past AS DECIMAL(18,6)) END)
          AS DECIMAL(38,6)) AS sl_p,
        CAST(SUM(CAST(f_alltime AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s_a,
        SUM(CAST(CAST(f_alltime AS DECIMAL(19,6))
          * CAST(f_alltime AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS ss_a,
        CAST(SUM(CASE WHEN label = 1
          THEN CAST(f_alltime AS DECIMAL(18,6)) END) AS DECIMAL(38,6))
          AS sl_a
      FROM panel)
    SELECT n AS n_panel_rows, sl AS n_churned,
      ROUND((n * CAST(sl_p AS DOUBLE) - sl * CAST(s_p AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * sl - CAST(sl AS DOUBLE) * sl)
          * (n * CAST(ss_p AS DOUBLE)
            - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))), 6)
        AS corr_past_only,
      ROUND((n * CAST(sl_a AS DOUBLE) - sl * CAST(s_a AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * sl - CAST(sl AS DOUBLE) * sl)
          * (n * CAST(ss_a AS DOUBLE)
            - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))), 6)
        AS corr_alltime,
      ROUND(abs((n * CAST(sl_a AS DOUBLE) - sl * CAST(s_a AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * sl - CAST(sl AS DOUBLE) * sl)
          * (n * CAST(ss_a AS DOUBLE)
            - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))))
        - abs((n * CAST(sl_p AS DOUBLE) - sl * CAST(s_p AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * sl - CAST(sl AS DOUBLE) * sl)
          * (n * CAST(ss_p AS DOUBLE)
            - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)))), 6)
        AS leakage_gain
    FROM agg"""

  override def queries: Seq[Q] = Seq(
    Q("q379_leakage_audit",
      (s, d) => leakageAudit(events(s, d)), Some(leakageOracle)),
    Q("q373_churn_labels",
      (s, d) => churnLabels(events(s, d)), Some(churnOracle)),
    Q("q374_group_kfold",
      (s, d) => groupKfold(events(s, d)), Some(groupKfoldOracle())),
    Q("q264_poisson_sample",
      (s, d) => poissonSample(documents(s, d)), Some(poissonOracle)),
    Q("q265_span_corruption",
      (s, d) => spanCorruption(documents(s, d)), Some(spanOracle)),
    Q("q266_tokenizer_fertility",
      (s, d) => tokenizerFertility(documents(s, d)), Some(fertilityOracle)),
    Q("q267_rake_keywords",
      (s, d) => rakeKeywords(documents(s, d)), Some(rakeOracle)),
    Q("q268_clustering_coeff",
      (s, d) => clusteringCoeff(lineitem(s, d), orders(s, d), supplier(s, d),
        customer(s, d)),
      Some(clusteringOracle)),
    Q("q333_harmonic_centrality",
      (s, d) => harmonicCentrality(lineitem(s, d), orders(s, d),
        supplier(s, d), customer(s, d)),
      Some(harmonicOracle)),
    Q("q269_density_outliers",
      (s, d) => densityOutliers(embeddings(s, d)), Some(densityOracle)),
  )
}
