package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.MinHashSig.minhash_sig
import graft.functions.WordShingles.word_shingles
import graft.functions.CosineSimilarity.cosine_sim
import org.apache.spark.sql.functions._

/** The native expressions must stay semantically pinned to the SQL
  * formulations they replaced (the DuckDB oracles still use the SQL
  * form — any drift breaks the correctness gate silently).
  */
class NativeExprSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf("sf0.001"))

  test("word_shingles count == string-shingle distinct count per doc") {
    val native = docs.select(col("doc_id"),
      size(word_shingles(col("text"), 4)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val strings = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), size(expr(
        "array_distinct(transform(sequence(0, size(t) - 4), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == strings)
  }

  test("minhash_sig equals the md5/conv SQL fold bit-for-bit") {
    val native = docs.select(col("doc_id"), minhash_sig(col("text"), 12).as("sig"))
      .filter(size(col("sig")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val sql = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(t) - 4), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))").as("shs"))
      .withColumn("hs", expr(
        "transform(transform(shs, s -> md5(cast(s as binary))), m -> named_struct(" +
          "'h1', cast(conv(substring(m, 1, 15), 16, 10) as bigint) % 1000000007L, " +
          "'h2', cast(conv(substring(m, 16, 15), 16, 10) as bigint) % 1000000007L))"))
      .withColumn("sig", expr(
        "aggregate(hs, array_repeat(9223372036854775807L, 12), (acc, p) -> " +
          "zip_with(acc, sequence(0, 11), (a, j) -> " +
          "least(a, pmod(p.h1 + cast(j as bigint) * p.h2, 1000000007L))))"))
      .select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(native == sql)
  }

  test("word_shingles/minhash_sig mirror split() on irregular whitespace") {
    // Spark split(text, ' ') at limit -1 (and DuckDB string_split) keeps
    // empty tokens for consecutive/leading/trailing separators — the
    // natives must shingle identically on such corpora, not just on the
    // single-spaced driver data (ADVICE r1).
    import spark.implicits._
    val weird = Seq(
      (1L, "a  b c d"),       // internal double space
      (2L, " a b c d"),       // leading space
      (3L, "a b c d "),       // trailing space
      (4L, "a b  c  d  "),    // mixed
      (5L, "a b c"),          // < 4 tokens even with empties? (3 tokens)
      (6L, "   "),            // only separators (4 empty tokens)
    ).toDF("doc_id", "text")
    val nShingles = weird.select(col("doc_id"),
        size(word_shingles(col("text"), 4)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // joining with the separator the text was split on is bijective on
    // token tuples, so distinct-string count == distinct-tuple count
    val expected = weird
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), size(expr(
        "array_distinct(transform(sequence(0, size(t) - 4), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // doc 5 has 3 tokens -> 0 shingles; doc 6 has 4 empty tokens -> 1 shingle
    assert(nShingles(5L) == 0)
    assert(nShingles(6L) == 1)
    assert(nShingles(1L) == expected(1L) && nShingles(2L) == expected(2L)
      && nShingles(3L) == expected(3L) && nShingles(4L) == expected(4L))
    // minhash: the SQL fold with split-kept empties must match the native
    val native = weird.select(col("doc_id"), minhash_sig(col("text"), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val sql = weird
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(t) - 4), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))").as("shs"))
      .withColumn("hs", expr(
        "transform(transform(shs, s -> md5(cast(s as binary))), m -> named_struct(" +
          "'h1', cast(conv(substring(m, 1, 15), 16, 10) as bigint) % 1000000007L, " +
          "'h2', cast(conv(substring(m, 16, 15), 16, 10) as bigint) % 1000000007L))"))
      .withColumn("sig", expr(
        "aggregate(hs, array_repeat(9223372036854775807L, 12), (acc, p) -> " +
          "zip_with(acc, sequence(0, 11), (a, j) -> " +
          "least(a, pmod(p.h1 + cast(j as bigint) * p.h2, 1000000007L))))"))
      .select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    sql.foreach { case (id, sig) => assert(native(id) == sig, s"doc $id") }
    assert(native(5L).isEmpty)
  }

  test("char_ngrams equals the sequence/transform HOF bit-for-bit") {
    import graft.functions.CharNGrams.char_ngrams
    import spark.implicits._
    val extra = Seq((9000001L, "AbC dEf"), (9000002L, "ab"), (9000003L, "")).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    val both = d.select(col("doc_id"),
        char_ngrams(col("text"), 3).as("native"),
        expr("CASE WHEN length(text) >= 3 THEN " +
          "transform(sequence(1, length(text) - 2), i -> lower(substring(text, i, 3))) " +
          "ELSE array() END").as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("char_ngrams handles multibyte UTF-8 identically to the HOF") {
    // the native expression walks UTF-8 byte boundaries by hand — pin it
    // against the builtin substring/lower on multibyte text (2-, 3- and
    // 4-byte code points, mixed with ASCII and boundary-length strings)
    import graft.functions.CharNGrams.char_ngrams
    import spark.implicits._
    val texts = Seq(
      "héllo wörld",            // 2-byte chars
      "日本語のテキストです",        // 3-byte chars
      "mixed 日本 and ascii",     // mixed widths
      "emoji 😀😀 pair",          // 4-byte surrogate-pair chars
      "ÀÉÎÕÜ",                  // uppercase accents (lowercasing)
      "ab",                     // shorter than n
      "日本",                    // exactly... 2 chars < 3
      "àbc",                    // exactly n
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val both = df.select(col("id"),
        char_ngrams(col("text"), 3).as("native"),
        expr("CASE WHEN length(text) >= 3 THEN " +
          "transform(sequence(1, length(text) - 2), i -> lower(substring(text, i, 3))) " +
          "ELSE array() END").as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id ${r.getLong(0)}")
    }
  }

  test("word_ngrams equals the split/slice HOF bit-for-bit") {
    import graft.functions.WordNGrams.word_ngrams
    import spark.implicits._
    val extra = Seq(
      (9000001L, "a  b c"),      // internal double space (empty token)
      (9000002L, " lead trail "), // leading + trailing separators
      (9000003L, "one"),          // fewer tokens than n
      (9000004L, ""),             // empty string (one empty token)
      (9000005L, "héllo wörld 日本語 😀 mixed"), // multibyte slicing
    ).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    val both = d.select(col("doc_id"),
        word_ngrams(col("text"), 2).as("native"),
        expr("CASE WHEN size(split(text, ' ')) >= 2 THEN " +
          "transform(sequence(1, size(split(text, ' ')) - 1), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) " +
          "ELSE array() END").as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("winnowing_fps equals the transform/array_min SQL form bit-for-bit") {
    import graft.functions.WinnowingFps.winnowing_fps
    import spark.implicits._
    val k = 8; val w = 16
    val extra = Seq(
      (9000001L, "a" * (k + w - 1)),          // exactly one window
      (9000002L, "a" * (k + w - 2)),          // one char short: empty
      (9000003L, ""),                          // empty text
      (9000004L, "héllo wörld 日本語 😀 padding to pass the length gate"),
      (9000005L, ("xyz" * 40) + "q" + ("xyz" * 40)), // periodic text, heavy fp ties
    ).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    // hoist the k-gram hash array into its own projection (the pre-native
    // q296 shape): inlining it under the per-window lambda would
    // re-evaluate the full transform at every p — O(n^2) per doc
    val both = d
      .select(col("doc_id"), winnowing_fps(col("text"), k, w).as("native"),
        expr(
          s"""CASE WHEN length(text) >= ${k + w - 1} THEN
             |  transform(sequence(1, length(text) - ${k - 1}),
             |    i -> aggregate(slice(transform(split(text, ''), c -> ascii(c)), i, $k),
             |           0L, (acc, x) -> acc * 31 + x))
             |ELSE NULL END""".stripMargin).as("hs"))
      .select(col("doc_id"), col("native"),
        expr(s"""CASE WHEN hs IS NULL THEN array()
                |ELSE array_distinct(transform(sequence(1, size(hs) - ${w - 1}),
                |       p -> array_min(slice(hs, p, $w)))) END""".stripMargin)
          .as("sqlform"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("longest_repeat equals the suffix-explode/window SQL form bit-for-bit") {
    import graft.functions.LongestRepeat.longest_repeat
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val extra = Seq(
      (9000001L, ""), (9000002L, "x"),            // <2 chars: NULL / excluded
      (9000003L, "xy"),                            // one pair, lcp 0
      (9000004L, "aa"),                            // minimal repeat
      (9000005L, "b" * 60),                        // repeat beyond the 20 cap
      (9000006L, "the rain the rain falls again"), // planted repeat
      // non-BMP: astral chars are ONE code point each (Spark SQL
      // length/substring count code points); a UTF-16 charAt walk would
      // invent lone-surrogate suffixes and count each emoji as 2
      (9000007L, "😀😀ab😀😀ab"),
      (9000008L, "x😀x😀x"),
    ).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    val native = d.select(col("doc_id"), longest_repeat(col("text"), 20).as("lrs"))
      .filter(col("lrs").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val suf = d.select(col("doc_id"),
      explode(expr(
        """CASE WHEN length(text) >= 1
          |  THEN transform(sequence(1, length(text)), i -> substring(text, i, 20))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("s"))
    val sql = suf
      .withColumn("nxt", lead("s", 1).over(Window.partitionBy("doc_id").orderBy("s")))
      .filter(col("nxt").isNotNull)
      .withColumn("lcp", expr(
        """array_max(transform(sequence(1, 20),
          |  i -> CASE WHEN substring(s, 1, i) = substring(nxt, 1, i)
          |            AND length(s) >= i AND length(nxt) >= i
          |       THEN i ELSE 0 END))""".stripMargin))
      .groupBy("doc_id").agg(max("lcp").as("lrs"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == sql)
  }

  test("char_ngram_counts equals explode+groupBy counting bit-for-bit") {
    import graft.functions.CharNGramCounts.char_ngram_counts
    import spark.implicits._
    val extra = Seq(
      (9000001L, ""), (9000002L, "x"),   // sub-n: empty array
      (9000003L, "xy"), (9000004L, "aaaa"),
      (9000005L, "héllo wörld 日本語 😀"), // multibyte byte-slicing
      (9000006L, "Case CASE case"),       // case preserved (no lowercase)
    ).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    val native = d.select(col("doc_id"),
        explode(char_ngram_counts(col("text"), 2)).as("fc"))
      .select(col("doc_id"), col("fc.f"), col("fc.c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val sql = d.filter(length(col("text")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("f"))
      .groupBy("doc_id", "f").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(native == sql)
  }

  test("rake_islands equals the posexplode/window gaps-and-islands form") {
    import graft.functions.RakeIslands.rake_islands
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val stop = Seq("the", "a", "of", "to", "and", "is", "in")
    val extra = Seq(
      (9000001L, ""), (9000002L, "the of and"),       // all stopwords / empty
      (9000003L, "rain rain the rain rain rain"),      // repeat members, 2 islands
      (9000004L, "  double  spaces the  trailing  "),  // empty tokens dropped
      (9000005L, "one the one the one"),               // same phrase, 3 occurrences
    ).toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").union(extra)
    // native: island occurrences as (plen, phrase) multiset per doc
    val native = d.select(col("doc_id"),
        explode(rake_islands(col("text"), stop)).as("i"))
      .select(col("doc_id"), col("i.plen"), col("i.phrase"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    // SQL twin: pos - row_number islands, phrase assembled in pos order
    val toks = d.select(col("doc_id"),
      posexplode(filter(split(col("text"), " "), t => t =!= lit("")))
        .as(Seq("pos", "tok")))
    val sql = toks.filter(!col("tok").isInCollection(stop))
      .withColumn("island", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "island")
      .agg(count(lit(1)).cast("int").as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"))
      .select("doc_id", "plen", "phrase")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    assert(native == sql)
  }

  test("cosine_sim equals the zip_with/aggregate fold bit-for-bit") {
    val emb = Tables.embeddings(spark, sf("sf0.001")).limit(50)
      .crossJoin(broadcast(Tables.embeddings(spark, sf("sf0.001"))
        .filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
    val both = emb.select(
      cosine_sim(col("embedding"), col("qv")).as("native"),
      expr("aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)" +
        " / (sqrt(aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))" +
        " * sqrt(aggregate(qv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))").as("fold"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
