package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The MLlib TF-IDF pipeline (Tokenizer + HashingTF + IDF) is not
  * oracle-checkable (hashing-trick buckets are engine-specific), so its
  * invariants are pinned here; the exact relational formulation is
  * oracle-checked as q52.
  */
class TextPipelineSpec extends SparkSpec {

  test("mllib tfidf pipeline: one row per doc, token counts match split") {
    val out = TextPipeline.tfidf(spark, sf("sf0.001"), numFeatures = 64)
    val docs = Tables.documents(spark, sf("sf0.001"))
    assert(out.count() == docs.count())
    // Tokenizer lowercases and splits on \s+ — on the single-spaced corpus
    // the token count equals the size of split(text, ' ')
    val expected = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(r.getAs[Long]("n_tokens") == expected(r.getAs[Long]("doc_id")))
    }
  }

  test("exact tfidf: rank-1 term has the max tf of its doc, df consistent") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = TextPipeline.tfidfExact(docs, k = 3)
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    // each doc emits <= 3 rows, tf non-increasing within a doc
    byDoc.values.foreach { rows =>
      assert(rows.length <= 3)
      val tfs = rows.map(_.getAs[Long]("tf"))
      assert(tfs.sameElements(tfs.sortBy(-_)))
    }
    // df of a term is the number of distinct docs containing it
    val terms = out.select("term", "df").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct().groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { case (t, df) => assert(tok(t) == df, s"term $t") }
  }
}
