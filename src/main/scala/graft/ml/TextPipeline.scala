package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF featurization (SURVEY.md §2.9 text table), two flavors:
  *
  *  - [[tfidfExact]] — the oracle-checked relational formulation: explode
  *    tokens, per-(doc,term) counts, document frequency, smoothed IDF
  *    `ln((N+1)/(df+1)) + 1`, top-k terms per document. Every step is a
  *    plain shuffle-agg/broadcast-join plan DuckDB can replay.
  *  - [[tfidf]] — the MLlib pipeline (Tokenizer + HashingTF + IDF) a
  *    curation stack would use for model features; hashing-trick buckets
  *    are engine-specific, so it is spec-tested rather than oracle-checked.
  */
object TextPipeline {

  def tfidf(spark: SparkSession, sfDir: String, numFeatures: Int = 1024): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("tokens"),
      new HashingTF().setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    val model = pipe.fit(docs)
    model.transform(docs)
      .select(col("doc_id"), col("lang"),
        size(col("tokens")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Exact TF-IDF: top-k terms per document with tf, df and the smoothed
    * tf-idf weight. Ranking key is (tf DESC, term ASC) — integer/string,
    * so the ranking is engine-stable; the double tf-idf weight is output
    * (round 6) but never compared or ordered on. Plan shape: one
    * shuffle-agg for tf, one for df (vocabulary-sized — AQE broadcasts
    * its join at any realistic vocab; Zipf keeps |vocab| ≪ corpus), a
    * bounded top-k window per doc.
    */
  def tfidfExact(docs: DataFrame, k: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .orderBy(col("doc_id"), col("tf").desc, col("term"))
  }

  val tfidfExactOracle: String = """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        t -> len(t) > 0)) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf,
        row_number() OVER (PARTITION BY tf.doc_id
          ORDER BY tf.tf DESC, tf.term) AS rk
      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf
    FROM scored WHERE rk <= 3 ORDER BY doc_id, tf DESC, term"""
}
