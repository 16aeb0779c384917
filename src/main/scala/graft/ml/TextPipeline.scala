package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib text featurization (SURVEY.md §2.9 table: Tokenizer + HashingTF
  * + IDF): the TF-IDF pipeline a training-data curation stack uses for
  * lightweight relevance/quality models. Rows-only (hashing-trick buckets
  * and IDF weights are engine-specific).
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
}
