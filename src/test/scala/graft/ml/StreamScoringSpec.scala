package graft.ml

import graft.SparkSpec
import graft.imaging.ImageQueries
import graft.ingest.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Entry point C end-to-end: train on a batch of images, score a stream,
  * assert the scored-table contract (rows > 0, scores in [0,1], schema
  * (path, score) — the reference CI's only real assertion plus ours).
  */
class StreamScoringSpec extends SparkSpec {

  test("streaming image scoring into the (path, score) sink") {
    val src = Files.createTempDirectory("score_src")
    val out = Files.createTempDirectory("score_out")
    val cp  = Files.createTempDirectory("score_cp")
    ImageQueries.writeCorpus(src)

    val labeled = Ingest.batch(spark, src.toString).select("content", "label")
    val model = StreamScoring.trainOnImages(spark, labeled)

    val q = StreamScoring.scoreStream(spark, model, src.toString, out.toString, cp.toString)
    q.awaitTermination()

    val scored = spark.read.parquet(out.toString)
    assert(scored.columns.toSeq == Seq("path", "score"))
    assert(scored.count() == 24)
    assert(scored.filter(col("score") < 0 || col("score") > 1).count() == 0)
  }

  test("tf-idf pipeline runs over documents") {
    val r = TextPipeline.tfidf(spark, sf("sf0.001"))
    assert(r.count() > 0)
    assert(r.filter(col("n_tokens") <= 0).count() == 0)
  }
}
