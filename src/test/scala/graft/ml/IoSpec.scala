package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S3/S6/S7/S8 coverage: sized parquet materialization, DDL, driver
  * collect, fs maintenance (SURVEY.md §2.1).
  */
class IoSpec extends SparkSpec {

  test("tensor-cache materialization: sized row groups, round-trips") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Files.createTempDirectory("tensor_cache").toString + "/cache"
    val rowGroup = TensorCache.materialize(spark, docs, "text", out)
    assert(rowGroup >= (1L << 20))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.columns.toSet == docs.columns.toSet)
    assert(TensorCache.rmRecursive(spark, out))
    assert(!new java.io.File(out).exists())
  }

  test("byte sizing matches the reference formula") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val expected = docs.select(sum(lit(4L) + length(col("text")))).collect()(0).getLong(0)
    assert(TensorCache.datasetBytes(docs, "text") == expected)
  }

  test("DDL: create/drop database cascade (S6)") {
    val loc = Files.createTempDirectory("graft_db").toString
    TensorCache.recreateDatabase(spark, "cv", loc)
    assert(spark.catalog.databaseExists("cv"))
    spark.sql("create table cv.t1 (a int) using parquet")
    spark.sql("drop database cv cascade")
    assert(!spark.catalog.databaseExists("cv"))
  }

  test("ML lifecycle: train, score in [0,1], run metadata retrieval (M7/SR2)") {
    val scored = Scoring.trainAndScore(spark, sf("sf0.001"))
    assert(scored.filter(col("score") < 0 || col("score") > 1).count() == 0)
    val runs = Files.createTempDirectory("runs").toString + "/runs"
    Scoring.logRun(spark, runs, "run_a", 0.91, "/models/a")
    Thread.sleep(5)
    Scoring.logRun(spark, runs, "run_b", 0.93, "/models/b")
    val latest = Scoring.latestRun(spark, runs).collect()(0)
    assert(latest.getString(0) == "run_b")
  }
}
