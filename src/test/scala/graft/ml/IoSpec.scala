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

  test("M7 registry stage transitions: Archive -> None -> Production with per-stage retrieval") {
    val dir = Files.createTempDirectory("registry").toString + "/log"
    val v1 = Registry.register(spark, dir, "cv_model")
    assert(v1 == 1L)
    assert(Registry.latestVersion(spark, dir, "cv_model", "None").contains(1L))
    assert(Registry.promoteToProduction(spark, dir, "cv_model").contains(1L))
    assert(Registry.latestVersion(spark, dir, "cv_model", "Production").contains(1L))
    // second version: registering leaves it at None; promotion must
    // archive v1 and move v2 to Production atomically (04a:158-214)
    val v2 = Registry.register(spark, dir, "cv_model")
    assert(v2 == 2L)
    assert(Registry.promoteToProduction(spark, dir, "cv_model").contains(2L))
    assert(Registry.latestVersion(spark, dir, "cv_model", "Production").contains(2L))
    assert(Registry.latestVersion(spark, dir, "cv_model", "Archived").contains(1L))
    assert(Registry.latestVersion(spark, dir, "cv_model", "None").isEmpty)
    // a second model namespace does not interfere
    assert(Registry.register(spark, dir, "other_model") == 1L)
    assert(Registry.latestVersion(spark, dir, "cv_model", "Production").contains(2L))
    // SCD2 history (q111 builder): v1 walked None -> Production -> Archived,
    // with exactly the final interval current
    val h = Registry.stageHistory(Registry.log(spark, dir))
      .filter(col("model_version") === "cv_model:1")
      .orderBy("valid_from_us").collect()
    assert(h.map(_.getAs[String]("stage")).toSeq == Seq("None", "Production", "Archived"))
    assert(h.map(_.getAs[Long]("is_current")).toSeq == Seq(0L, 0L, 1L))
    // intervals chain: each valid_to equals the successor's valid_from
    assert(h.sliding(2).forall(p =>
      p(0).getAs[Long]("valid_to_us") == p(1).getAs[Long]("valid_from_us")))
  }

  test("M7 registry: concurrent registers serialize through the lock (distinct versions + seqs)") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val dir = Files.createTempDirectory("registry_c").toString + "/log"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      // 6 writers race the read-modify-write; without the lock two could
      // mint the same version/seq (the former single-writer assumption)
      val versions = Await.result(
        Future.sequence((1 to 6).map(_ =>
          Future(Registry.register(spark, dir, "race_model")))),
        Duration.Inf)
      assert(versions.sorted == (1L to 6L), versions.sorted.toString)
      val rows = Registry.log(spark, dir).collect()
      assert(rows.map(_.getAs[Long]("seq")).sorted.toSeq == (1L to 6L))
      // the lock file is released after the last mutation
      assert(!new java.io.File(dir.stripSuffix("/") + ".lock").exists())
    } finally pool.shutdown()
  }

  test("M5 adaptive tuning: halving spends fewer iterations than the grid at matching best metric") {
    val feats = Scoring.featurize(Tables.embeddings(spark, sf("sf0.001"))).persist()
    try {
      val (tr, te) = Scoring.split(feats)
      val (adaptive, audit) = Scoring.trainAdaptive(tr)
      val rows = audit.collect()
      // allocated budget 6x8 + 3x25 + 1x50 = 173 < the exhaustive 6x50
      assert(rows.map(_.getAs[Long]("max_iter")).sum == 173L)
      assert(rows.count(_.getAs[Long]("round") == 1L) == 6)
      assert(rows.count(_.getAs[Long]("round") == 3L) == 1)
      // the pool is sampled from the reference's log-uniform space
      // (03a:436-441): reg ~ exp(U(-10,-4)), elastic-net ~ exp(U(-10,0)),
      // deterministic (same draws every run) and all distinct
      val r1 = rows.filter(_.getAs[Long]("round") == 1L)
        .map(r => (r.getAs[Double]("reg_param"), r.getAs[Double]("elastic_net")))
      assert(r1.distinct.length == 6)
      assert(r1.forall { case (reg, en) =>
        reg >= math.exp(-10) && reg <= math.exp(-4) &&
        en >= math.exp(-10) && en <= 1.0 })
      assert(Scoring.sampledPool().toSet == r1.toSet)
      // every round keeps its declared survivor count
      assert(rows.filter(_.getAs[Long]("round") == 1L).count(_.getAs[Long]("kept") == 1L) == 3)
      assert(rows.filter(_.getAs[Long]("round") == 2L).count(_.getAs[Long]("kept") == 1L) == 1)
      val ev = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
        .setLabelCol("y")
      val aAuc = ev.evaluate(adaptive.transform(te))
      val eAuc = ev.evaluate(Scoring.trainExhaustive(tr).transform(te))
      assert(aAuc >= eAuc - 0.02, s"adaptive test AUC $aAuc vs exhaustive $eAuc")
    } finally feats.unpersist(blocking = false)
  }
}
