package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native ML lifecycle (SURVEY.md §2.8 M1-M7): the reference's
  * transfer-learning pipeline (frozen featurizer + trainable linear head,
  * 03a_Model Training.py:210-233) maps to LogisticRegression over
  * engine-extracted features; Hyperopt tuning (03a:415-451) maps to
  * TrainValidationSplit over a param grid; Horovod data-parallel training
  * (03a:487-597) collapses into estimator.fit on the partitioned
  * DataFrame (gradient tree-aggregation is already distributed).
  * Run metadata persists to a small parquet table (M7) whose "latest
  * production model" retrieval is the SR2 orderBy/limit query.
  */
object Scoring {

  /** embeddings table -> (features: Vector, y: 0/1) — the engine-side
    * featurization (M1 analogue over the vector corpus; binary target per
    * the reference's NUM_CLASSES=2, 03a:211).
    */
  def featurize(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"),
      (col("label") % 2).cast("double").as("y"))

  /** Deterministic split (hash-predicate; the graded analogue of the
    * seeded sampler, SURVEY.md §7.2).
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val train = df.filter(pmod(col("vec_id") * 37, lit(10)) < 8)
    val test  = df.join(train.select("vec_id"), Seq("vec_id"), "left_anti")
    (train, test)
  }

  /** The (regParam, elasticNetParam) candidate grid for the exhaustive
    * control search. */
  private[ml] val grid: Seq[(Double, Double)] =
    for (r <- Seq(0.0, 0.01, 0.1); e <- Seq(0.0, 0.5)) yield (r, e)

  /** The adaptive search's candidate pool: `n` deterministic draws from
    * the reference's log-uniform Hyperopt space (`03a_Model
    * Training.py:436-441` searches lr ~ loguniform(-10,-4) and momentum
    * ~ loguniform(-10,0)); here regParam ~ exp(U(-10,-4)) and
    * elasticNetParam ~ exp(U(-10,0)) ∈ (0,1]. Uniforms come from
    * splitmix64 over (seed, draw index) — a portable pure function, so
    * the pool is identical across runs, JVMs, and partitionings (the
    * same hash-uniform policy the engine-side q154 weighted sampler
    * uses), with none of the non-reproducibility of `Math.random`.
    */
  private[ml] def sampledPool(n: Int = 6, seed: Long = 42L): Seq[(Double, Double)] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def u(i: Long): Double = (mix(seed * 1000003L + i) >>> 11).toDouble / (1L << 53).toDouble
    (0 until n).map { i =>
      (math.exp(-10.0 + 6.0 * u(2L * i)), math.exp(-10.0 + 10.0 * u(2L * i + 1)))
    }
  }

  /** M5 baseline: exhaustive grid at full budget (every candidate pays
    * maxIter=50). Kept as the control the adaptive search is audited
    * against — 6 x 50 = 300 allocated iterations.
    */
  def trainExhaustive(trainDf: DataFrame): LogisticRegressionModel = {
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y")
      .setMaxIter(50)
    val pgrid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.01, 0.1))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5))
      .build()
    val tvs = new TrainValidationSplit()
      .setEstimator(lr)
      .setEvaluator(new BinaryClassificationEvaluator().setLabelCol("y"))
      .setEstimatorParamMaps(pgrid)
      .setTrainRatio(0.8)
      .setParallelism(6) // one slot per grid point: all candidates fit concurrently
      .setSeed(42L)
    tvs.fit(trainDf).bestModel.asInstanceOf[LogisticRegressionModel]
  }

  /** M5: ADAPTIVE hyperparameter search — successive halving over the
    * same grid (the q356 arm-selection scheme applied to estimator
    * tuning; the Spark-native analogue of the reference's Hyperopt
    * adaptive budget, `03a_Model Training.py:415-451`). Round r fits the
    * surviving configs at iteration budget {8, 25, 50} on a deterministic
    * inner 80/20 split and keeps the top {3, 1} by validation AUC, so
    * the full 50-iteration budget is spent on ONE survivor:
    * 6x8 + 3x25 + 1x50 = 173 allocated iterations vs the exhaustive
    * 300. Returns the winning model plus the per-round audit trail
    * (round, reg_param, elastic_net, max_iter, val_auc, kept) — the
    * rows-only q414 surface. Each fit is itself distributed (MLlib
    * gradient tree-aggregation); the driver only sequences rounds.
    */
  def trainAdaptive(trainDf: DataFrame): (LogisticRegressionModel, DataFrame) = {
    val spark = trainDf.sparkSession
    import spark.implicits._
    val (best, rows) = adaptiveRows(trainDf)
    (best, rows
      .toDF("round", "reg_param", "elastic_net", "max_iter", "val_auc", "kept"))
  }

  /** [[trainAdaptive]]'s engine: returns the winner plus the audit as
    * driver-local rows (session-free, so it can be cached across the q43
    * and q414 query surfaces). Each round's surviving candidates are fit
    * CONCURRENTLY on a round-sized thread pool — the TrainValidationSplit
    * `setParallelism` pattern; every fit is itself a distributed MLlib
    * job, the threads only overlap job submission — so wall-clock is
    * max-per-round, not sum.
    */
  private def adaptiveRows(trainDf: DataFrame)
      : (LogisticRegressionModel, Seq[(Long, Double, Double, Long, Double, Long)]) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // deterministic inner validation split (hash predicate, decorrelated
    // from split()'s *37 by a different multiplier)
    val tr0 = trainDf.filter(pmod(col("vec_id") * 53, lit(10)) < 8)
    val va0 = trainDf.filter(pmod(col("vec_id") * 53, lit(10)) >= 8)
    val budgets = Seq(8, 25, 50)
    val keeps = Seq(3, 1, 1)
    var pool = sampledPool()
    var best: LogisticRegressionModel = null
    val audit = Seq.newBuilder[(Long, Double, Double, Long, Double, Long)]
    val exec = java.util.concurrent.Executors.newFixedThreadPool(pool.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(exec)
    try {
      for (r <- budgets.indices) {
        val scored = Await.result(
          Future.sequence(pool.map { case (reg, en) => Future {
            // evaluator is NOT thread-safe shared state: one per fit
            val m = new LogisticRegression()
              .setFeaturesCol("features").setLabelCol("y")
              .setMaxIter(budgets(r)).setRegParam(reg).setElasticNetParam(en)
              .fit(tr0)
            val auc = new BinaryClassificationEvaluator().setLabelCol("y")
              .evaluate(m.transform(va0))
            ((reg, en), m, auc)
          }}), Duration.Inf)
          .sortBy { case ((reg, en), _, auc) => (-auc, reg, en) } // pinned tiebreak
        val kept = scored.take(keeps(r)).map(_._1).toSet
        scored.foreach { case ((reg, en), _, auc) =>
          audit += ((r + 1L, reg, en, budgets(r).toLong, auc,
            if (kept((reg, en))) 1L else 0L))
        }
        pool = scored.map(_._1).filter(kept)
        best = scored.head._2
      }
    } finally exec.shutdown()
    (best, audit.result())
  }

  /** ONE adaptive search per corpus directory, shared by the q43
    * (train+score) and q414 (tuning audit) surfaces: both consume the
    * identical search over the identical deterministic split, so running
    * it twice per session re-fit the same 10 models for nothing (the r10
    * bench's two heaviest queries). The cache holds only driver-side
    * state — a fitted coefficient vector and a ≤10-row audit — valid for
    * as long as the parquet under `sfDir` is, which is the whole run.
    */
  private val searchCache = scala.collection.concurrent.TrieMap
    .empty[String, (LogisticRegressionModel, Seq[(Long, Double, Double, Long, Double, Long)])]

  // sfDir-keyed, so Bench's warm (sf0.001) and timed (sf0.1) passes never
  // shared an entry; cleared between passes anyway (graft.Memos.reset) so
  // the no-warm-to-timed-transfer guarantee is structural, not per-cache.
  private[graft] def resetMemo(): Unit = searchCache.clear()

  private def sharedSearch(featurized: DataFrame, sfDir: String)
      : (LogisticRegressionModel, Seq[(Long, Double, Double, Long, Double, Long)]) =
    searchCache.getOrElseUpdate(sfDir, adaptiveRows(split(featurized)._1))

  /** M3/M5: train via the adaptive search (same grid, 173 of the
    * exhaustive 300 allocated iterations — [[trainAdaptive]]). */
  def train(trainDf: DataFrame): LogisticRegressionModel =
    trainAdaptive(trainDf)._1

  /** U3 analogue: P(class=1) per row (the reference's softmax[:,1],
    * 04a_Model Deployment.py:65-105).
    */
  def score(model: LogisticRegressionModel, df: DataFrame): DataFrame =
    model.transform(df).select(
      col("vec_id"), col("y"),
      element_at(vector_to_array(col("probability")), 2).as("score"))

  /** End-to-end train+score on the embeddings table (rows-only query:
    * model coefficients are solver-dependent, not oracle-checkable).
    */
  def trainAndScore(spark: SparkSession, sfDir: String): DataFrame = {
    // persist the featurized corpus: the 6 grid fits + eval + scoring all
    // re-read it (each LR fit would otherwise re-scan parquet + re-featurize)
    val feats = featurize(graft.Tables.embeddings(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (_, te) = split(feats)
      val model = sharedSearch(feats, sfDir)._1
      val auc = new BinaryClassificationEvaluator().setLabelCol("y")
        .setRawPredictionCol("rawPrediction")
        .evaluate(model.transform(te))
      score(model, te)
        .withColumn("test_auc", round(lit(auc), 4))
        .select("vec_id", "y", "score", "test_auc")
        .orderBy("vec_id")
        .localCheckpoint() // materialize before unpersisting the input
    } finally feats.unpersist(blocking = false)
  }

  /** q414 (rows-only: AUCs are solver-dependent): the adaptive search's
    * audit trail over the embeddings corpus — which configs were fitted
    * at which budget, their validation AUC, and who survived each
    * halving round.
    */
  def adaptiveTuningAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = featurize(graft.Tables.embeddings(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sharedSearch(feats, sfDir)._2
        .toDF("round", "reg_param", "elastic_net", "max_iter", "val_auc", "kept")
        .orderBy("round", "reg_param", "elastic_net")
    } finally feats.unpersist(blocking = false)
  }

  /** M7: append run metadata; "promote to production" = latest row wins
    * (registry stage transitions collapse to the SR2 retrieval query).
    */
  def logRun(spark: SparkSession, runsDir: String, runName: String,
      metric: Double, modelPath: String): Unit = {
    import spark.implicits._
    Seq((runName, System.currentTimeMillis(), metric, modelPath))
      .toDF("run_name", "start_time", "metric", "model_path")
      .write.mode("append").parquet(runsDir)
  }

  /** SR2 (04a_Model Deployment.py:118-123): latest run wins. Tiebreak on
    * (run_name, model_path): two runs logged in the same millisecond must
    * still promote deterministically (the repo's every-retrieval-has-a-
    * tiebreak rule).
    */
  def latestRun(spark: SparkSession, runsDir: String): DataFrame =
    spark.read.parquet(runsDir)
      .orderBy(desc("start_time"), desc("run_name"), desc("model_path"))
      .limit(1)
}
