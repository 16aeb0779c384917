package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M7 model registry WITH stage transitions — the mlflow lifecycle the
  * reference drives in `04a_Model Deployment.py:158-214`: versions are
  * registered at stage None, prior Production versions are archived, and
  * the latest None version is promoted to Production; consumers resolve
  * "models:/name/Production" to the latest version currently in that
  * stage.
  *
  * Storage is an append-only parquet TRANSITION LOG
  * (model_name, version, stage, seq) — never an in-place update: a
  * version's current stage is its latest log row, and the full
  * Archive/None/Production history stays queryable. The SCD2 validity
  * intervals come from the q111 builder ([[graft.ops.Extended.scd2History]])
  * applied to the log — the same collapse-consecutive/lead-interval
  * derivation, reused rather than re-implemented.
  *
  * Scale: the log is registry-sized (versions × transitions, not corpus
  * rows); every query is one pass over it. The latest-row-per-version
  * window partitions by (model_name, version).
  */
object Registry {

  private def emptyLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, String, Long)]
      .toDF("model_name", "version", "stage", "seq")
  }

  /** The transition log (empty if nothing registered yet). Existence is
    * probed through the Hadoop FileSystem API so `dir` may live on any
    * supported filesystem (hdfs://, s3a://, file:), not just the local
    * disk a `java.io.File` check would see. */
  def log(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(dir) else emptyLog(spark)
  }

  private def append(spark: SparkSession, dir: String,
      rows: Seq[(String, Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("model_name", "version", "stage", "seq")
      .write.mode("append").parquet(dir)
  }

  /** nextSeq is a read-modify-write over the log; every mutation runs it
    * under [[withLock]] so concurrent writers cannot mint the same seq. */
  private def nextSeq(l: DataFrame): Long =
    l.agg(coalesce(max("seq"), lit(0L))).collect()(0).getLong(0) + 1L

  /** Serialize registry mutations with a create-exclusive lock file
    * beside the log (`<dir>.lock` — NOT inside it: the log dir is a
    * parquet dataset whose readers must not see foreign files). Local
    * filesystems take `File.createNewFile` (atomic open(O_CREAT|O_EXCL)
    * on POSIX); other schemes take Hadoop's `create(path, overwrite =
    * false)` (atomic namenode op on HDFS). A crashed writer cannot wedge
    * the registry: a lock older than [[lockStaleMs]] is broken and
    * re-contended; acquisition past [[lockWaitMs]] fails loudly rather
    * than deadlocking the caller. Replaces the former documented
    * single-writer assumption with actual mutual exclusion.
    */
  private val lockStaleMs = 60000L
  private val lockWaitMs = 30000L
  private def withLock[T](spark: SparkSession, dir: String)(f: => T): T = {
    val lockPath = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".lock")
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isLocal = Option(lockPath.toUri.getScheme).forall(_ == "file")
    def tryAcquire(): Boolean =
      if (isLocal) {
        val f = new java.io.File(lockPath.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        f.createNewFile()
      } else {
        try { fs.create(lockPath, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    val deadline = System.currentTimeMillis() + lockWaitMs
    var acquired = tryAcquire()
    while (!acquired && System.currentTimeMillis() < deadline) {
      try {
        val st = fs.getFileStatus(lockPath)
        if (System.currentTimeMillis() - st.getModificationTime > lockStaleMs)
          fs.delete(lockPath, false) // stale holder: break the lock
      } catch { case _: java.io.FileNotFoundException => } // freed: retry now
      if (!{ acquired = tryAcquire(); acquired }) Thread.sleep(25)
    }
    if (!acquired)
      throw new IllegalStateException(
        s"registry lock $lockPath not acquired within ${lockWaitMs}ms")
    try f finally fs.delete(lockPath, false)
  }

  /** Register a new version of `name` (stage None, mlflow's initial
    * stage); returns the assigned version. */
  def register(spark: SparkSession, dir: String, name: String): Long =
    withLock(spark, dir) {
      val l = log(spark, dir)
      val v = l.filter(col("model_name") === name)
        .agg(coalesce(max("version"), lit(0L))).collect()(0).getLong(0) + 1L
      append(spark, dir, Seq((name, v, "None", nextSeq(l))))
      v
    }

  /** Explicit stage transition for one version (the
    * `transition_model_version_stage` analogue). */
  def transition(spark: SparkSession, dir: String, name: String,
      version: Long, stage: String): Unit = withLock(spark, dir) {
    append(spark, dir, Seq((name, version, stage, nextSeq(log(spark, dir)))))
  }

  /** Latest log row per (model_name, version) = that version's current
    * stage. */
  def currentStages(l: DataFrame): DataFrame = {
    val w = Window.partitionBy("model_name", "version")
      .orderBy(col("seq").desc)
    l.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("model_name", "version", "stage", "seq")
  }

  /** mlflow `get_latest_versions(name, stages=[stage])`: the highest
    * version currently in `stage`. */
  def latestVersion(spark: SparkSession, dir: String, name: String,
      stage: String): Option[Long] =
    currentStages(log(spark, dir))
      .filter(col("model_name") === name && col("stage") === stage)
      .agg(max("version")).collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }

  /** The `04a:158-214` promotion flow as one operation: archive every
    * version currently in Production, then promote the latest None
    * version. Returns the promoted version (None if nothing is staged). */
  def promoteToProduction(spark: SparkSession, dir: String,
      name: String): Option[Long] = withLock(spark, dir) {
    val cur = currentStages(log(spark, dir))
      .filter(col("model_name") === name)
      .select("version", "stage").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var seq = nextSeq(log(spark, dir))
    val archive = cur.collect { case (v, "Production") =>
      val row = (name, v, "Archived", seq); seq += 1; row
    }
    val promote = cur.collect { case (v, "None") => v } match {
      case vs if vs.nonEmpty => Some(vs.max)
      case _ => None
    }
    val rows = archive.toSeq ++
      promote.map(v => (name, v, "Production", seq)).toSeq
    if (rows.nonEmpty) append(spark, dir, rows)
    promote
  }

  /** SCD2 stage history — validity intervals per (model_name:version)
    * with an is_current flag, built by the q111 derivation
    * ([[graft.ops.Extended.scd2History]]) over the transition log
    * (seq doubles as the event time, so valid_from_us/valid_to_us are
    * exact sequence numbers). */
  def stageHistory(l: DataFrame): DataFrame =
    graft.ops.Extended.scd2History(
      l.select(
        concat_ws(":", col("model_name"), col("version")).as("user_id"),
        col("stage").as("event_type"),
        col("seq").as("event_id"),
        timestamp_micros(col("seq")).as("ts")))
      .withColumnRenamed("user_id", "model_version")
      .withColumnRenamed("event_type", "stage")

  // ---------------------------------------------------------------- q415

  /** Deterministic synthetic transition log derived from the events
    * table (the oracle derives the identical log in SQL): model = event
    * type, version = user_id mod 5 + 1, stage from value terciles, seq =
    * event_id (unique, so current-stage resolution is unambiguous). */
  def syntheticLog(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("model_name"),
      (col("user_id") % 5 + 1).as("version"),
      when(col("value") < 10, "None")
        .when(col("value") < 100, "Production")
        .otherwise("Archived").as("stage"),
      col("event_id").as("seq"))

  /** q415: per (model_name, stage) registry report over the synthetic
    * log — lifetime transition counts, versions currently in the stage,
    * and the latest such version (the get_latest_versions answer). */
  def stageReport(l: DataFrame): DataFrame = {
    val cur = currentStages(l)
      .groupBy("model_name", "stage")
      .agg(count(lit(1)).as("n_current"), max("version").as("latest_version"))
    val trans = l.groupBy("model_name", "stage")
      .agg(count(lit(1)).as("n_transitions"))
    trans.join(cur, Seq("model_name", "stage"), "left_outer")
      .select(col("model_name"), col("stage"), col("n_transitions"),
        coalesce(col("n_current"), lit(0L)).as("n_current"),
        coalesce(col("latest_version"), lit(0L)).as("latest_version"))
      .orderBy("model_name", "stage")
  }

  private[ml] val stageReportOracle = """
    WITH log AS (
      SELECT event_type AS model_name, user_id % 5 + 1 AS version,
        CASE WHEN value < 10 THEN 'None'
             WHEN value < 100 THEN 'Production'
             ELSE 'Archived' END AS stage,
        event_id AS seq
      FROM events),
    cur AS (
      SELECT model_name, version, stage FROM (
        SELECT *, row_number() OVER (PARTITION BY model_name, version
          ORDER BY seq DESC) AS rk FROM log)
      WHERE rk = 1),
    cs AS (
      SELECT model_name, stage, COUNT(*) AS n_current,
        MAX(version) AS latest_version
      FROM cur GROUP BY 1, 2),
    tr AS (
      SELECT model_name, stage, COUNT(*) AS n_transitions
      FROM log GROUP BY 1, 2)
    SELECT tr.model_name, tr.stage, n_transitions,
      COALESCE(n_current, 0) AS n_current,
      COALESCE(latest_version, 0) AS latest_version
    FROM tr LEFT JOIN cs ON tr.model_name = cs.model_name
      AND tr.stage = cs.stage
    ORDER BY tr.model_name, tr.stage"""
}
