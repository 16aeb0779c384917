package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked operator has BOTH a `queries` entry (Scala
  * DataFrame program) and an `oracleSql` entry (equivalent DuckDB SQL the
  * driver replays at sf0.01). Non-SQL-expressible operators (samplers,
  * sketches, image UDFs, ML scoring) register rows-only.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    ops.Relational,
    ops.Funcs,
    ops.Scale,
    ops.Extended,
    ops.Layout,
    ops.Analytics,
    ops.StatTests,
    ops.Advanced,
    ops.Insights,
    ops.Training,
    ops.Factorize,
    ops.Curate,
    ops.Walks,
    ops.Refine,
    ops.Placement,
    ops.Series,
    ops.Experiment,
    ops.Governance,
    ops.Evaluate,
    ops.Diagnose,
    ops.Fit,
    ops.Warehouse,
    ops.Lifecycle,
    ops.Supervision,
    ops.Modeling,
    ops.Ranking,
    ops.Inference,
    ops.Tuning,
    ops.Econometrics,
    text.Represent,
    text.TextAnalysis,
    text.Tokenizer,
    text.Geometry,
    text.ClusterQuality,
    text.Agglomerate,
    text.CorpusStats,
    text.CorpusAudit,
    text.Dedup,
    text.Similarity,
    imaging.ImageQueries,
    ingest.IngestQueries,
    ml.MlQueries,
    streaming.StreamingOps,
    multimodal.Multimodal,
  )

  private lazy val all: Seq[Q] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.pricingSummary(
      Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
