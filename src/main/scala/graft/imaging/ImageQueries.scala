package graft.imaging

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.ingest.Ingest
import java.nio.file.{Files, Path}

/** Rows-only demo queries driving the image pipeline end-to-end on a
  * deterministic synthetic corpus (no image fixtures exist in the driver
  * testdata; SURVEY.md §7.0). These exercise the real operators: binary
  * source scan, F1-F5 parsing, U1/U2 UDFs, streaming sink, tensorize.
  */
object ImageQueries extends QueryModule {

  /** Deterministic mini-corpus: 24 images across 2 devices x 2 labels x
    * 3 dates, filenames in the reference capture format
    * `<ts>_<device_id>_<label>.jpg` (02_Data Ingest.py:324-326). The
    * timestamp token is date-only: Hadoop's Path rejects colons in local
    * filenames (URI parsing), so the full ISO form is exercised in the
    * filename-parsing unit test instead; shot uniqueness is encoded in
    * the (multi-underscore) device segment, which F4 handles.
    */
  def writeCorpus(dir: Path): Unit = {
    val colors = Seq((200, 30, 30), (30, 200, 30), (30, 30, 200), (128, 128, 128))
    var i = 0
    for (day <- 1 to 3; dev <- Seq("rpi_cam_1", "rpi_cam_2"); label <- 0 to 1) {
      for (shot <- 0 to 1) {
        val (r, g, b) = colors((i + shot) % colors.size)
        val ts = s"2021-10-0$day"
        val bytes =
          if (shot == 0) SyntheticImages.solid(64, 48, r, g, b)
          else SyntheticImages.twoTone(64, 48, (r, g, b), (255 - r, 255 - g, 255 - b))
        Files.write(dir.resolve(s"${ts}_${dev}_s${shot}_$label.jpg"), bytes)
        i += 1
      }
    }
  }

  /** One JPEG-encoded corpus per JVM: regenerating 24 encodes per query
    * invocation would bill image ENCODING to every benchmark pass and
    * leak a temp directory each run. The corpus is read-only, so sharing
    * across queries is safe; files are removed at JVM exit.
    */
  lazy val sharedCorpusDir: Path = {
    val dir = Files.createTempDirectory("graft_images")
    writeCorpus(dir)
    dir.toFile.deleteOnExit()
    val listing = Files.list(dir)
    try listing.forEach(p => p.toFile.deleteOnExit()) finally listing.close()
    dir
  }

  private def corpusDir(): Path = sharedCorpusDir

  /** Batch ingest (entry point A as a batch plan): full enrichment, then a
    * flat projection of the nested structs.
    */
  def imagePipeline(spark: SparkSession): DataFrame = {
    val dir = corpusDir()
    Ingest.batch(spark, dir.toString)
      .select(
        col("file_name"), col("date"), col("device_id"), col("label"),
        col("metadata.height").as("height"),
        col("metadata.width").as("width"),
        col("metadata.mode").as("mode"),
        col("metadata.format").as("format"),
        round(element_at(col("statistics.mean"), 1), 2).as("mean_r"),
        element_at(col("statistics.median"), 1).as("median_r"),
        round(col("statistics.entropy"), 4).as("entropy"),
        size(col("statistics.histogram")).as("hist_bins"))
      .orderBy("file_name")
  }

  /** Streaming ingest (S1+S4): AvailableNow over the corpus into a
    * date-partitioned parquet sink with checkpoint, then read the sink.
    */
  def streamingPipeline(spark: SparkSession): DataFrame = {
    val src = corpusDir()
    // tmpfs scratch (graft.Tmp): the sink + checkpoint are per-run
    // small-file churn, the dominant cost of this finite stream
    val out = graft.Tmp.dir("graft_images_out")
    val cp  = graft.Tmp.dir("graft_images_cp")
    val q = Ingest.stream(spark, src.toString, out.toString, cp.toString)
    q.awaitTermination()
    spark.read.parquet(out.toString)
      .groupBy("date", "device_id", "label")
      .agg(count(lit(1)).as("n_images"),
        round(avg(col("statistics.entropy")), 4).as("avg_entropy"))
      .orderBy("date", "device_id", "label")
  }

  /** M1 tensorize over the corpus: shape + normalization audit. */
  def tensorizeAudit(spark: SparkSession): DataFrame = {
    val dir = corpusDir()
    ImageUdfs.register(spark)
    Ingest.batch(spark, dir.toString)
      .withColumn("t", expr("tensorize(content)"))
      .select(col("file_name"), size(col("t")).as("tensor_len"),
        round(element_at(col("t"), 1), 4).as("t0"))
      .orderBy("file_name")
  }

  override def queries: Seq[Q] = Seq(
    Q("q40_image_pipeline", (s, _) => imagePipeline(s), None),
    Q("q41_streaming_ingest", (s, _) => streamingPipeline(s), None),
    Q("q42_tensorize_audit", (s, _) => tensorizeAudit(s), None),
  )
}
