package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.Tables

/** Multimodal columns (SURVEY.md §2.9): image/audio/video as opaque
  * `binary` columns with typed metadata, processed in partition-batched
  * form (`mapPartitions` over a typed Dataset — the Scala analogue of the
  * reference stack's Arrow-batched pandas UDFs, same batch shape and
  * schema contract).
  *
  * The audio/video DECODE step is a STUB (this environment ships no
  * codec libraries): `fakeDecode*` below derive deterministic
  * pseudo-metadata from the payload bytes. The Spark-side plumbing —
  * binary column handling, partition batching, typed output schema,
  * explode of per-frame rows — is real and oracle-checked (the stubs are
  * arithmetic on payload length + md5, which the DuckDB oracle
  * replicates exactly).
  *
  * The real-decode path for images exists in graft.imaging (U1/U2 via
  * javax.imageio) and is what a production deploy would swap in here.
  */
object Multimodal extends QueryModule {

  final case class MediaIn(media_id: Long, media_type: String, content: Array[Byte])
  final case class MediaMeta(media_id: Long, media_type: String, n_bytes: Long,
      duration_ms: Long, n_frames: Long, fingerprint: String)
  final case class Frame(media_id: Long, frame_idx: Long, frame_ts_ms: Long,
      frame_hash: String)

  /** Stub-decode constants, defined ONCE: metadata's n_frames and the
    * sampler's emitted frames must stay in lockstep (the oracle SQL
    * mirrors the same numbers — grep 10 / 250 there when changing).
    */
  val MsPerByte: Long = 10L // stub: 10ms of media per payload byte
  val FrameMs: Long = 250L  // stub: 4 fps sampling interval

  /** STUB decode: deterministic pseudo-metadata from payload bytes.
    * A real build replaces this body with the codec call; the signature
    * and batch shape are the contract.
    */
  def fakeDecodeMeta(m: MediaIn, frameMs: Long = FrameMs): MediaMeta = {
    val nBytes = m.content.length.toLong
    val durationMs = nBytes * MsPerByte
    MediaMeta(m.media_id, m.media_type, nBytes, durationMs,
      durationMs / frameMs, md5Hex(m.content).take(8))
  }

  /** STUB frame sampler: every `frameMs` milliseconds, a frame descriptor
    * whose hash is derived from (payload, index). Emits exactly
    * `fakeDecodeMeta(m, frameMs).n_frames` frames by construction.
    */
  def fakeSampleFrames(m: MediaIn, frameMs: Long = FrameMs): Iterator[Frame] = {
    val durationMs = m.content.length.toLong * MsPerByte
    val n = durationMs / frameMs
    (0L until n).iterator.map { i =>
      Frame(m.media_id, i, i * frameMs,
        md5Hex(m.content ++ s":$i".getBytes("UTF-8")).take(8))
    }
  }

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** The synthetic media corpus: document text bytes as media payloads
    * with a deterministic type assignment (no real media exists in the
    * driver corpus; payload derivation is sfDir-driven and oracle-visible).
    */
  def mediaCorpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      col("text").cast("binary").as("content"))

  /** Partition-batched metadata extraction (mapPartitions = one batch per
    * partition, the Arrow-batch analogue).
    */
  def mediaMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaCorpus(spark, sfDir).as[MediaIn]
      .mapPartitions(batch => batch.map(m => fakeDecodeMeta(m)))
      .toDF()
      .orderBy("media_id")
  }

  private val mediaMetadataOracle = """
    SELECT doc_id AS media_id,
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(octet_length(encode(text)) * 10 AS BIGINT) AS duration_ms,
      CAST((octet_length(encode(text)) * 10) // 250 AS BIGINT) AS n_frames,
      substr(md5(text), 1, 8) AS fingerprint
    FROM documents ORDER BY media_id"""

  /** Frame sampling: one output row per sampled frame (video rows only),
    * flatMap over the typed Dataset.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaCorpus(spark, sfDir)
      .filter(col("media_type") === "video")
      .as[MediaIn]
      .mapPartitions(batch => batch.flatMap(m => fakeSampleFrames(m)))
      .toDF()
      .orderBy("media_id", "frame_idx")
  }

  private val frameSampleOracle = """
    WITH v AS (
      SELECT doc_id AS media_id, text,
        (CAST(octet_length(encode(text)) AS BIGINT) * 10) // 250 AS n
      FROM documents
      WHERE CAST(doc_id % 3 AS INTEGER) = 2),
    f AS (SELECT media_id, text, unnest(range(0, n)) AS frame_idx FROM v)
    SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      CAST(frame_idx * 250 AS BIGINT) AS frame_ts_ms,
      substr(md5(text || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_hash
    FROM f ORDER BY media_id, frame_idx"""

  override def queries: Seq[Q] = Seq(
    Q("q46_media_metadata",
      (s, d) => mediaMetadata(s, d), Some(mediaMetadataOracle)),
    Q("q47_frame_sample",
      (s, d) => frameSample(s, d), Some(frameSampleOracle)),
  )
}
