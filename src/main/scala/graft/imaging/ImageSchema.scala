package graft.imaging

import org.apache.spark.sql.types._

/** Canonical StructTypes of the image pipeline (SURVEY.md §1.3): image
  * table, metadata struct (exif generated from the tag tables exactly the
  * way the reference generates its schema from ExifTags.TAGS,
  * 02_Data Ingest.py:111-132), statistics struct (02:241-249), scored
  * table (04a:263-268). Everything in exif is stringly-typed by design
  * (reference `v = str(v)`, 02:148).
  */
object ImageSchema {

  /** GPSInfo nested struct: one string field per GPS tag. */
  val gpsStruct: StructType = StructType(
    ExifTags.GPSTAGS.map { case (_, n) => StructField(n, StringType, nullable = true) })

  /** Exif struct: one string field per tag, GPSInfo replaced by the nested
    * struct AT ITS TAG-ID POSITION — 0x8825, between SpectralSensitivity
    * and ISOSpeedRatings — matching the reference's in-place
    * substitution while iterating PIL's id-ordered TAGS dict
    * (02_Data Ingest.py:111-132); positional consumers (struct equality,
    * parquet column order) see the same field order as the reference.
    */
  val exifStruct: StructType = StructType(
    ExifTags.schemaNamesBeforeGps.map(n => StructField(n, StringType, nullable = true)) ++
      Seq(StructField("GPSInfo", gpsStruct, nullable = true)) ++
      ExifTags.schemaNamesAfterGps.map(n => StructField(n, StringType, nullable = true)))

  /** U1 return type (02_Data Ingest.py:190-199). */
  val metadataStruct: StructType = StructType(Seq(
    StructField("height", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("dpi", ArrayType(IntegerType), nullable = true),
    StructField("layers", IntegerType, nullable = true),
    StructField("mode", StringType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("exif", exifStruct, nullable = true)))

  /** U2 return type (02_Data Ingest.py:241-249): per-band arrays; 256 bins
    * per band concatenated in the histogram (768 for RGB).
    */
  val statisticsStruct: StructType = StructType(Seq(
    StructField("mean", ArrayType(DoubleType), nullable = true),
    StructField("median", ArrayType(IntegerType), nullable = true),
    StructField("stddev", ArrayType(DoubleType), nullable = true),
    StructField("extrema", ArrayType(ArrayType(IntegerType)), nullable = true),
    StructField("entropy", DoubleType, nullable = true),
    StructField("histogram", ArrayType(IntegerType), nullable = true)))

  /** binaryFile source schema (fixed by the Spark source; FIXTURES.md A.1). */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Enriched cv.images table (FIXTURES.md A.2), partitioned by date. */
  val imagesTable: StructType = StructType(
    binaryFileSchema.fields.toSeq ++ Seq(
      StructField("file_name", StringType),
      StructField("timestamp", TimestampType),
      StructField("date", DateType),
      StructField("device_id", StringType),
      StructField("label", IntegerType),
      StructField("metadata", metadataStruct),
      StructField("statistics", statisticsStruct)))

  /** Scored table (04a_Model Deployment.py:263-268). */
  val scoredTable: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("score", DoubleType)))
}
