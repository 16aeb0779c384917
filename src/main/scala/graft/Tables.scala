package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver corpus (TESTDATA.md).
  * One parquet file per table under `sfDir`; schema identical across SFs.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long and convert (exact: driver data is
    * micro-precision, so `ns div 1000` is lossless). Derived corpora
    * (e.g. the ScaleUp output) write a regular micros timestamp — the
    * schema dispatch keeps one loader working across both physical types.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // a TIMESTAMP_MICROS corpus reads as NTZ; the engine contract is
      // session-time TIMESTAMP (watermarks and unix_micros reject NTZ),
      // and with the session pinned UTC the cast preserves the instant
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Shared numeric helpers for DuckDB-oracle bit-exactness.
  *
  * Floating sums are order-dependent at the last bit, and Spark's partial
  * aggregation order differs from DuckDB's. Casting each addend to DECIMAL
  * first makes the sum exact and order-independent; the final cast back to
  * DOUBLE is then deterministic and identical across engines. A decimal
  * rounding boundary (x.5 at scale s>=1) is never exactly representable as
  * a binary double, so the double->decimal cast itself is also
  * engine-independent.
  */
object Num {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast("double")

  /** Deterministic average: exact decimal sum divided by count. */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))
}
