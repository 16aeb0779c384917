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

  /** Spread a degenerate scan across the session's parallelism before a
    * CPU-HEAVY per-row stage (md5-per-shingle signatures, per-doc n-gram
    * counting, shingle hashing). The driver corpus is ONE parquet row
    * group per table at every local SF, so a parquet scan — and with it
    * the entire map side of every stage up to the first exchange — runs
    * as a SINGLE task regardless of core count (row groups are the
    * parquet split atom; byte-range splits of a one-group file read
    * nothing). This is guide §2.5's "one huge unsplittable file" input
    * skew: repartition right after the read, BEFORE the expensive
    * projection. Scale-adaptive, not a local[32] constant: it
    * repartitions ONLY when the scan yields fewer partitions than
    * `defaultParallelism` (cores locally, executors×cores on a
    * cluster); at production scale the scan has many splits and this is
    * the identity. Project to the needed columns BEFORE calling (the
    * shuffle carries every column it is given, §2.3).
    */
  def fanout(df: DataFrame): DataFrame =
    if (shouldFan(df)) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** Keyed [[fanout]]: when the downstream stage aggregates/joins on
    * `keys`, hash-repartitioning by those keys lets EnsureRequirements
    * reuse the exchange — the degenerate scan is spread AND the
    * aggregation's own shuffle disappears into it (one exchange total,
    * same as the un-fanned plan, but with a parallel map side). Same
    * scale-adaptive guards as [[fanout]].
    */
  def fanout(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    if (shouldFan(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys: _*)
    else df

  /** Fan out only when BOTH hold: the scan is degenerate (fewer
    * partitions than defaultParallelism — at production split counts
    * this alone makes fanout the identity) AND the input is big enough
    * that single-task map work dominates the repartition's fixed costs
    * (one extra exchange + a 32-task wave that AQE will not coalesce
    * for a user repartition — measured ~+0.5-1 s per stage at sf0.1,
    * where the whole text corpus is <1 MB and the map work ~0.1 s; at
    * sf1, 7+ MB inputs, the same fanouts win 1.4-1.8×). The threshold
    * compares the optimizer's sizeInBytes estimate — file bytes for a
    * scan, scaled DOWN by schema-default column widths under a
    * projection (measured: the 7 MB sf1 documents scan reads 3.0 MB at
    * the (doc_id, text) shingle site, 0.25 MB at sf0.1) — against
    * `spark.graft.fanout.minBytes`, default 2 MB: all measured
    * regressing sites at sf0.1 sit below 0.6 MB and all winning sites
    * at either SF above 2.2 MB. Orders of magnitude below any
    * production scan, so it only distinguishes "trivially small local
    * corpus" from "real input"; nothing here is tuned to a core count.
    */
  private def shouldFan(df: DataFrame): Boolean = {
    val sc = df.sparkSession.sparkContext
    val minBytes = df.sparkSession.conf
      .getOption("spark.graft.fanout.minBytes").map(_.toLong)
      .getOrElse(2L * 1024 * 1024)
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // sizes at/near defaultSizeInBytes (Long.MaxValue) mean UNKNOWN —
    // checkpointed/LogicalRDD inputs (e.g. q151's ~1.6k-row bucket
    // tables) report that sentinel; they already carry their creation
    // parallelism, so never fan them on a meaningless estimate
    df.rdd.getNumPartitions < sc.defaultParallelism &&
      size >= minBytes && size < BigInt(Long.MaxValue) / 4
  }
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

  // native DECIMAL(18,s) quantizer: identical semantics to
  // `c.cast(DecimalType(18, scale))` (it delegates to that very Cast for
  // non-double inputs and uncertain values) with a proven integer fast
  // path for the double hot case — see graft.functions.DecCast
  def dec(c: Column, scale: Int = 2): Column =
    graft.functions.DecCast.dec_cast(c, scale)

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast("double")

  /** Deterministic average: exact decimal sum divided by count. */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))

  /** x·2^50 as an exact decimal integer. The power-of-two multiply is
    * exact in IEEE doubles, and for float32-origin data (|x| ≳ 1e-8,
    * ulp ≥ 2^-50) the product IS an integer — so the decimal cast can
    * never land on a rounding tie. Raw float32 columns are precisely
    * the coarse-dyadic population where a plain `CAST(x AS
    * DECIMAL(p,s))` ties (e.g. -0.22314453125 at scale 10, q308/sf1)
    * and the engines split: Spark rounds the SHORTEST decimal repr
    * HALF_UP while DuckDB rounds the full binary expansion half-even.
    * Use this for sums of raw float-origin values; squares/products are
    * tie-free at even scales (their dyadic width is even) and may keep
    * the plain dec() cast.
    */
  def bin50(c: Column): Column =
    (c * lit(1.125899906842624e15)).cast(DecimalType(38, 0))

  /** Exact-integer decimal → double via the 2^52/2^26 three-part split:
    * each part is an integer < 2^53 whose decimal→double cast is exact
    * on both engines; reassembly is one fixed IEEE op sequence. Textual
    * SQL macro (Spark dialect) so the DuckDB oracle twin below stays a
    * verbatim mirror. Beyond 2^53 a direct CAST(decimal AS DOUBLE)
    * differs between Spark (BigDecimal) and DuckDB (int128) by 1 ulp.
    */
  def splitDblSql(v: String): String =
    s"""(CASE WHEN ($v) < 0 THEN -1.0D ELSE 1.0D END * (
       |  CAST((abs($v) - (abs($v) % 4503599627370496)) / 4503599627370496 AS DOUBLE) * 4503599627370496.0D
       |  + CAST(CAST(abs($v) % 4503599627370496 AS BIGINT) DIV 67108864 AS DOUBLE) * 67108864.0D
       |  + CAST(CAST(abs($v) % 67108864 AS BIGINT) AS DOUBLE)))""".stripMargin

  /** DuckDB twin of [[splitDblSql]] (HUGEINT in place of DECIMAL). */
  def splitDblDuck(v: String): String =
    s"""((CASE WHEN ($v) < 0 THEN -1.0 ELSE 1.0 END) * (
       |  CAST(abs($v) // 4503599627370496 AS DOUBLE) * 4503599627370496.0
       |  + CAST((abs($v) % 4503599627370496) // 67108864 AS DOUBLE) * 67108864.0
       |  + CAST(abs($v) % 67108864 AS DOUBLE)))""".stripMargin

  /** Deterministic mean of a [[bin50]] sum: split-convert, descale by
    * 2^50, divide by the count — the same three IEEE ops on both
    * engines. */
  def bin50MeanSql(s: String, n: String): String =
    s"(${splitDblSql(s)} / 1.125899906842624e15 / ($n))"

  /** DuckDB twin of [[bin50MeanSql]]; pair with
    * `SUM(CAST(xv * 1.125899906842624e15 AS HUGEINT))`. */
  def bin50MeanDuck(s: String, n: String): String =
    s"(${splitDblDuck(s)} / 1.125899906842624e15 / ($n))"
}
