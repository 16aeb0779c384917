package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Data-layout operators (the 100 TB posture, SURVEY.md §2.9): multi-
  * dimensional clustering via a Z-order (Morton) sort key, and small-file
  * compaction planning via quota bin-packing. Neither exists in the
  * reference (its layout story is a single `partitionBy('date')`,
  * `02_Data Ingest.py:280`); both are table-maintenance primitives any
  * lakehouse engine needs once tables hit thousands of files.
  *
  * Scale notes:
  *  - The Z-value is a pure per-row expression (shift/mask arithmetic,
  *    whole-stage codegen) — the layout write at scale is
  *    `repartitionByRange(zval)` + `sortWithinPartitions(zval)`, one
  *    range-shuffle over the table. The graded query assigns file ids
  *    with a global `ntile` instead so the assignment is reproducible in
  *    the oracle; the audit aggregation (per-file bounding boxes = what
  *    min/max parquet footer stats would hold) is the same either way.
  *  - The compaction planner runs on the FILE MANIFEST (one row per
  *    file), which is ~10^5-10^6 rows even at 100 TB — metadata scale,
  *    not data scale. Output bins are contiguous key ranges, so executing
  *    the plan preserves any existing sort order.
  */
object Layout extends QueryModule {

  /** Morton-interleave the low `bits` of x and y: x occupies even bit
    * positions, y odd. Unrolled shift/mask arithmetic — stays inside
    * whole-stage codegen (no UDF).
    */
  def zorder2(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order layout audit over (part, supplier) locality: bucket both
    * keys to 8 bits, Z-interleave, carve the Z-sorted table into 32
    * equal "files", and report each file's bounding box in key space.
    * The bbox areas ARE the data-skipping quality: a min/max footer
    * filter on either dimension prunes a file iff the predicate misses
    * its box, and Z-ordered boxes are ~squares (side ~= 256/sqrt(32))
    * rather than full-width stripes.
    */
  def zorderLayout(li: DataFrame, files: Int = 32): DataFrame = {
    val keyed = li.select(
      col("l_orderkey"), col("l_linenumber"),
      pmod(col("l_partkey"), lit(256L)).as("x"),
      pmod(col("l_suppkey"), lit(256L)).as("y"))
    val z = keyed.withColumn("zval", zorder2(col("x"), col("y")))
    val filed = z.withColumn("file_id",
      ntile(files).over(
        Window.orderBy(col("zval"), col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
    filed.groupBy("file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        ((max("x") - min("x") + lit(1L)) * (max("y") - min("y") + lit(1L)))
          .as("bbox_area"))
      .orderBy("file_id")
  }

  private val zorderBitsSql: String =
    (0 until 8).map { i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  private val zorderOracle = s"""
    WITH keyed AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS x, l_suppkey % 256 AS y
      FROM lineitem),
    z AS (SELECT *, $zorderBitsSql AS zval FROM keyed),
    filed AS (
      SELECT *, CAST(ntile(32) OVER (
        ORDER BY zval, l_orderkey, l_linenumber) AS BIGINT) AS file_id
      FROM z)
    SELECT file_id, COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y,
           (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS bbox_area
    FROM filed GROUP BY file_id ORDER BY file_id"""

  /** Compaction plan via sequential quota bin-packing: treat each part
    * key's lineitem rows as one "file" of `sum(quantity*100+37)` bytes,
    * walk files in key order, and cut a new output bin every time the
    * running total crosses a 1 MiB quota (bin = bytes-before-this-file
    * div quota — a closed-form window expression, no iteration). Bins
    * are contiguous key ranges sized ~quota, the exact shape a
    * small-file compactor wants; overflow is bounded by one file.
    */
  def compactionPlan(li: DataFrame, quotaBytes: Long = 1L << 20): DataFrame = {
    val manifest = li.groupBy("l_partkey")
      .agg(sum((col("l_quantity") * 100 + lit(37)).cast("long")).as("bytes"))
    val before = Window.orderBy("l_partkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("cum_before", coalesce(sum("bytes").over(before), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $quotaBytes")) // exact integer div
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_files"),
        sum("bytes").as("bin_bytes"),
        min("l_partkey").as("min_key"), max("l_partkey").as("max_key"))
      .orderBy("bin")
  }

  private val compactionOracle = """
    WITH manifest AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity * 100 + 37 AS BIGINT)) AS bytes
      FROM lineitem GROUP BY l_partkey),
    binned AS (
      SELECT *, COALESCE(SUM(bytes) OVER (ORDER BY l_partkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM manifest),
    withbin AS (
      SELECT *, CAST(cum_before // 1048576 AS BIGINT) AS bin FROM binned)
    SELECT bin, COUNT(*) AS n_files, CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(l_partkey) AS min_key, MAX(l_partkey) AS max_key
    FROM withbin GROUP BY bin ORDER BY bin"""

  override def queries: Seq[Q] = Seq(
    Q("q129_zorder_layout",
      (s, d) => zorderLayout(lineitem(s, d)), Some(zorderOracle)),
    Q("q135_compaction_plan",
      (s, d) => compactionPlan(lineitem(s, d)), Some(compactionOracle)),
  )
}
