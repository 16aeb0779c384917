package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed equivalents of corpus-wide global windows (the q195/q196
  * two-level bucket decomposition, shared by every operator that needs an
  * exact global rank without funneling the corpus through one partition).
  *
  * Level 1 groups rows into coarse buckets keyed by a monotone function
  * of the leading sort key; the bucket table (corpus/width rows) gets
  * per-bucket prefix counts in a bucket-cardinality window. Level 2 runs
  * row_number WITHIN each bucket, partitioned by bucket. rn = prefix +
  * within-bucket rank is identical to the flat global-window form the
  * DuckDB oracles keep.
  */
object Dist {

  /** Appends `rn` = exact row_number over `order` (globally, or within
    * each `partition` group when given), and optionally `total` = the
    * matching row count, computed distributed.
    *
    * `bucket` MUST be monotone non-decreasing with respect to the total
    * order induced by `order` (for a descending leading key pass a
    * negated bucket). Ties across the remaining order columns are broken
    * inside buckets, so the result equals
    * `row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*))`
    * row for row — but the widest window ever opened is one bucket, and
    * the bucket table itself is corpus/width rows.
    */
  def withRowNumber(
      df: DataFrame,
      bucket: Column,
      order: Seq[Column],
      rn: String = "rn",
      total: Option[String] = None,
      partition: Seq[String] = Nil): DataFrame = {
    val b = df.withColumn("__bkt", bucket)
    val keys = partition :+ "__bkt"
    val wIn = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wBkt = Window.partitionBy(partition.map(col): _*).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre0 = b.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bc"))
    val pre = pre0
      .withColumn("__pj", coalesce(sum("__bc").over(wBkt), lit(0L)))
      .select((keys :+ "__pj").map(col): _*)
    val ranked = b.join(broadcast(pre), keys)
      .withColumn(rn, col("__pj") + row_number().over(wIn))
      .drop("__bkt", "__pj")
    total match {
      case None => ranked
      case Some(n) if partition.isEmpty =>
        val tot = pre0.agg(sum("__bc").cast("long").as(n))
        ranked.crossJoin(broadcast(tot))
      case Some(n) =>
        val tot = pre0.groupBy(partition.map(col): _*)
          .agg(sum("__bc").cast("long").as(n))
        ranked.join(broadcast(tot), partition)
    }
  }

  /** Appends `out` = exact running sum of `value` over `order`
    * (UNBOUNDED PRECEDING..CURRENT ROW), distributed the same way:
    * per-bucket prefix sums on the bucket table, within-bucket running
    * sums partitioned by bucket. `value` must be integral (the prefix
    * zero is 0L). Same `bucket` monotonicity contract.
    */
  def withRunningSum(
      df: DataFrame,
      bucket: Column,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val b = df.withColumn("__bkt", bucket).withColumn("__v", value)
    val wIn = Window.partitionBy("__bkt").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBkt = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = b.groupBy("__bkt").agg(sum("__v").as("__bs"))
      .withColumn("__ps", coalesce(sum("__bs").over(wBkt), lit(0L)))
      .select("__bkt", "__ps")
    b.join(broadcast(pre), "__bkt")
      .withColumn(out, col("__ps") + sum("__v").over(wIn))
      .drop("__bkt", "__ps", "__v")
  }

  /** Appends `bin` = exact `ntile(bins)` over `order` (SQL NTILE tiling:
    * the first N mod bins tiles get one extra row), via the distributed
    * row_number above. Same `bucket` monotonicity contract.
    */
  def withNtile(
      df: DataFrame,
      bucket: Column,
      order: Seq[Column],
      bins: Int,
      bin: String = "bin"): DataFrame =
    withRowNumber(df, bucket, order, "__rn", Some("__n"))
      .withColumn(bin, expr(
        s"""CASE WHEN __rn <= (__n % $bins) * (__n DIV $bins + 1)
           | THEN (__rn - 1) DIV (__n DIV $bins + 1) + 1
           | ELSE (__n % $bins)
           |   + (__rn - (__n % $bins) * (__n DIV $bins + 1) - 1)
           |     DIV (__n DIV $bins) + 1 END""".stripMargin))
      .drop("__rn", "__n")
}
