package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level bucket decomposition (Dist) must be row-for-row
  * identical to the flat global windows it replaces — including NTILE's
  * uneven-tile convention and running-sum frames — while never opening a
  * window wider than one bucket.
  */
class DistSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf("sf0.001"))
    .select(col("event_id"), col("user_id"), col("value"))

  test("withRowNumber equals flat global row_number (ties included)") {
    val flat = ev.withColumn("rn", row_number().over(
      Window.orderBy(col("value"), col("event_id"))))
    val dist = Dist.withRowNumber(ev,
      expr("CAST(value * 100 AS BIGINT) DIV 256"),
      Seq(col("value"), col("event_id")), "rn")
    assert(flat.select("event_id", "rn").exceptAll(
      dist.select("event_id", "rn")).isEmpty)
    assert(dist.count() == ev.count())
  }

  test("withRowNumber partitioned equals flat per-partition row_number, and total matches") {
    val part = col("user_id") % 7
    val keyed = ev.withColumn("grp", part)
    val flat = keyed.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val dist = Dist.withRowNumber(keyed,
      expr("CAST(value * 100 AS BIGINT) DIV 256"),
      Seq(col("value"), col("event_id")), "rn", Some("n"),
      partition = Seq("grp"))
    assert(flat.select("event_id", "rn", "n").exceptAll(
      dist.select("event_id", "rn", "n")).isEmpty)
  }

  test("withNtile matches SQL NTILE for a bin count that doesn't divide n") {
    val flat = ev.withColumn("bin", ntile(7).over(
      Window.orderBy(col("value"), col("event_id"))).cast("long"))
    val dist = Dist.withNtile(ev,
      expr("CAST(value * 100 AS BIGINT) DIV 256"),
      Seq(col("value"), col("event_id")), 7)
    assert(flat.select("event_id", "bin").exceptAll(
      dist.select("event_id", "bin")).isEmpty)
  }

  test("withRunningSum equals flat cumulative sum") {
    val base = ev.groupBy((col("user_id") % 997).as("k"))
      .agg(count(lit(1)).as("n"))
    val flat = base.withColumn("cum", sum("n").over(Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = Dist.withRunningSum(base,
      expr("k DIV 64"), Seq(col("k")), col("n"), "cum")
    assert(flat.select("k", "cum").exceptAll(
      dist.select("k", "cum")).isEmpty)
  }

  test("no window in the decomposed plan is wider than one bucket (no empty partitionSpec over the corpus)") {
    val dist = Dist.withRowNumber(ev,
      expr("CAST(value * 100 AS BIGINT) DIV 256"),
      Seq(col("value"), col("event_id")), "rn")
    val windows = dist.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the only empty-partition window allowed is the bucket-table prefix
    // scan, whose child is the bucket aggregate (corpus/width rows)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty,
        "global window must sit over the bucket aggregate, not the corpus")
    }
  }
}
