package graft

/** Dev tool: print the physical plan of a query.
  * usage: runMain graft.Plan <sfDir> <queryName> [fmt]
  * Default prints the AQE-finalized executed plan treeString; pass "fmt"
  * to ALSO print explain("formatted") (pre-execution plan with the
  * numbered operator list, PushedFilters/ReadSchema details — the shape
  * the plans/r12 evidence files pin).
  */
object Plan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // q351 returns a checkpointed frame (its plan must be built under a
    // constraint-propagation-off execution window) — for plan evidence,
    // additionally print the INNER cascade plan under that same window.
    if (args(1) == "q351_forget_cascade" && args.length > 2 && args(2) == "fmt") {
      spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
      val inner = ops.Lifecycle.forgetCascadePlan(
        Tables.customer(spark, args(0)), Tables.orders(spark, args(0)),
        Tables.lineitem(spark, args(0)), Tables.events(spark, args(0)))
      println("== inner cascade plan, constraint propagation OFF ==")
      println(inner.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.conf.unset("spark.sql.constraintPropagation.enabled")
    }
    if (args.length > 2 && args(2) == "fmt") {
      println("== explain(formatted), pre-execution ==")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    df.count() // let AQE finalize
    println("== executed plan (AQE final) ==")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
