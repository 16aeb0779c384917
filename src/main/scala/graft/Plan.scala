package graft

/** Dev tool: print the executed physical plan of a query.
  * usage: runMain graft.Plan <sfDir> <queryName>
  */
object Plan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.count() // let AQE finalize
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
