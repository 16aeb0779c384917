package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev evidence tool: pre-checkpoint stage plans for the r13 plan files
  * (the full q27/q235 query plans are checkpoint-hidden past these
  * frames, like the r12 q235/q344 captures). */
object PlanStage {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    args(1) match {
      case "q235stage" =>
        val docs = Tables.documents(spark, sfDir)
        val pre = Tables.fanout(
            docs.select(col("doc_id"), col("lang"), col("text"))
              .filter(length(col("text")) >= 2))
          .select(col("doc_id"), col("lang"),
            graft.functions.CharNGramCounts.char_ngram_counts(col("text"), 2).as("fcs"))
        println("== q235 stage-A (per-doc counting) frame, pre-checkpoint ==")
        println(pre.queryExecution.explainString(FormattedMode))
      case "q27stage" =>
        import graft.functions.WordShingles.word_shingles
        val docs = Tables.documents(spark, sfDir)
        val pre = Tables.fanout(docs.select(col("doc_id"), col("text"))
            .filter(size(split(col("text"), " ")) >= 4))
          .select(col("doc_id"), word_shingles(col("text"), 4).as("shs"))
          .withColumn("n_sh", size(col("shs")).cast("long"))
          .select(col("doc_id"), col("n_sh"), explode_outer(col("shs")).as("shid"))
        println("== q27 shingle-postings frame, pre-checkpoint ==")
        println(pre.queryExecution.explainString(FormattedMode))
      case "q171stage" =>
        val li = Tables.lineitem(spark, sfDir)
        val part = Tables.part(spark, sfDir)
        val pre = Tables
          .fanout(li.select("l_orderkey", "l_partkey"), col("l_orderkey"))
          .join(broadcast(part.select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_set(col("p_brand"))).as("bs"))
          .select("bs")
        println("== q171 basket-sets frame, pre-checkpoint ==")
        println(pre.queryExecution.explainString(FormattedMode))
      case q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        println(s"== $q explain(formatted), pre-execution ==")
        println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
