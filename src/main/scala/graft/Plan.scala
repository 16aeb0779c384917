package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Plan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: $n rows ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val shingles = docs.select(col("doc_id"), split(col("text")," ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"), expr("array_distinct(transform(sequence(0, size(t) - 4), i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3])))").as("shs"))
    val sh0 = shingles.select(col("doc_id"), explode(col("shs")).as("sh")).select(col("doc_id"), xxhash64(col("sh")).as("shid"))
    time("exploded")(sh0.count())
    val w = Window.partitionBy("doc_id")
    val sh = sh0.withColumn("n_sh", count(lit(1)).over(w))
    time("windowed")(sh.count())
    val shc = sh.localCheckpoint()
    time("checkpointed")(shc.count())
    val pairs = shc.as("a").join(shc.as("b"), col("a.shid")===col("b.shid") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("common"))
    time("pairs")(pairs.count())
    time("pairs2")(pairs.count())
    spark.stop()
  }
}
