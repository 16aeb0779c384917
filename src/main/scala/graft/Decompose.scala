package graft

import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall-clock decomposition of the heaviest
  * composite queries (q235 for now) — the measurement instrument behind
  * the optimization rounds' "where does the time actually go" claims
  * (guide §1.1 empirical loop). Replicates the operator's stages with
  * timers between them; NOT a query surface, never registered.
  *
  * usage: runMain graft.Decompose <sfDir> <reps> q235
  */
object Decompose {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    args.drop(2).foreach {
      case "q235" => (1 to reps).foreach { i =>
        println(s"q235 rep $i")
        val docs = Tables.documents(spark, sfDir)
        val perDoc = t("A perDoc counts+checkpoint") {
          Tables.fanout(docs.select(col("doc_id"), col("lang"), col("text"))
              .filter(length(col("text")) >= 2))
            .select(col("doc_id"), col("lang"),
              graft.functions.CharNGramCounts.char_ngram_counts(col("text"), 2).as("fcs"))
            .localCheckpoint() // eager: the stage's cost lands here
        }
        val lrRows = t("B fstats+tots+collect") {
          val fstats = perDoc
            .select(col("lang"), explode(col("fcs")).as("fc"))
            .select(col("lang"), col("fc.f").as("f"), col("fc.c").as("c"))
            .groupBy("f").agg(
              sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("kt"),
              sum(when(col("lang") =!= "en", col("c")).otherwise(0L)).as("kr"))
          val tots = fstats.agg(sum("kt").as("nt"), sum("kr").as("nr"),
            count(lit(1)).as("v"))
          fstats.crossJoin(broadcast(tots))
            .select(col("f"), round(expr(
              """ln((CAST(kt + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)) /
                |   (CAST(kr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)))""".stripMargin), 6)
              .cast("decimal(18,6)").as("lr"))
            .collect()
        }
        t("C score+histogram") {
          val lrMap = org.apache.spark.sql.GraftBridge.toColumn(
            org.apache.spark.sql.catalyst.expressions.Literal.create(
              lrRows.map(r => r.getString(0) -> r.getDecimal(1)).toMap,
              org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.DecimalType(18, 6),
                valueContainsNull = false)))
          val score = perDoc.select(col("doc_id"), col("lang"),
            graft.functions.CountMapDot.count_map_dot(col("fcs"), lrMap).as("score"))
          score.groupBy(col("lang"),
              floor(col("score").cast("double") / 10.0).cast("long").as("bucket"))
            .agg(count(lit(1)).as("n_docs"),
              round(sum(col("score")).cast("double") / count(lit(1)).cast("double"), 6)
                .as("mean_score"))
            .orderBy("lang", "bucket").count()
        }
        perDoc.unpersist(blocking = false)
      }
      case "q235a" => (1 to reps).foreach { i =>
        // split stage A: counting pass alone (noop sink, guide §1.4)
        // vs counting + checkpoint materialization
        println(s"q235a rep $i")
        val docs = Tables.documents(spark, sfDir)
        def pre = docs.filter(length(col("text")) >= 2)
          .select(col("doc_id"), col("lang"),
            graft.functions.CharNGramCounts.char_ngram_counts(col("text"), 2).as("fcs"))
        t("A1 counts->noop")(
          pre.write.format("noop").mode("overwrite").save())
        val ck = t("A2 counts->checkpoint")(pre.localCheckpoint())
        ck.unpersist(blocking = false)
      }
      case "q27" => (1 to reps).foreach { i =>
        // candidate-pair block (q27/q96/q126 family): is the pair join
        // hash-compare-bound or shuffle-bound? (VERDICT r12 item 9)
        println(s"q27 rep $i")
        import graft.functions.WordShingles.word_shingles
        val docs = Tables.documents(spark, sfDir)
        val sh = t("A shingle postings+ckpt") {
          Tables.fanout(docs.select(col("doc_id"), col("text"))
              .filter(size(split(col("text"), " ")) >= 4))
            .select(col("doc_id"), word_shingles(col("text"), 4).as("shs"))
            .withColumn("n_sh", size(col("shs")).cast("long"))
            .select(col("doc_id"), col("n_sh"), explode(col("shs")).as("shid"))
            .localCheckpoint()
        }
        val prefix = t("B df-rank + prefix filter") {
          val freq = sh.groupBy("shid").agg(count(lit(1)).as("df"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("df", "shid")
          val p = sh.join(freq, "shid")
            .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
            .filter(col("rn") <= col("n_sh") - ceil(lit(0.6) * col("n_sh")) + 1)
            .select(col("doc_id"), col("shid")).localCheckpoint()
          println(s"    prefix rows: ${p.count()}")
          p
        }
        val cands = t("C candidate self-join+distinct") {
          val c = prefix.as("a")
            .join(prefix.as("b"),
              col("a.shid") === col("b.shid") && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
            .distinct().localCheckpoint()
          println(s"    candidate pairs: ${c.count()}")
          c
        }
        t("D verify join (2x postings)") {
          cands
            .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
            .join(sh.as("y"),
              col("doc_b") === col("y.doc_id") && col("x.shid") === col("y.shid"))
            .groupBy("doc_a", "doc_b")
            .agg(count(lit(1)).as("common"),
              min(col("x.n_sh")).as("n_a"), min(col("y.n_sh")).as("n_b"))
            .write.format("noop").mode("overwrite").save()
        }
        sh.unpersist(blocking = false); prefix.unpersist(blocking = false)
        cands.unpersist(blocking = false)
      }
      case "q414" => (1 to reps).foreach { i =>
        // adaptive-tuning floor: where do the 10 MLlib fits spend time?
        // (VERDICT r12 item 5 — measured delta or floor decomposition)
        println(s"q414 rep $i")
        graft.ml.Scoring.resetMemo() // measure the search itself, uncached
        val feats = graft.ml.Scoring.featurize(Tables.embeddings(spark, sfDir))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        feats.count()
        val tr0 = feats.filter(expr("pmod(vec_id * 37, 10) < 8"))
          .filter(expr("pmod(vec_id * 53, 10) < 8"))
        val va0 = feats.filter(expr("pmod(vec_id * 37, 10) < 8"))
          .filter(expr("pmod(vec_id * 53, 10) >= 8"))
        t("one fit, maxIter=8") {
          new org.apache.spark.ml.classification.LogisticRegression()
            .setFeaturesCol("features").setLabelCol("y")
            .setMaxIter(8).setRegParam(0.01).fit(tr0)
        }
        val m50 = t("one fit, maxIter=50") {
          new org.apache.spark.ml.classification.LogisticRegression()
            .setFeaturesCol("features").setLabelCol("y")
            .setMaxIter(50).setRegParam(0.01).fit(tr0)
        }
        t("one evaluator pass") {
          new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
            .setLabelCol("y").evaluate(m50.transform(va0))
        }
        t("full adaptive search (6+3+1 fits)") {
          graft.ml.Scoring.adaptiveTuningAudit(spark, sfDir).count()
        }
        feats.unpersist(blocking = false)
      }
      case "stats" =>
        // what does the fanout size gate actually see at each call site?
        val docs = Tables.documents(spark, sfDir)
        def st(label: String, d: org.apache.spark.sql.DataFrame): Unit =
          println(f"  $label%-34s sizeInBytes=${d.queryExecution.optimizedPlan.stats.sizeInBytes} parts=${d.rdd.getNumPartitions}")
        st("documents raw", docs)
        st("shingle site", docs.select(col("doc_id"), col("text"))
          .filter(size(split(col("text"), " ")) >= 4))
        st("dsir site", docs.select(col("doc_id"), col("lang"), col("text"))
          .filter(length(col("text")) >= 2))
        st("lineitem raw", Tables.lineitem(spark, sfDir))
        st("basket site", Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey"))
      case "q235plan" =>
        // the stage-A frame's plan BEFORE checkpointing (the committed
        // q235 plan files are checkpoint-hidden past this frame)
        val docs = Tables.documents(spark, sfDir)
        val pre = docs.filter(length(col("text")) >= 2)
          .select(col("doc_id"), col("lang"),
            graft.functions.CharNGramCounts.char_ngram_counts(col("text"), 2).as("fcs"))
        println(pre.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case other => println(s"unknown target $other")
    }
    spark.stop()
  }
}
