package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Sort => LSort, Aggregate => LAggregate, GlobalLimit => LGlobalLimit, LocalLimit => LLocalLimit, LocalRelation => LLocalRelation, LogicalPlan, Join => LJoin}

/** Surface-wide scale-hazard audit: plans every registered query (no
  * execution) and flags the physical shapes that break at 100 TB:
  *
  *   - GLOBAL-WINDOW: a Window with an empty partitionSpec funnels the
  *     whole input through one task (the canonical scale-killer);
  *   - GLOBAL-SORT-NONFINAL: a global Sort that is not the query's
  *     outermost presentation ORDER BY (range-partitioned, but a full
  *     corpus sort mid-plan deserves a second look);
  *   - CARTESIAN: CartesianProduct in the physical plan;
  *   - SINGLE-PARTITION: an `Exchange SinglePartition` that is not the
  *     final result collection.
  *
  * Whitelisted query/hazard pairs are documented inline — each names the
  * reason the shape is bounded (e.g. the windowed frame is a ≤1000-row
  * aggregate, not the corpus). Exits non-zero on any unexplained hazard,
  * so it can gate like a test.
  *
  * usage: runMain graft.PlanAudit <sfDir> [queryName ...]
  */
object PlanAudit {

  /** hazards that are fine because the input to the offending operator is
    * provably bounded (post-aggregation scalars / top-k / fixed lattices),
    * with the bound stated. Keep this list SHORT and justified.
    */
  private val whitelist: Map[String, Set[String]] = Map(
    // the 10 permutation-rank windows run over a localCheckpoint of the
    // per-day revenue aggregate — the checkpoint truncates lineage so the
    // reducing Aggregate beneath is invisible to `reduced`. The frame is
    // calendar-bounded (≤ ~2.6k rows for the 7-year TPC-H shipdate range)
    // at every corpus size.
    "q384_permutation_null" -> Set("GLOBAL-WINDOW"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted

    var flagged = 0
    var planned = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (df.isStreaming) {
          // streaming plans are finalized per-microbatch; static audit n/a
        } else {
          planned += 1
          val opt = df.queryExecution.optimizedPlan
          val phys = df.queryExecution.sparkPlan.treeString

          val hazards = scala.collection.mutable.ListBuffer.empty[String]

          // "reduced" = every leaf under this node passes through an
          // operator that collapses corpus-scale cardinality before it:
          // an Aggregate (output ∝ group count, not input rows), a
          // Limit, or a LocalRelation (literal dim). A single-partition
          // window/sort over a reduced frame is O(groups), not O(corpus)
          // — bounded, not a scale hazard (it can still be LARGE if the
          // group key is high-cardinality; that subset is reported as
          // INFO for manual review, not flagged).
          def reduced(p: LogicalPlan): Boolean = p match {
            case _: LAggregate | _: LGlobalLimit |
                 _: LLocalLimit | _: LLocalRelation => true
            case j: LJoin => reduced(j.left) && reduced(j.right)
            case other if other.children.isEmpty => false
            case other => other.children.forall(reduced)
          }

          // 1. corpus-wide window: empty partitionSpec over an
          // unreduced (corpus-sized) input.
          var reducedWindows = 0
          opt.foreach {
            case w: LWindow if w.partitionSpec.isEmpty =>
              if (reduced(w.child)) reducedWindows += 1
              else hazards += "GLOBAL-WINDOW"
            case _ =>
          }

          // 2. global sort over an unreduced input that is not the
          // outermost presentation ORDER BY. A sort directly under a
          // Limit compiles to TakeOrderedAndProject (distributed
          // per-partition top-k + single merge of k·parts rows) — not
          // a global sort at all, so exclude those first.
          val underLimit = scala.collection.mutable.Set.empty[LSort]
          @annotation.tailrec
          def sortBelow(p: LogicalPlan): Option[LSort] = p match {
            case s: LSort => Some(s)
            case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
              sortBelow(pr.child)
            case ll: LLocalLimit => sortBelow(ll.child)
            case _ => None
          }
          opt.foreach {
            case l: LLocalLimit => sortBelow(l.child).foreach(underLimit += _)
            case l: LGlobalLimit => sortBelow(l.child).foreach(underLimit += _)
            case _ =>
          }
          val innerGlobalSorts = opt.collect {
            case s: LSort if s.global && !reduced(s.child) &&
              !underLimit.contains(s) => s
          }
          // the outermost sort (presentation ORDER BY) is expected:
          // range-partitioned, streams to the result. Walk the root
          // spine through row-preserving unary nodes to find it.
          @annotation.tailrec
          def spineSort(p: LogicalPlan): Option[LSort] = p match {
            case s: LSort => Some(s)
            case pr: org.apache.spark.sql.catalyst.plans.logical.Project => spineSort(pr.child)
            case _ => None
          }
          val presentation =
            spineSort(opt).count(innerGlobalSorts.contains)
          if (innerGlobalSorts.size > presentation)
            hazards += s"GLOBAL-SORT-NONFINAL(${innerGlobalSorts.size - presentation})"
          if (reducedWindows > 0 && hazards.isEmpty)
            println(s"INFO $name: $reducedWindows bounded global window(s) over aggregated frames")

          // 3/4. physical shapes
          if (phys.contains("CartesianProduct")) hazards += "CARTESIAN"
          val spExchanges = "Exchange SinglePartition".r.findAllIn(phys).size
          // a single trailing single-partition exchange under a global
          // limit/sort is presentation; more than one is structural
          if (spExchanges > 1) hazards += s"SINGLE-PARTITION($spExchanges)"

          val unexplained = hazards.filterNot(h =>
            whitelist.getOrElse(name, Set.empty).exists(h.startsWith))
          if (unexplained.nonEmpty) {
            flagged += 1
            println(s"FLAG $name: ${unexplained.mkString(", ")}")
          }
        }
      } catch {
        case e: Exception =>
          println(s"PLAN-ERR $name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("")}")
      }
    }
    println(s"\naudited $planned plans, $flagged flagged")
    spark.stop()
    if (flagged > 0) sys.exit(1)
  }
}
