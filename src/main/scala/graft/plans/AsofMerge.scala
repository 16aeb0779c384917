package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Distributed (no-broadcast) AS-OF join — the scale path for
  * [[AsofLookup]] when the point-in-time dimension exceeds the broadcast
  * cap. Same semantics as the native operator and DuckDB `ASOF JOIN`
  * (backward, inner): each left row pairs with the LAST right row whose
  * `rightOn` <= `leftOn`; left rows with a null key or no preceding era
  * are dropped.
  *
  * Scale shape: a range-partitioned merge. Both sides are tagged and
  * union'd, range-repartitioned on the key (equal keys land in one
  * partition), and sorted within partitions with dims ordered before
  * facts at equal keys. One bounded pre-pass collects only the LAST dim
  * row per partition (numPartitions rows to the driver, never the data);
  * a prefix scan turns those into the carry-in era for each partition,
  * broadcast back so partition-head facts that precede their partition's
  * first dim still join the era from an earlier partition. Total cost:
  * one range shuffle of facts+dims and two narrow passes — no broadcast
  * of the dimension, no global sort, no driver materialization. This is
  * the shape that survives a 10^9-row dimension.
  */
object AsofMerge {

  def asofMergeJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftOn: Column, rightOn: Column, numPartitions: Int = 0): DataFrame = {
    val spark = leftDf.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val leftCols = leftDf.columns.toSeq
    val rightCols = rightDf.columns.toSeq
    val lType = StructType(leftDf.schema.fields)
    val rType = StructType(rightDf.schema.fields)

    val l = leftDf.withColumn("__k", leftOn).filter(col("__k").isNotNull)
    // dedup dims per key: the asof survivor among duplicate-key eras is
    // the row-number-1 row under a full-column descending order — a
    // deterministic, partitioning-independent choice (same discipline as
    // the native operator's byte-wise secondary sort)
    val byKey = Window.partitionBy("__k")
      .orderBy(rightCols.map(c => col(c).desc_nulls_last): _*)
    val r = rightDf.withColumn("__k", rightOn).filter(col("__k").isNotNull)
      .withColumn("__rn", row_number().over(byKey))
      .filter(col("__rn") === 1).drop("__rn")

    val lTagged = l.select(col("__k"), lit(0).as("__d"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rTagged = r.select(col("__k"), lit(1).as("__d"),
      lit(null).cast(lType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))

    // dims sort BEFORE facts at equal keys (__d desc) so a fact at
    // exactly an era boundary joins that era (<= semantics)
    val sorted = lTagged.unionByName(rTagged)
      .repartitionByRange(n, col("__k"))
      .sortWithinPartitions(col("__k").asc, col("__d").desc)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: last dim row of each partition (<= numPartitions rows to
    // the driver — partition METADATA, not data)
    val lastDim: Array[Row] = rdd.mapPartitionsWithIndex { (i, it) =>
      var last: Row = null
      it.foreach { row => if (row.getInt(1) == 1) last = row.getAs[Row](3) }
      Iterator.single((i, last))
    }.collect().sortBy(_._1).map(_._2)

    // prefix scan: carry(i) = latest dim in any partition before i
    val carry = new Array[Row](lastDim.length)
    var run: Row = null
    var i = 0
    while (i < lastDim.length) {
      carry(i) = run
      if (lastDim(i) != null) run = lastDim(i)
      i += 1
    }
    val bcCarry = spark.sparkContext.broadcast(carry)

    // pass 2: merge — running last-dim seeded with the carry-in era
    val outSchema = StructType(
      leftDf.schema.fields ++ rightDf.schema.fields.map(_.copy(nullable = true)))
    val joined = rdd.mapPartitionsWithIndex { (pi, it) =>
      var last: Row = if (pi < bcCarry.value.length) bcCarry.value(pi) else null
      it.flatMap { row =>
        if (row.getInt(1) == 1) { last = row.getAs[Row](3); Iterator.empty }
        else if (last == null) Iterator.empty // inner asof: no era yet
        else Iterator.single(
          Row.fromSeq(row.getAs[Row](2).toSeq ++ last.toSeq))
      }
    }
    spark.createDataFrame(joined, outSchema)
  }
}
