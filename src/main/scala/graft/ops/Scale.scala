package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.Tables._

/** Scale-readiness operators (SURVEY.md §7.4.7, the 100 TB posture):
  * skew-resistant aggregation via salting and co-located joins via
  * bucketed tables. These are the techniques the engine reaches for when
  * AQE's runtime skew handling isn't enough (hot keys known a priori,
  * repeated joins on the same key).
  */
object Scale extends QueryModule {

  /** Two-phase salted aggregation: counts/sums for heavy-hitter keys are
    * pre-combined under `salt` sub-keys before the final combine, so no
    * single reducer owns a hot key's whole row set. Result is identical
    * to a direct groupBy (sums/counts are associative); only the shuffle
    * distribution changes.
    */
  def saltedCount(df: DataFrame, key: String, salt: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))

  /** Bucketed-table co-located join: write both sides bucketed by the
    * join key, then join the catalog tables — the physical plan has NO
    * Exchange on either side (verified in ScaleSpec). At 100 TB this is
    * the difference between re-shuffling two fact tables per query and
    * never shuffling them at all.
    *
    * The bucketed tables are CATALOG objects (bucketing requires
    * saveAsTable): the caller owns the `dbPrefix` namespace and cleanup
    * via [[dropBucketedTables]]; concurrent callers must use distinct
    * prefixes (mode=overwrite races on a shared name).
    */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, dbPrefix: String): DataFrame = {
    val lt = s"${dbPrefix}_l"
    val rt = s"${dbPrefix}_r"
    left.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(lt)
    right.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(rt)
    spark.table(lt).join(spark.table(rt), key)
  }

  /** Cleanup for [[bucketedJoin]]'s catalog tables (call after the joined
    * result is consumed — the join plan reads the tables lazily).
    */
  def dropBucketedTables(spark: SparkSession, dbPrefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `${dbPrefix}_l`")
    spark.sql(s"DROP TABLE IF EXISTS `${dbPrefix}_r`")
  }

  private val saltedOracle = """
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type"""

  override def queries: Seq[Q] = Seq(
    // salted two-phase aggregation provably equals the direct groupBy —
    // the oracle is the plain GROUP BY
    Q("q58_salted_counts",
      (s, d) => saltedCount(events(s, d), "event_type").orderBy("event_type"),
      Some(saltedOracle)),
  )
}
