package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark DataFrame program plus (optionally) the
  * equivalent DuckDB SQL the driver replays as the correctness oracle.
  * `oracle = None` => driver records a weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[Q]
}
