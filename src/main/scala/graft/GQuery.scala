package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark-native implementation plus an
  * optional DuckDB oracle (ANSI SQL over the same parquet tables). Queries
  * without an oracle get the driver's weaker rows-only check; they must have
  * a ScalaTest spec instead.
  *
  * Determinism contract: every query ends in an explicit orderBy over a
  * unique key, floats are rounded, and timestamps are formatted/epoch-cast,
  * so the result is bit-stable across engines and row orders.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[GQuery]
}
