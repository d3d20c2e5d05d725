package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}

/** Loaders for the harness parquet tables (see TESTDATA.md).
  *
  * Always load through here: reads stay plain parquet scans so Catalyst
  * pushes filters/projections down to the file source (verify with
  * `.explain("formatted")` — `PushedFilters`/`ReadSchema` must reflect the
  * query, not `*`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark 4.x rejects
    // unless read as a plain long (nanoseconds since epoch). Runtime conf is
    // idempotent; set it here so every session (Verify, Bench, tests) is safe.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events` with `ts` normalized to epoch NANOSECONDS as long — the
    * engine's canonical event-time unit. Harness generations have shipped
    * `ts` both as INT64 TIMESTAMP(NANOS) (read as long via `nanosAsLong`)
    * and as TIMESTAMP[us] (read as TIMESTAMP_NTZ); the adapter accepts
    * either, so every downstream operator keeps one integer time axis.
    * TIMESTAMP_NTZ → instant uses the session zone, which build.sbt pins
    * to UTC — the same reading DuckDB's `epoch_ns`/`epoch_us` apply in
    * the oracles (identical on TIMESTAMP_NS and TIMESTAMP_US inputs, so
    * the oracle SQL needs no change across harness generations). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
