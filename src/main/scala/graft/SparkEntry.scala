package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered query module: the relational core
  * (SURVEY.md §2.1–2.8), the trace-analytics layer (§2 A10/F/M9), and
  * the LLM-pipeline layer (dedup / ANN / text analysis). Non-SQL
  * operators (LSH, DBSCAN, CC) are exercised by ScalaTest specs instead
  * of DuckDB oracles.
  */
object SparkEntry {

  /** All query modules, in registration order. */
  def modules: Seq[QueryModule] = Seq(
    graft.ops.Relational,
    graft.ops.Trace,
    graft.ops.Dedup,
    graft.ops.TextAnalysis,
    graft.ops.Ann,
    graft.ops.Cluster,
    graft.ops.Sources,
    graft.ops.Skew,
    graft.ops.Pipeline)

  private lazy val all: Seq[GQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * M9 equal-process grouping — the reference's Part-1 headline answer. */
  def entry(spark: SparkSession): DataFrame =
    queries("t8_equal_groups")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
