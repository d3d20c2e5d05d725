package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: dump our part-1 dedup'd log for data_processes_v2 so
  * it can be compared offline against the reference's committed
  * part1Output.txt. Not registered; dev tooling only.
  *
  * Finding (2026-08-12): our output matches the golden in structure —
  * 166 rows, 16 groups, and a conflict-free BIJECTION between our
  * cluster letters and the reference's (A→G, B→E, C→C, D→F, E→A, F→B),
  * i.e. the server clustering itself is identical. Full row equality is
  * not reachable deterministically: the reference picks each group's
  * representative as `equal_processes[0]` of an unspecified Python
  * collect order, and its letter order came from a random-seed LSH run.
  * The committed invariant comparison is TracePipelineSpec's partition
  * golden (exact 16-group membership match). */
object GoldenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val logs = graft.trace.TracePipeline.readLogJson(spark,
      "/root/reference/Data/data_processes_v2.json")
    val (_, dedup) = graft.trace.TracePipeline.part1(spark, logs)
    dedup.coalesce(1).write.mode("overwrite")
      .json("/tmp/graft_v2_dedup")
    spark.stop()
  }
}
