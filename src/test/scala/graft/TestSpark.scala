package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (never stopped —
  * suites run sequentially in the forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // composed-DBSCAN plans (stage-2 over stage-1 lineage) can reach
      // hundreds of MB as strings; cap what listeners/explain materialize
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
