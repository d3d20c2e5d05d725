// probe: time m5 + d6 in isolation, 2 reps each
package graft.tools
object M5Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val qs = graft.SparkEntry.queries
    for (name <- Seq("m5_dbscan_editdist", "m6_dbscan_jaccard", "d6_dedup_groups", "m8_connected_components"); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      qs(name)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
