package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for slow bench queries — times labeled sub-plans so
  * optimization targets the measured stage, not a guess. Not registered
  * in SparkEntry; run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def q(name: String) = graft.SparkEntry.queries(name)

    // warm the JIT/codegen once
    time("warmup")(Tables.documents(spark, sfDir).select(count(lit(1)).as("n")))

    val targets = if (args.nonEmpty) args.toSeq
      else Seq("d2_ngram_jaccard", "d3_minhash_lsh", "m5_dbscan_editdist",
        "m3_neighbor_clusters")
    for (t <- targets) time(s"$t.warm")(q(t)(spark, sfDir))
    for (rep <- 1 to 3; t <- targets) time(s"$t.$rep")(q(t)(spark, sfDir))

    spark.stop()
  }
}
