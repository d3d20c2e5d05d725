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

    // warm the JIT/codegen once
    time("warmup")(Tables.documents(spark, sfDir).select(count(lit(1)).as("n")))
    time("warmup2")(graft.ops.Relational.queries
      .find(_.name == "a14_percentiles").get.run(spark, sfDir))

    // a14: does the repartition exchange carry full lineitem width?
    for (rep <- 1 to 2) {
      time(s"a14.asis.$rep")(graft.ops.Relational.queries
        .find(_.name == "a14_percentiles").get.run(spark, sfDir))
      time(s"a14.preselect.$rep")(Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_extendedprice")
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 2).as("p50"),
          round(element_at(col("ps"), 2), 2).as("p90"),
          round(element_at(col("ps"), 3), 2).as("p99"))
        .orderBy("l_returnflag"))
      time(s"a14.norep.$rep")(Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 2).as("p50"),
          round(element_at(col("ps"), 2), 2).as("p90"),
          round(element_at(col("ps"), 3), 2).as("p99"))
        .orderBy("l_returnflag"))
    }

    // d3 / m3: is the candidate subtree re-evaluated across branches?
    for (rep <- 1 to 2) {
      time(s"d3.full.$rep")(graft.ops.Dedup.queries
        .find(_.name == "d3_minhash_lsh").get.run(spark, sfDir))
      time(s"m3.full.$rep")(graft.ops.Cluster.queries
        .find(_.name == "m3_neighbor_clusters").get.run(spark, sfDir))
      time(s"d6.full.$rep")(graft.ops.Dedup.queries
        .find(_.name == "d6_dedup_groups").get.run(spark, sfDir))
    }

    spark.stop()
  }
}
