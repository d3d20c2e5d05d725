package graft.tools

import graft.ops.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation measured at scale. SkewAndBucketSpec locks the
  * MECHANICS (salted == plain result; AQE splits the skewed
  * partition); this measures the WALL-TIME story the j9 operator
  * exists for, on a synthetic-but-deterministic fact⋈dim join whose
  * hot key owns 30% of the fact:
  *
  *  - fact: `rows` rows (default 20M), key = 0 for the hash-selected
  *    30%, else uniform over `dimRows` keys — a one-hot-key zipf head,
  *    the worst shuffle shape;
  *  - dim: `dimRows` rows (default 2M — ABOVE the broadcast threshold,
  *    because a broadcastable dim is the no-skew-problem case);
  *  - variants: plain sort-merge join (AQE off — the straggler
  *    baseline), `Skew.saltedJoin` (salts=8), and AQE with skew-join
  *    splitting enabled. Identical aggregate on top; row-count
  *    asserted equal across variants.
  *
  * Prints one JSON line {"metric":"skew_bench",...} with per-variant
  * seconds (min over `SPARK_GRAFT_SKEW_REPS`, default 2).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val dimRows = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIM", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SKEW_REPS", "2").toInt
    val salts = sys.env.getOrElse("SPARK_GRAFT_SKEW_SALTS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic skew: xxhash64 selects 30% of rows onto key 0
    def fact: DataFrame = spark.range(rows).select(
      when(pmod(xxhash64(col("id")), lit(10)) < 3, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(dimRows)))
        .as("k"),
      (col("id") % 97).as("v"))
    def dim: DataFrame = spark.range(dimRows).select(
      col("id").as("k"), (col("id") % 25).as("grp"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    def run(name: String)(mk: => DataFrame): (String, Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, df.agg(sum("n")).head().getLong(0))
      }
      once() // warm
      val runs = (1 to reps).map(_ => once())
      val best = runs.map(_._1).min
      System.err.println(f"[skewbench] $name%-12s $best%7.2f s  " +
        f"rows=${runs.head._2}")
      (name, best, runs.head._2)
    }

    val plain = run("plain_smj") { agg(fact.join(dim, Seq("k"))) }
    val salted = run(s"salted_$salts") {
      agg(Skew.saltedJoin(fact, dim, "k", salts)) }
    // AQE skew split: same plain join under adaptive execution
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
    val aqe = run("aqe_skew") { agg(fact.join(dim, Seq("k"))) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val counts = Set(plain._3, salted._3, aqe._3)
    require(counts.size == 1, s"variant row counts diverge: $counts")
    println(f"""{"metric":"skew_bench","rows":$rows,"dim":$dimRows,""" +
      f""""hot_share":0.3,"plain_smj":${plain._2}%.2f,""" +
      f""""salted_$salts":${salted._2}%.2f,"aqe_skew":${aqe._2}%.2f}""")
    spark.stop()
  }
}
