package graft.tools

import graft.{Caches, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session A/B for the m2_minhash_ml staging (round-9 watch item:
  * 1.85 s r7 → 2.29 s r9 standalone, code between r7 and r9 swapped the
  * shingle staging from interpreted string n-grams to the codegen'd
  * ngramHash64 fingerprints). Both variants run in ONE session on the
  * same host, alternating, several reps each — if the hashed staging
  * were the regression the string column would win here; a shared
  * inflation instead marks the drift host-borne (the d8/j15/d11 class).
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.ProfileM2"
  */
object ProfileM2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), graft.functions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)

    // the two stagings under test
    def hashedShingles = docsTok.select(col("doc_id"), array_distinct(
      graft.plans.NativeFunctions.ngramHash64(col("toks"), 3)).as("sh"))
    def stringShingles = docsTok.select(col("doc_id"), array_distinct(
      graft.functions.wordNgrams(col("toks"), 3)).as("sh"))

    def runOnce(name: String, mk: => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      val n = Similarity.minhashJoin(mk, "doc_id", "sh", 0.5)
        .select(col("ida"), col("idb"),
          round(lit(1.0) - col("dist"), 4).as("jac"))
        .orderBy("ida", "idb")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Caches.drain()
      System.err.println(f"[m2ab] $name%-8s $wall%6.2f s")
      wall
    }

    // warm both paths (JIT + codegen), discard
    runOnce("warm-h", hashedShingles)
    runOnce("warm-s", stringShingles)
    val reps = sys.env.getOrElse("SPARK_GRAFT_M2_REPS", "4").toInt
    val h = (1 to reps).map(_ => runOnce("hashed", hashedShingles))
    val s = (1 to reps).map(_ => runOnce("string", stringShingles))
    println(f"""{"metric":"m2_ab","sf":"${sfDir.split('/').last}",""" +
      f""""hashed_min":${h.min}%.2f,"hashed_med":${h.sorted.apply(reps / 2)}%.2f,""" +
      f""""string_min":${s.min}%.2f,"string_med":${s.sorted.apply(reps / 2)}%.2f}""")
    spark.stop()
  }
}
