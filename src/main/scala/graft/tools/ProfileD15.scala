package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for d15: materializes each intermediate of
  * prefixFilterHalf separately and prints wall-time + row counts, so
  * an sf1 regression can be attributed to a stage instead of guessed.
  * Not registered; run via
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileD15`. */
object ProfileD15 {
  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // honors the Bench local-cluster envs so a multi-executor /
    // memory-constrained failure can be attributed to a stage too
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val b0 = SparkSession.builder().master(master)
      .appName("profile-d15")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
    val b1 =
      if (master.startsWith("local-cluster"))
        b0.config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      else b0
    val s = sys.env.get("SPARK_GRAFT_JARS")
      .fold(b1)(j => b1.config("spark.jars", j)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    import graft.Tables

    // mirrors the registered staging: fused codegen'd ngramHash64
    // (round-9 — the old transform/slice/array_join + xxhash64 string
    // path measured 39 s of the 44 s sf1 total in this profiler)
    val toksRaw = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        explode(array_distinct(
          graft.plans.NativeFunctions.ngramHash64(
            graft.functions.tokens(col("text")), 4))).as("tok"))

    // stage 1: shingle + hash
    val toks = toksRaw.persist()
    val nToks = time("toks(hash+explode)") { toks.count() }
    println(s"[profile]   rows=$nToks")

    // stage 2: windows + prefix
    import org.apache.spark.sql.expressions.Window
    val wDf = Window.partitionBy("tok")
    val wDoc = Window.partitionBy("doc_id")
    val wRank = Window.partitionBy("doc_id").orderBy("df", "tok")
    val prefix = toks
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("s", count(lit(1)).over(wDoc))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= col("s") - expr("(s + 1) div 2") + 1)
      .select(col("doc_id"), col("tok"), col("s"), col("rn"))
      .persist()
    val nPrefix = time("prefix(windows)") { prefix.count() }
    println(s"[profile]   rows=$nPrefix")

    // stage 3: candidate join (with the PPJoin filters)
    val cand = prefix
      .select(col("doc_id").as("ida"), col("tok"), col("s").as("sa"),
        col("rn").as("ra"))
      .join(prefix.select(col("doc_id").as("idb"), col("tok"),
        col("s").as("sb"), col("rn").as("rb")), Seq("tok"))
      .filter(col("ida") < col("idb"))
      .filter(greatest(col("sa"), col("sb")) <=
        least(col("sa"), col("sb")) * 2)
      .filter(least(col("ra"), col("rb")) +
        least(col("sa") - col("ra"), col("sb") - col("rb")) >=
        expr("(sa + sb + 2) div 3"))
      .select("ida", "idb", "sa", "sb").distinct()
      .persist()
    val nCand = time("cand(prefix join)") { cand.count() }
    println(s"[profile]   rows=$nCand")

    // stage 3b: candidate join WITHOUT the PPJoin filters
    val cand0 = prefix
      .select(col("doc_id").as("ida"), col("tok"), col("s").as("sa"))
      .join(prefix.select(col("doc_id").as("idb"), col("tok"),
        col("s").as("sb")), Seq("tok"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "sa", "sb").distinct()
    val nCand0 = time("cand0(no ppjoin)") { cand0.count() }
    println(s"[profile]   rows=$nCand0")

    // stage 4: verify join
    val ver = toks.select(col("doc_id").as("ida"), col("tok"))
      .join(cand, Seq("ida"))
      .join(toks.select(col("doc_id").as("idb"), col("tok")),
        Seq("idb", "tok"))
      .groupBy("ida", "idb", "sa", "sb").agg(count(lit(1)).as("c"))
      .filter(col("c") * 1.0 / (col("sa") + col("sb") - col("c")) >= 0.5)
    val nVer = time("verify join") { ver.count() }
    println(s"[profile]   rows=$nVer")

    // whole query as registered, fresh lineage
    time("full query") {
      graft.SparkEntry.queries("d15_prefix_filter")(s, d)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
