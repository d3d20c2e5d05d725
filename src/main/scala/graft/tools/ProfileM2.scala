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
  * Round-10 instrumentation (VERDICT #5 — name the staging-SWITCH
  * transient: the first minhashJoin after switching variants spiked
  * ~9–10 s in both directions in the round-9 second session): each run
  * now records, alongside wall time,
  *  - the DELTA in whole-stage-codegen compilations and compile
  *    milliseconds (`CodegenMetrics` — generated-class compilation is
  *    driver-side and invisible to job/stage accounting), and
  *  - the summed duration of the Spark jobs the run launched (listener)
  * so a spike decomposes into driver codegen vs executor work vs
  * unaccounted (GC/scheduler). SPARK_GRAFT_M2_ALTERNATE=true runs
  * h,s,h,s,… instead of the grouped h*reps,s*reps, putting a variant
  * switch before EVERY measured run — the reproducer shape.
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

    // job-duration accounting: jobs started/ended between two marks
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { starts.put(e.jobId, e.time); () }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(e.jobId))
            .foreach(t0 => jobMs.addAndGet(e.time - t0))
          ()
        }
      })
    // whole-stage-codegen compilation cost (driver-side janino work —
    // the prime suspect for a first-run-after-switch spike: the two
    // stagings generate DIFFERENT source, and the codegen cache is
    // keyed by source text, so a switch recompiles every stage)
    def codegen(): (Long, Double) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      // count is exact; the per-compile ms histogram is a decaying
      // reservoir, so the mean is representative, not a total
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getMean)
    }

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
      val (c0, _) = codegen()
      val jm0 = jobMs.get()
      val t0 = System.nanoTime()
      Similarity.minhashJoin(mk, "doc_id", "sh", 0.5)
        .select(col("ida"), col("idb"),
          round(lit(1.0) - col("dist"), 4).as("jac"))
        .orderBy("ida", "idb")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (c1, meanMs) = codegen()
      val jm = (jobMs.get() - jm0) / 1e3
      Caches.drain()
      System.err.println(f"[m2ab] $name%-8s $wall%6.2f s  " +
        f"jobs=$jm%5.2f s  codegen_compiles=+${c1 - c0}%3d " +
        f"(recent mean $meanMs%.0f ms/compile)")
      wall
    }

    // warm both paths (JIT + codegen), discard
    runOnce("warm-h", hashedShingles)
    runOnce("warm-s", stringShingles)
    val reps = sys.env.getOrElse("SPARK_GRAFT_M2_REPS", "4").toInt
    val alternate =
      sys.env.get("SPARK_GRAFT_M2_ALTERNATE").contains("true")
    val (h, s) =
      if (alternate) {
        val pairs = (1 to reps).map { _ =>
          (runOnce("hashed", hashedShingles),
            runOnce("string", stringShingles))
        }
        (pairs.map(_._1), pairs.map(_._2))
      } else {
        ((1 to reps).map(_ => runOnce("hashed", hashedShingles)),
          (1 to reps).map(_ => runOnce("string", stringShingles)))
      }
    println(f"""{"metric":"m2_ab","sf":"${sfDir.split('/').last}",""" +
      f""""alternate":$alternate,""" +
      f""""hashed_min":${h.min}%.2f,"hashed_med":${h.sorted.apply(reps / 2)}%.2f,""" +
      f""""string_min":${s.min}%.2f,"string_med":${s.sorted.apply(reps / 2)}%.2f}""")
    spark.stop()
  }
}
