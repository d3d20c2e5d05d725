package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Action-shaped long-tail operators (SURVEY.md §2.1): JSON sink (S6),
  * text sink (S7), cache + seeded sample (S9), accumulator (S10),
  * isEmpty probe (P9). */
class SourcesSinksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("S6: JSON sink round-trips rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_json").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir).select(col("id").cast("long"), col("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("S7: text sink writes one line per row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_text").toString + "/out"
    Seq("line1", "line2", "line3").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val back = spark.read.text(dir).as[String].collect().sorted
    assert(back.toSeq == Seq("line1", "line2", "line3"))
  }

  test("S9: cache/checkpoint keep results identical; seeded sample deterministic") {
    import spark.implicits._
    val df = spark.range(1000).toDF("id").cache()
    val before = df.agg(sum("id")).head().getLong(0)
    val after = df.agg(sum("id")).head().getLong(0)
    assert(before == after && before == 499500L)
    // localCheckpoint truncates lineage (the iterative-algorithm pattern)
    val cp = df.localCheckpoint(eager = true)
    assert(cp.agg(sum("id")).head().getLong(0) == 499500L)
    df.unpersist()
    val s1 = spark.range(1000).sample(withReplacement = false, 0.1, seed = 42)
      .collect().toSeq
    val s2 = spark.range(1000).sample(withReplacement = false, 0.1, seed = 42)
      .collect().toSeq
    assert(s1 == s2 && s1.nonEmpty && s1.size < 400)
  }

  test("S10: longAccumulator counts per-row observations in a pass") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("malformed")
    val df = Seq("ok", "", "ok", "", "").toDF("v")
    df.as[String].foreach(v => if (v.isEmpty) acc.add(1L))
    assert(acc.value == 3L)
  }

  test("P9: isEmpty probe") {
    import spark.implicits._
    assert(spark.emptyDataset[String].isEmpty)
    assert(!Seq(1).toDS().isEmpty)
    assert(Seq(1, 2, 3).toDS().filter(_ > 10).isEmpty)
  }

  test("S11: partitioned parquet sink controls layout AND file count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString + "/out"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    // the at-scale output recipe: repartition on the partition column
    // BEFORE partitionBy, so each Hive partition is written by the one
    // task that owns it — without this every task writes a sliver into
    // every partition and a 1000-executor job emits numTasks×numLangs
    // small files, the classic 100 TB sink mistake
    docs.repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val langs = docs.select("lang").distinct().as[String].collect()
    val root = new java.io.File(dir)
    val partDirs = root.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(partDirs.toSeq == langs.map(l => s"lang=$l").sorted.toSeq,
      s"expected one directory per lang, got ${partDirs.mkString(",")}")
    for (pd <- partDirs) {
      val files = new java.io.File(root, pd).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"$pd: expected 1 file after key repartition, got ${files.length}")
    }
    // partition pruning: a lang filter must prune to one directory
    val pruned = spark.read.parquet(dir).filter(col("lang") === langs.head)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.toString.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must reach PartitionFilters, got:\n$scan")
    // round-trip equality
    val back = spark.read.parquet(dir)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    val orig = docs.as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == orig.toSeq)
  }

  test("S16: roundtrip agg's lang filter prunes partitions in the plan") {
    val dir = Files.createTempDirectory("graft_s16spec").toString + "/out"
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "lang", "n_chars")
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val agg = graft.ops.Sources.partitionPrunedAgg(spark.read.parquet(dir))
    val scan = agg.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("FileScan"))
      .getOrElse(fail("no FileScan leaf in s16 plan"))
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang predicate must land in PartitionFilters:\n$scan")
    // and n_chars/source must be the ONLY data columns read
    assert(scan.contains("ReadSchema") &&
      !scan.contains("doc_id"),
      s"doc_id should be pruned from ReadSchema:\n$scan")
  }
}
