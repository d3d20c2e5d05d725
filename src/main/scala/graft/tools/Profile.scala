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

    val ds = graft.ops.Dedup.docShingles(spark, sfDir)
    time("d2.shingles")(ds)
    val inv = ds.select(col("doc_id"),
      size(col("sh")).cast("long").as("n"), explode(col("sh")).as("g0"))
      .select(col("doc_id"), col("n"), xxhash64(col("g0")).as("g"))
    time("d2.inv")(inv)
    val joined = inv.select(col("g"), col("doc_id").as("da"), col("n").as("na"))
      .join(inv.select(col("g"), col("doc_id").as("db"), col("n").as("nb")),
        Seq("g"))
      .filter(col("da") < col("db"))
    time("d2.join")(joined)
    val grouped = joined
      .groupBy("da", "db", "na", "nb").agg(count(lit(1)).as("shared"))
    time("d2.grouped")(grouped)
    time("d2.full")(graft.ops.Dedup.queries.find(_.name == "d2_ngram_jaccard")
      .get.run(spark, sfDir))

    // m8 pieces
    val ue = Tables.events(spark, sfDir)
      .withColumn("hour", expr("ts div 3600000000000"))
      .select("user_id", "hour", "event_type").distinct()
    time("m8.ue")(ue)
    val e8 = ue.select(col("hour"), col("event_type"), col("user_id").as("ua"))
      .join(ue.select(col("hour"), col("event_type"),
        col("user_id").as("ub")), Seq("hour", "event_type"))
      .filter(col("ua") < col("ub"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
    time("m8.pairs")(e8)
    time("m8.full")(graft.ops.Cluster.queries
      .find(_.name == "m8_connected_components").get.run(spark, sfDir))

    // m2 (Spark ML minhash)
    time("m2.full")(graft.ops.Cluster.queries
      .find(_.name == "m2_minhash_ml").get.run(spark, sfDir))

    // prefix-filter d2 stages
    {
      val ds2 = graft.ops.Dedup.docShingles(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inv2 = ds2.select(col("doc_id"), explode(col("sh")).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("g"))
      val freq2 = inv2.groupBy("g").agg(count(lit(1)).as("f"))
      time("d2p.freq")(freq2)
      val prefix2 = inv2.join(freq2, Seq("g"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("f"), col("g")))).as("fg"))
        .select(col("doc_id"),
          expr("slice(fg, 1, size(fg) - CAST(ceil(0.5 * size(fg)) AS INT) + 1)").as("pfx"))
        .select(col("doc_id"), explode(col("pfx.g")).as("g"))
      time("d2p.prefix")(prefix2)
      val cand2 = prefix2.select(col("g"), col("doc_id").as("da"))
        .join(prefix2.select(col("g"), col("doc_id").as("db")), Seq("g"))
        .filter(col("da") < col("db"))
        .select("da", "db").distinct()
      time("d2p.cand")(cand2)
      println(s"[profile] d2p.cand.count ${cand2.count()}")
      ds2.unpersist()
    }

    // d2/d3/d5/m5/m6 after fixes
    time("d2.full2")(graft.ops.Dedup.queries
      .find(_.name == "d2_ngram_jaccard").get.run(spark, sfDir))
    time("d3.full")(graft.ops.Dedup.queries
      .find(_.name == "d3_minhash_lsh").get.run(spark, sfDir))
    time("d5.full")(graft.ops.Dedup.queries
      .find(_.name == "d5_embedding_neardup").get.run(spark, sfDir))
    time("m5.full")(graft.ops.Cluster.queries
      .find(_.name == "m5_dbscan_editdist").get.run(spark, sfDir))
    time("m6.full")(graft.ops.Cluster.queries
      .find(_.name == "m6_dbscan_jaccard").get.run(spark, sfDir))
    time("m8.full2")(graft.ops.Cluster.queries
      .find(_.name == "m8_connected_components").get.run(spark, sfDir))

    spark.stop()
  }
}
