package graft.tools

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for m2_minhash_ml (round-7 perf work). */
object ProfileM2 {
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
      println(f"[m2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (rep <- 1 to 2) {
      val docs = graft.ops.Dedup.docShingles(spark, sfDir)
      time(s"docShingles.$rep")(docs)
      val hsOnly = docs.filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          graft.plans.NativeFunctions.arrayXxhash64(col("sh")).as("__hs"))
      time(s"hashesDropSh.$rep")(hsOnly)
      val shOnly = docs.filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"))
      time(s"shOnly.$rep")(shOnly)
      val hs = docs.filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"),
          graft.plans.NativeFunctions.arrayXxhash64(col("sh")).as("__hs"))
      time(s"hashes.$rep")(hs)
      val mh64 = hs.select(col("doc_id"), col("sh"),
        graft.plans.NativeFunctions.minhash64(col("__hs")).as("__mh"))
      time(s"mh64.$rep")(mh64)
      val sk = mh64.select(col("doc_id"), col("sh"),
        transform(col("__mh"), (v, i) => concat_ws(":", i, v)).as("__sk"))
      time(s"sketch.$rep")(sk)
      val tf = new HashingTF().setInputCol("__sk").setOutputCol("__features")
        .setNumFeatures(1 << 20)
      val featured = tf.transform(sk)
        .select(col("doc_id"), col("sh"), col("__features"))
      time(s"hashingTF.$rep")(featured)
      val featuredP = featured.persist()
      time(s"featured.persist.$rep")(featuredP)
      val mh = new MinHashLSH().setInputCol("__features")
        .setOutputCol("__hashes").setNumHashTables(8).setSeed(42L)
      val model = mh.fit(featuredP)
      val sigs = model.transform(featuredP)
        .select(col("doc_id").as("__id"), posexplode(col("__hashes")))
        .select(col("__id"), col("pos"),
          org.apache.spark.ml.functions.vector_to_array(col("col"))
            .getItem(0).as("__h"))
      time(s"sigs.$rep")(sigs)
      val cand = sigs.groupBy(col("pos"), col("__h"))
        .agg(sort_array(collect_set(col("__id"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(flatten(transform(col("ds"),
          x => transform(filter(col("ds"), y => y > x),
            y => struct(x.as("ida"), y.as("idb")))))).as("p"))
        .select(col("p.ida").as("ida"), col("p.idb").as("idb")).distinct()
      time(s"cand.$rep")(cand)
      val out = cand
        .join(featuredP.select(col("doc_id").as("ida"), col("sh").as("__fa")),
          Seq("ida"))
        .join(featuredP.select(col("doc_id").as("idb"), col("sh").as("__fb")),
          Seq("idb"))
        .withColumn("dist",
          graft.functions.jaccardDist(col("__fa"), col("__fb")))
        .filter(col("dist") <= 0.5)
      time(s"verify.$rep")(out)
      featuredP.unpersist(blocking = true)
    }
    spark.stop()
  }
}
