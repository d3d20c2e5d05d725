package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local scale-up data generator (round-7 VERDICT #1): replicates the
  * harness sf0.1 tables `reps`× with disjoint key spaces so the bench
  * can measure sf0.1 → sf1 slopes on the most expensive queries
  * (SCALE.md records the numbers; the method lives here).
  *
  * Replication rules — referential integrity preserved per replica,
  * cross-replica structure deliberately DISJOINT so pair-generating
  * operators (dedup, triangles, co-occurrence graphs) scale the way
  * 10× more real data would, not the way 10 identical copies would:
  *  - every key domain gets key' = key + rep·stride, with strides far
  *    above the sf1 maxima (orders↔lineitem, customer↔orders,
  *    part/supplier↔lineitem stay joinable inside a replica and never
  *    collide across replicas);
  *  - region/nation are DIMENSIONS (25/5 rows) — copied once,
  *    unchanged, exactly like a production dim table that does not
  *    grow with fact volume (nationkey references stay valid);
  *  - events keep their timestamps (same wall-clock window, 10× the
  *    users — the realistic growth axis for sessionize/window ops;
  *    user/event ids shift per replica);
  *  - document text tokens are prefixed `r<rep>x` for replicas ≥ 1
  *    (replica 0 keeps the original corpus): per-replica token
  *    structure — and thus every within-replica dup/near-dup
  *    relation — is preserved, while cross-replica shingle/vocab
  *    spaces are disjoint, so candidate sets and vocabularies grow
  *    linearly; n_chars is recomputed to keep its length(text)
  *    invariant;
  *  - embedding vectors get a deterministic hash jitter (±0.01 per
  *    element — hash % 1000 spans −999..999 over 1e5, round-8 ADVICE
  *    corrected the previously stated ±0.005 — keyed on
  *    (vec_id, rep, index)) so replicated vectors
  *    are near but not identical — no degenerate distance ties in the
  *    ANN paths.
  *
  * Run: `sbt "runMain graft.tools.ScaleGen [src] [out] [reps]"`
  * (defaults /root/testdata/sf0.1 → /root/repo/scaledata/sf1 × 10).
  */
object ScaleGen {
  // strides far above per-domain sf1 maxima
  private val CustS = 10000000L
  private val SuppS = 1000000L
  private val PartS = 10000000L
  private val OrdS = 100000000L
  private val EvtS = 100000000L
  private val UserS = 10000000L
  private val DocS = 10000000L
  private val VecS = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/scaledata/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    val repFrame = spark.range(reps).select(col("id").as("rep"))
    def fan(df: DataFrame): DataFrame = df.crossJoin(broadcast(repFrame))
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dimensions: copied once, unchanged
    write(t("region"), "region")
    write(t("nation"), "nation")

    write(fan(t("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("rep") * CustS)
      .drop("rep"), "customer")
    write(fan(t("supplier"))
      .withColumn("s_suppkey", col("s_suppkey") + col("rep") * SuppS)
      .drop("rep"), "supplier")
    write(fan(t("part"))
      .withColumn("p_partkey", col("p_partkey") + col("rep") * PartS)
      .drop("rep"), "part")
    write(fan(t("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * OrdS)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * CustS)
      .drop("rep"), "orders")
    write(fan(t("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * OrdS)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * PartS)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * SuppS)
      .drop("rep"), "lineitem")
    write(fan(t("events"))
      .withColumn("event_id", col("event_id") + col("rep") * EvtS)
      .withColumn("user_id", col("user_id") + col("rep") * UserS)
      .drop("rep"), "events")
    write(fan(t("documents"))
      .withColumn("doc_id", col("doc_id") + col("rep") * DocS)
      .withColumn("text",
        when(col("rep") === 0 || trim(col("text")) === "", col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            tok => concat(lit("r"), col("rep"), lit("x"), tok)), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep"), "documents")
    write(fan(t("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("rep") * VecS)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + (hash(col("vec_id"), col("rep"), i) % 1000)
            .cast("float") / lit(100000.0f)).cast("float")))
      .drop("rep"), "embeddings")

    spark.stop()
  }
}
