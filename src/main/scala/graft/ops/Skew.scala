package graft.ops

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Skew mitigation: salted equi-join. A hot key no longer lands in one
  * task — the dimension side is replicated across `salts` buckets and
  * the fact side scatters deterministically, so the hot key's rows
  * spread over `salts` tasks. Result is exactly `big ⋈ small` (every
  * big-side row meets every matching small-side row exactly once:
  * whatever salt a row draws, the replicated dimension has that salt).
  * AQE's skew-join handles moderate skew automatically; explicit
  * salting is the tool when one key dominates a 100 TB shuffle.
  */
object Skew extends QueryModule {

  /** @param big   fact side (arbitrary size, possibly skewed on `key`)
    * @param small dimension side (replicated `salts`×; must be
    *              broadcast-or-small relative to the shuffle)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts))
        .cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter runtime pruning for a selective fact⋈dim semi join —
    * the manual form of Spark's InjectRuntimeFilter, exposed as an
    * operator so a pipeline can prune a 100 TB fact scan with a filter
    * computed by an EARLIER stage (where the optimizer can't see the
    * dependency). The dim keys fold into an O(bits) bloom filter that
    * travels inside the plan; the probe (`BloomFilterMightContain`) is
    * codegen'd and sits directly above the fact scan, so ~(1−sel−fpp)
    * of fact rows die before the join exchange. The broadcast semi join
    * afterwards removes the ≤fpp false positives — the result is
    * EXACTLY `fact ⋉ dim`, machine-checked by the oracle.
    *
    * Build is a distributed treeAggregate (`putLong` per key) — no key
    * list ever collects to the driver, only fixed-size filters merge.
    */
  def bloomSemiJoin(fact: DataFrame, dimKeys: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dimKeys.select(col(dimKey).cast("long")).na.drop()
      .rdd.treeAggregate(BloomFilter.create(expectedKeys, fpp))(
        (f, r) => { f.putLong(r.getLong(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val probe: Column = B.toColumn(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      B.toExpression(col(factKey).cast("long"))))
    fact.filter(probe)
      .join(broadcast(dimKeys.select(col(dimKey)).distinct()),
        col(factKey) === col(dimKey), "left_semi")
  }

  override def queries: Seq[GQuery] = Seq(
    // J11: bloom-pruned semi join — lineitem rows survive only if their
    // part passed a selective dim predicate. The bloom probe kills the
    // non-matching ~97% of the fact scan before any exchange.
    GQuery("j11_bloom_prune",
      (s, d) => {
        val keys = Tables.part(s, d).filter(col("p_size") <= 2)
          .select(col("p_partkey"))
        bloomSemiJoin(Tables.lineitem(s, d), keys,
          "l_partkey", "p_partkey", expectedKeys = 100000L)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("revenue"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 2)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Salted fact⋈dim join — oracle is the plain join (same result by
    // construction), so correctness of the salting is machine-checked.
    GQuery("j9_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
        val supp = Tables.supplier(s, d)
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        saltedJoin(li, supp, "suppkey", 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("volume"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n,
             |       round(sum(l_extendedprice), 2) AS volume
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))
  )
}
