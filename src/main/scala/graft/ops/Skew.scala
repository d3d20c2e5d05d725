package graft.ops

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  override def queries: Seq[GQuery] = Seq(
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
