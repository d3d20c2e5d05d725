package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface as a first-class API (round-7 VERDICT #7): the same
  * relational/window workloads expressed as `spark.sql` TEXT must
  * produce row-identical results to the registered DataFrame plans.
  * s13 proves one verbatim shared-dialect statement against DuckDB;
  * this spec widens the Spark-SQL surface across joins, aggregates,
  * set ops, rollup, and window functions — 14 pairs, compared
  * row-for-row and column-name-for-column-name at sf0.01. The SQL here
  * is Spark dialect (the events view exposes the engine's canonical
  * epoch-nanos `ts`, so time arithmetic is `ts div 1000` exactly as
  * the DataFrame forms compute it). */
class SqlFrontendSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def ensureViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    // canonical epoch-nanos ts, same adapter the DataFrame forms use
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  private val pairs: Seq[(String, String)] = Seq(
    "p1_project_alias" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lnum,
        |       l_extendedprice AS price
        |FROM lineitem WHERE l_orderkey % 1000 = 0
        |ORDER BY okey, lnum""".stripMargin,
    "j1_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j2_join_double" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |       count(*) AS n, round(sum(l_extendedprice), 2) AS volume
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY cust_nation, supp_nation""".stripMargin,
    "j3_join_left" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "j4_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "j5_join_range" ->
      """SELECT e1.user_id AS u, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e1.event_type = 'click' AND e2.event_type = 'purchase'
        | AND e2.ts div 1000 > e1.ts div 1000
        | AND e2.ts div 1000 <= e1.ts div 1000 + 120000000
        |GROUP BY e1.user_id ORDER BY u""".stripMargin,
    "a1_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= CAST('1998-09-01' AS TIMESTAMP_NTZ)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a3_first_per_group" ->
      """SELECT user_id, event_type, min(ts div 1000) AS first_ts_us,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a7_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a13_rollup" ->
      """SELECT p_brand, p_size, count(*) AS n,
        |  round(sum(p_retailprice), 2) AS retail
        |FROM part WHERE p_size <= 3
        |GROUP BY ROLLUP (p_brand, p_size)
        |ORDER BY p_brand ASC NULLS FIRST,
        |         p_size ASC NULLS FIRST""".stripMargin,
    "o1_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "u1_union_distinct" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |UNION SELECT DISTINCT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "u4_except_intersect" ->
      """SELECT nk, op FROM (
        |  SELECT nk, 'both' AS op FROM
        |    (SELECT s_nationkey AS nk FROM supplier
        |     INTERSECT SELECT c_nationkey FROM customer)
        |  UNION ALL
        |  SELECT nk, 'sup_only' AS op FROM
        |    (SELECT s_nationkey AS nk FROM supplier
        |     EXCEPT SELECT c_nationkey FROM customer))
        |ORDER BY op, nk""".stripMargin,
    "w1_row_number" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 AND o_custkey % 10 = 0 ORDER BY o_custkey""".stripMargin,
    "w2_running_sum" ->
      """SELECT user_id, event_id, running FROM (
        |  SELECT user_id, event_id,
        |    round(sum(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |      AS running
        |  FROM events)
        |WHERE event_id % 100 = 0 ORDER BY user_id, event_id""".stripMargin,
    "w3_lag_lead" ->
      """SELECT user_id, event_id, prev_type, next_type FROM (
        |  SELECT user_id, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events)
        |WHERE event_id % 100 = 0 ORDER BY user_id, event_id""".stripMargin)

  test("spark.sql text matches the DataFrame plans row-for-row") {
    ensureViews()
    for ((name, sqlText) <- pairs) {
      val df = SparkEntry.queries(name)(spark, dir)
      val viaSql = spark.sql(sqlText)
      assert(df.columns.toSeq == viaSql.columns.toSeq,
        s"$name: column names differ: ${df.columns.toSeq} vs " +
          s"${viaSql.columns.toSeq}")
      val a = df.collect().map(_.toString).toSeq
      val b = viaSql.collect().map(_.toString).toSeq
      assert(a.size == b.size, s"$name: ${a.size} vs ${b.size} rows")
      a.zip(b).zipWithIndex.collectFirst {
        case ((x, y), i) if x != y =>
          fail(s"$name row $i: DataFrame=$x SQL=$y")
      }
      Caches.drain()
    }
  }
}
