package graft.ops

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One event row for the typed reduceGroups query (A11). */
final case class EvRow(user_id: Long, event_id: Long, value: Double)

/** One reconciliation row for the typed cogroup query (T19). */
final case class CoRecon(o_orderkey: Long, n_orders: Long,
    total_cents: Long, n_items: Long, sum_cents: Long)

/** Trace-analytics layer: the reference's core domain semantics
  * (sessionize → request path / euler string → depth features → cluster
  * rewrite → equal-process grouping; reference `Src/processes.py:10-232`,
  * `Src/servers.py:35-80`) mapped onto the harness `events` table with
  * `user_id ≈ process_id`, `ts ≈ time` (long nanoseconds — read with
  * nanosAsLong), `event_type ≈ action`.
  *
  * Scale posture: every per-entity ordering happens INSIDE the group via
  * `array_sort(collect_list(struct(ts, event_id, …)))` — never
  * global-sort-then-group, whose per-group order Spark does not guarantee
  * (the reference's latent bug at `Src/processes.py:38-40`). Groups are
  * bounded by session size, aggregations are partial-agg friendly, and the
  * tiny event-type dimension is broadcast for the rewrite join.
  */
object Trace extends QueryModule {

  /** Event types treated as "opening" brackets in the euler encoding
    * (the reference's Request; the rest act as Response). */
  private val openTypes = Seq("click", "view", "signup")

  /** Per-user events sorted by (ts, event_id) as a struct array — the
    * shuffle-safe sessionize primitive (A10/O2). */
  private def sessionized(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))

  private def pathOf(evs: Column): Column =
    array_join(transform(evs, e => e.getField("event_type")), "-")

  override def queries: Seq[GQuery] = Seq(

    // A10: sessionize — per-user time-ordered action path.
    GQuery("t1_sessionize",
      (s, d) => sessionized(s, d)
        .select(col("user_id"), pathOf(col("evs")).as("path"),
          size(col("evs")).cast("long").as("n_events"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  string_agg(event_type, '-' ORDER BY ts, event_id) AS path,
             |  count(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Euler-string encoding: '1'+type for opening actions, '0'+type for
    // closing ones, '-'-joined in time order (`Src/processes.py:23-33`).
    GQuery("t2_euler_string",
      (s, d) => sessionized(s, d)
        .select(col("user_id"),
          array_join(transform(col("evs"), e =>
            concat(when(e.getField("event_type").isin(openTypes: _*), "1")
              .otherwise("0"), e.getField("event_type"))), "-").as("euler"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  string_agg(CASE WHEN event_type IN ('click','view','signup')
             |               THEN '1' ELSE '0' END || event_type,
             |             '-' ORDER BY ts, event_id) AS euler
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Notebook depth counter: running +1/-1 cumulative sum per user
    // (`bigdata (2).ipynb` cell 8 semantics) as a window cumsum.
    GQuery("t3_depth_counter",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val delta = when(col("event_type").isin("click", "view"), 1)
          .when(col("event_type").isin("purchase", "error"), -1)
          .otherwise(0)
        Tables.events(s, d)
          .withColumn("depth", sum(delta).over(w))
          .filter(col("event_id") % 100 === 0)
          .select("user_id", "event_id", "depth")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, depth FROM (
             |  SELECT user_id, event_id,
             |    CAST(sum(CASE WHEN event_type IN ('click','view') THEN 1
             |             WHEN event_type IN ('purchase','error') THEN -1
             |             ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS depth
             |  FROM events)
             |WHERE event_id % 100 = 0 ORDER BY user_id, event_id""".stripMargin)),

    // Request path: "prev:curr" edge tokens in time order
    // (`Src/processes.py:12-21`), edges from a lag window.
    GQuery("t4_request_path",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("edge",
            concat(lag("event_type", 1).over(w), lit(":"), col("event_type")))
          .filter(col("edge").isNotNull)
          .groupBy("user_id")
          .agg(array_join(transform(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("edge")))),
            e => e.getField("edge")), "-").as("request_path"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  string_agg(edge, '-' ORDER BY ts, event_id) AS request_path
             |FROM (SELECT user_id, ts, event_id,
             |        lag(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) || ':' || event_type AS edge
             |      FROM events)
             |WHERE edge IS NOT NULL
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Depth-map features: map<type,count> per user via
    // map_from_entries(collect_list(struct(...))) (A2/F7,
    // `Src/processes.py:108-129`), read back through map_keys /
    // map_values (F6) and element_at-with-default
    // (`Src/processes.py:137-143`: coalesce(element_at, -1)).
    GQuery("t5_depth_map",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          array_join(transform(map_values(col("m")), _.cast("string")), ",")
            .as("vs"),
          size(map_keys(col("m"))).cast("long").as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(-1L)).as("click_n"),
          coalesce(element_at(col("m"), "refund"), lit(-1L)).as("refund_n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  string_agg(event_type, ',' ORDER BY event_type) AS ks,
             |  string_agg(CAST(n AS VARCHAR), ',' ORDER BY event_type) AS vs,
             |  count(*) AS n_types,
             |  coalesce(max(CASE WHEN event_type = 'click' THEN n END), -1)
             |    AS click_n,
             |  CAST(-1 AS BIGINT) AS refund_n
             |FROM (SELECT user_id, event_type, count(*) AS n
             |      FROM events GROUP BY 1, 2)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // F1: explode(map) back to (key, value) rows.
    GQuery("t6_explode_map",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("etype", "n")))
        .orderBy("user_id", "etype"),
      Some("""SELECT user_id, event_type AS etype, count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY user_id, etype""".stripMargin)),

    // F2: explode(array) with position (posexplode).
    GQuery("t7_explode_array",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
        .select(col("user_id"), posexplode(col("types")).as(Seq("pos", "etype")))
        .select(col("user_id"), col("pos").cast("long").as("pos"), col("etype"))
        .orderBy("user_id", "pos"),
      Some("""SELECT user_id,
             |  row_number() OVER (PARTITION BY user_id ORDER BY etype) - 1
             |    AS pos, etype
             |FROM (SELECT DISTINCT user_id, event_type AS etype FROM events)
             |ORDER BY user_id, pos""".stripMargin)),

    // M9 flagship: equal-process grouping — sessions (user, day) with
    // identical action paths grouped together (`Src/processes.py:228-232`).
    GQuery("t8_equal_groups",
      (s, d) => Tables.events(s, d)
        .withColumn("day", expr("ts div 86400000000000"))
        .groupBy("user_id", "day")
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .select(col("user_id"), pathOf(col("evs")).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"),
          array_join(transform(sort_array(collect_list(col("user_id"))),
            _.cast("string")), ",").as("members"),
          min(col("user_id")).as("min_user"))
        .orderBy("path"),
      Some("""WITH sess AS (
             |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
             |         string_agg(event_type, '-' ORDER BY ts, event_id) AS path
             |  FROM events GROUP BY 1, 2)
             |SELECT path, count(*) AS n_sessions,
             |       string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id)
             |         AS members,
             |       min(user_id) AS min_user
             |FROM sess GROUP BY path ORDER BY path""".stripMargin)),

    // T16: cohort retention — users grouped by first-activity week
    // (the cohort), counted by how many weeks later they return: the
    // (cohort, offset) matrix behind every retention curve. Two keyed
    // aggregations (first week per user, distinct activity weeks per
    // user) and one broadcast-joinable bounded output; no window over
    // unbounded history anywhere.
    GQuery("t16_retention",
      (s, d) => {
        val uw = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 604800000000000").as("week"))
          .distinct()
        val cohort = uw.groupBy("user_id").agg(min("week").as("c_week"))
        uw.join(cohort, Seq("user_id"))
          .select(col("c_week"),
            (col("week") - col("c_week")).as("offset_weeks"),
            col("user_id"))
          .groupBy("c_week", "offset_weeks")
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("c_week", "offset_weeks")
      },
      Some("""WITH uw AS (
             |  SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 604800000000000 AS week FROM events),
             |c AS (SELECT user_id, min(week) AS c_week
             |      FROM uw GROUP BY 1)
             |SELECT c_week, week - c_week AS offset_weeks,
             |  count(DISTINCT uw.user_id) AS n_users
             |FROM uw JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY c_week, offset_weeks""".stripMargin)),

    // T15: event-type co-occurrence PMI over (user, day) sessions —
    // association mining: which action types appear together MORE
    // than their independent rates predict (pmi > 0) or avoid each
    // other (pmi < 0). All four log terms are micro-nat-quantized per
    // distinct count (the x12 trick), so the PMI values are exact
    // integer arithmetic until the final display division. The pair
    // space is |types|² (bounded); the corpus-sized work is one
    // distinct projection and one session-keyed self-join whose
    // per-session fan-out is at most |types|.
    GQuery("t15_pmi",
      (s, d) => {
        val st = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 86400000000000").as("day"),
            col("event_type").as("t"))
          .distinct()
        val tot = st.agg(
          countDistinct(struct(col("user_id"), col("day"))).as("n_sess"))
        val singles = st.groupBy("t").agg(count(lit(1)).as("n_t"))
        def lnMicro(c: Column): Column =
          round(log(c.cast("double")) * 1e6)
        st.select(col("user_id"), col("day"), col("t").as("ta"))
          .join(st.select(col("user_id"), col("day"), col("t").as("tb")),
            Seq("user_id", "day"))
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
          .join(broadcast(singles.select(col("t").as("ta"),
            col("n_t").as("na"))), Seq("ta"))
          .join(broadcast(singles.select(col("t").as("tb"),
            col("n_t").as("nb"))), Seq("tb"))
          .crossJoin(broadcast(tot))
          .select(col("ta"), col("tb"), col("n_ab"),
            round((lnMicro(col("n_ab")) + lnMicro(col("n_sess")) -
              lnMicro(col("na")) - lnMicro(col("nb"))) / 1e6, 4)
              .as("pmi"))
          .orderBy("ta", "tb")
      },
      Some("""WITH st AS (
             |  SELECT DISTINCT user_id,
             |    epoch_ns(ts) // 86400000000000 AS day, event_type AS t
             |  FROM events),
             |n AS (SELECT count(*) AS n_sess FROM
             |        (SELECT DISTINCT user_id, day FROM st)),
             |s1 AS (SELECT t, count(*) AS n_t FROM st GROUP BY 1),
             |p AS (SELECT a.t AS ta, b.t AS tb, count(*) AS n_ab
             |      FROM st a JOIN st b ON a.user_id = b.user_id
             |        AND a.day = b.day AND a.t < b.t
             |      GROUP BY 1, 2)
             |SELECT ta, tb, n_ab,
             |  round((round(ln(n_ab) * 1e6) + round(ln(n_sess) * 1e6) -
             |    round(ln(na.n_t) * 1e6) - round(ln(nb.n_t) * 1e6))
             |    / 1e6, 4) AS pmi
             |FROM p JOIN s1 na ON p.ta = na.t
             |       JOIN s1 nb ON p.tb = nb.t CROSS JOIN n
             |ORDER BY ta, tb""".stripMargin)),

    // Notebook transition counter (`bigdata (2).ipynb` cell 9): global
    // (prev → curr) transition histogram.
    GQuery("t9_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("curr"))
          .agg(count(lit(1)).as("n"))
          .orderBy("prev", "curr")
      },
      Some("""SELECT prev, curr, count(*) AS n FROM (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev,
             |         event_type AS curr
             |  FROM events)
             |WHERE prev IS NOT NULL
             |GROUP BY 1, 2 ORDER BY prev, curr""".stripMargin)),

    // F9+F10: cluster-space rewrite — assign base-26 cluster ids to the
    // event-type dimension, then rewrite every user's path token-by-token
    // through the broadcast map (replaces the reference's five rewrite
    // UDFs, `Src/processes.py:152-192`, with higher-order functions).
    GQuery("t10_cluster_rewrite",
      (s, d) => {
        // global window is safe: post-distinct event-type vocabulary is a
        // bounded dimension (the action alphabet), not row-scaled data
        val dim = Tables.events(s, d).select("event_type").distinct()
          .withColumn("cid", graft.functions.base26Id(
            dense_rank().over(Window.orderBy("event_type")) - 1))
        val m = dim.agg(map_from_entries(collect_list(
          struct(col("event_type"), col("cid")))).as("m"))
        sessionized(s, d).crossJoin(broadcast(m))
          .select(col("user_id"),
            array_join(transform(col("evs"),
              e => element_at(col("m"), e.getField("event_type"))), "-")
              .as("cluster_path"))
          .orderBy("user_id")
      },
      Some("""WITH dim AS (
             |  SELECT event_type,
             |         chr(CAST(dense_rank() OVER (ORDER BY event_type) - 1 + 65
             |             AS INT)) AS cid
             |  FROM (SELECT DISTINCT event_type FROM events)),
             |ev AS (SELECT e.user_id, e.ts, e.event_id, d.cid
             |       FROM events e JOIN dim d USING (event_type))
             |SELECT user_id,
             |       string_agg(cid, '-' ORDER BY ts, event_id) AS cluster_path
             |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A11: typed reduceGroups — max-value event per user via Dataset
    // reduce (the RDD reduceByKey surface, `Src/dbscan.py:100-104`).
    GQuery("t11_reduce_groups",
      (s, d) => {
        val sess = s
        import sess.implicits._
        Tables.events(s, d).select("user_id", "event_id", "value").as[EvRow]
          .groupByKey(_.user_id)
          .reduceGroups((a, b) =>
            if (a.value > b.value || (a.value == b.value && a.event_id < b.event_id)) a
            else b)
          .map(_._2)
          .toDF()
          .select(col("user_id"), col("event_id"),
            round(col("value"), 2).as("value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, round(value, 2) AS value FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY value DESC, event_id) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // T13: funnel analysis — first click, first view STRICTLY after
    // it, first purchase strictly after that, per user, in ONE pass:
    // array_sort(collect_list) + a single HOF fold carrying the
    // (c1, v1, p1) state. One shuffle total, state is three longs per
    // user regardless of history length — where the naive form (three
    // sequential min-aggregate + join-back rounds) pays three keyed
    // shuffles. The oracle IS that naive form, so the two derivations
    // checking each other is part of the point. Timestamps in micros
    // (`ts div 1000` = epoch_us). Users with no click are out of the
    // funnel and dropped.
    GQuery("t13_funnel",
      (s, d) => {
        val acc0 = struct(lit(null).cast("long").as("c1"),
          lit(null).cast("long").as("v1"), lit(null).cast("long").as("p1"))
        def fold(evs: Column): Column = aggregate(evs, acc0, (acc, e) => {
          val (t, ty) = (e.getField("t"), e.getField("ty"))
          val c1 = when(acc.getField("c1").isNull && ty === "click", t)
            .otherwise(acc.getField("c1"))
          val v1 = when(acc.getField("v1").isNull && ty === "view" &&
              acc.getField("c1").isNotNull && t > acc.getField("c1"), t)
            .otherwise(acc.getField("v1"))
          val p1 = when(acc.getField("p1").isNull && ty === "purchase" &&
              acc.getField("v1").isNotNull && t > acc.getField("v1"), t)
            .otherwise(acc.getField("p1"))
          struct(c1.as("c1"), v1.as("v1"), p1.as("p1"))
        })
        Tables.events(s, d)
          .select(col("user_id"),
            struct(expr("ts div 1000").as("t"), col("event_id").as("eid"),
              col("event_type").as("ty")).as("e"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(col("e"))).as("evs"))
          .select(col("user_id"), fold(col("evs")).as("f"))
          .select(col("user_id"), col("f.c1").as("c1"),
            col("f.v1").as("v1"), col("f.p1").as("p1"))
          .filter(col("c1").isNotNull)
          .withColumn("stage",
            when(col("p1").isNotNull, 3).when(col("v1").isNotNull, 2)
              .otherwise(1))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
             |c AS (SELECT user_id, min(t) AS c1 FROM e
             |      WHERE event_type = 'click' GROUP BY 1),
             |v AS (SELECT e.user_id, min(t) AS v1
             |      FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'view' AND t > c1 GROUP BY 1),
             |p AS (SELECT e.user_id, min(t) AS p1
             |      FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'purchase' AND t > v1 GROUP BY 1)
             |SELECT c.user_id AS user_id, c1, v1, p1,
             |  CASE WHEN p1 IS NOT NULL THEN 3
             |       WHEN v1 IS NOT NULL THEN 2 ELSE 1 END AS stage
             |FROM c LEFT JOIN v ON c.user_id = v.user_id
             |       LEFT JOIN p ON c.user_id = p.user_id
             |ORDER BY user_id""".stripMargin)),

    // T17: per-user event-rate burst detection — hours whose event
    // count exceeds 2× the user's own median hourly rate (the
    // self-relative anomaly gate an ops pipeline runs on activity
    // streams; absolute thresholds misfire across heavy/light users).
    // Integer-exact across engines: the median of integer counts is a
    // multiple of 0.5, so med2 = 2·median is an exact long and the
    // flag compare (c > med2 ⇔ c > 2·median) never touches a float.
    // Shapes: one (user, hour) count (map-side combined), one per-user
    // percentile whose buffer is bounded by the user's distinct hours,
    // one user-keyed join back. No global funnel anywhere.
    GQuery("t17_burst_detect",
      (s, d) => burstHours(Tables.events(s, d)).orderBy("user_id", "hour"),
      Some("""WITH hc AS (
             |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hour,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT user_id,
             |        CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
             |      FROM hc GROUP BY 1)
             |SELECT user_id, hour, c, med2
             |FROM hc JOIN m USING (user_id)
             |WHERE c > med2 ORDER BY user_id, hour""".stripMargin)),

    // T18: event-volume trend detection — per event type, the exact
    // least-squares slope of weekly counts, kept as an INTEGER
    // num/den pair: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with
    // x = week index normalized to the type's first week and y = the
    // weekly count. Every statistic is an exact long, so the
    // rising/falling verdict (sign of the numerator) is engine- and
    // partitioning-exact — no float regression anywhere. Shapes: one
    // (type, week) count (map-side combined), one per-type window for
    // the week normalization, one 5-sum aggregate. At 100 TB the
    // state per type is five longs.
    GQuery("t18_trend",
      (s, d) => trendStats(Tables.events(s, d)).orderBy("event_type"),
      Some("""WITH wk AS (
             |  SELECT event_type,
             |    epoch_ns(ts) // 604800000000000 AS week, count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |nx AS (SELECT event_type,
             |         week - min(week) OVER (PARTITION BY event_type)
             |           AS x, y
             |       FROM wk),
             |a AS (SELECT event_type,
             |        CAST(count(*) AS BIGINT) AS n_weeks,
             |        CAST(sum(x) AS BIGINT) AS sx,
             |        CAST(sum(y) AS BIGINT) AS sy,
             |        CAST(sum(x * y) AS BIGINT) AS sxy,
             |        CAST(sum(x * x) AS BIGINT) AS sxx
             |      FROM nx GROUP BY 1)
             |SELECT event_type, n_weeks,
             |  n_weeks * sxy - sx * sy AS slope_num,
             |  n_weeks * sxx - sx * sx AS slope_den,
             |  (n_weeks * sxy - sx * sy > 0) AS rising
             |FROM a ORDER BY event_type""".stripMargin)),

    // T19: typed cogroup — per-key logic over TWO grouped inputs at once
    // (`KeyValueGroupedDataset.cogroup`), here order-vs-lineitems billing
    // reconciliation: each order key sees its order rows and its line
    // rows side by side, no join explosion, keys present on either side
    // survive (the FULL OUTER semantics the SQL oracle spells as two
    // aggregates + full join). Money is summed in integer CENTS so the
    // fold is order-independent — double summation over an unordered
    // cogroup iterator would be run-to-run nondeterministic. Scale
    // posture: cogroup is ONE co-partitioned shuffle per side on the
    // group key with partial-agg-free per-key streaming — the typed
    // escape hatch for per-key logic that does not decompose into
    // aggregates (here it does; the point is exercising the surface
    // against that decomposition as the oracle).
    GQuery("t19_cogroup",
      (s, d) => {
        val sess = s
        import sess.implicits._
        val os = Tables.orders(s, d)
          .select(col("o_orderkey").cast("long"),
            col("o_totalprice")).as[(Long, Double)]
        val ls = Tables.lineitem(s, d)
          .select(col("l_orderkey").cast("long"),
            col("l_extendedprice")).as[(Long, Double)]
        os.groupByKey(_._1).cogroup(ls.groupByKey(_._1)) { (k, oi, li) =>
          var nOrd = 0L; var totC = 0L
          oi.foreach { o => nOrd += 1; totC += math.round(o._2 * 100) }
          var nIt = 0L; var sumC = 0L
          li.foreach { l => nIt += 1; sumC += math.round(l._2 * 100) }
          Iterator.single(CoRecon(k, nOrd, totC, nIt, sumC))
        }.toDF().orderBy("o_orderkey")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS total_cents
             |  FROM orders GROUP BY 1),
             |l AS (
             |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS sum_cents
             |  FROM lineitem GROUP BY 1)
             |SELECT CAST(coalesce(o.k, l.k) AS BIGINT) AS o_orderkey,
             |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
             |  CAST(coalesce(total_cents, 0) AS BIGINT) AS total_cents,
             |  CAST(coalesce(n_items, 0) AS BIGINT) AS n_items,
             |  CAST(coalesce(sum_cents, 0) AS BIGINT) AS sum_cents
             |FROM o FULL OUTER JOIN l ON o.k = l.k
             |ORDER BY o_orderkey""".stripMargin)),

    // T20: OHLC bar downsampling — the metrics/observability compaction
    // step (raw event stream → per-series per-hour open/high/low/close/
    // volume bars, the storage format every time-series backend keeps).
    // ONE window sort per (series, hour) attaches open AND close
    // (first_value/last_value over the full frame, deterministic
    // (ts, event_id) order), then one keyed agg folds high/low/count/
    // volume — the window and the agg share the same partitioning, so
    // the whole query is a single exchange. At 100 TB the series key
    // gains a shard column exactly like x24's packing windows; no
    // global sort anywhere.
    GQuery("t20_ohlc_bars",
      (s, d) => {
        val w = Window
          .partitionBy("event_type", "hour").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 3600000000000").as("hour"),
            col("ts"), col("event_id"), col("value"))
          .withColumn("open", first("value").over(w))
          .withColumn("close", last("value").over(w))
          .groupBy("event_type", "hour")
          .agg(round(min("open"), 4).as("open"),
            round(max("value"), 4).as("high"),
            round(min("value"), 4).as("low"),
            round(min("close"), 4).as("close"),
            count(lit(1)).as("n_events"),
            round(sum("value"), 4).as("volume"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH e AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
             |    value,
             |    first_value(value) OVER (
             |      PARTITION BY event_type, epoch_ns(ts) // 3600000000000
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND UNBOUNDED FOLLOWING) AS o,
             |    last_value(value) OVER (
             |      PARTITION BY event_type, epoch_ns(ts) // 3600000000000
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND UNBOUNDED FOLLOWING) AS c
             |  FROM events)
             |SELECT event_type, hour,
             |  round(min(o), 4) AS open,
             |  round(max(value), 4) AS high,
             |  round(min(value), 4) AS low,
             |  round(min(c), 4) AS close,
             |  count(*) AS n_events,
             |  round(sum(value), 4) AS volume
             |FROM e GROUP BY 1, 2
             |ORDER BY event_type, hour""".stripMargin))
  )

  /** T18 core: per event type, the exact least-squares slope of weekly
    * counts as an integer num/den pair, over any (event_type, ts-nanos)
    * frame. */
  private[graft] def trendStats(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    events
      .select(col("event_type"),
        expr("ts div 604800000000000").as("week"))
      .groupBy("event_type", "week").agg(count(lit(1)).as("y"))
      .withColumn("x", col("week") - min(col("week")).over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_weeks"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_weeks"),
        (col("n_weeks") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n_weeks") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
      .withColumn("rising", col("slope_num") > 0)
  }

  /** T17 core: hours where a user's event count exceeds 2× their own
    * median hourly rate, over any (user_id, ts-nanos) frame. */
  private[graft] def burstHours(events: DataFrame): DataFrame = {
    val hc = events
      .withColumn("hour", expr("ts div 3600000000000"))
      .groupBy("user_id", "hour").agg(count(lit(1)).as("c"))
    val m = hc.groupBy("user_id")
      .agg((expr("percentile(c, 0.5D)") * 2).cast("long").as("med2"))
    hc.join(m, Seq("user_id"))
      .filter(col("c") > col("med2"))
      .select(col("user_id"), col("hour"), col("c"), col("med2"))
  }
}
