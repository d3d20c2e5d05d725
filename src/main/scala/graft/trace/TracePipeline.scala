package graft.trace

import graft.cluster.Dbscan
import graft.similarity.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** One raw trace event (the reference's native input schema,
  * FIXTURES.md §1; generator fields at `Src/data.py:142-146`). */
final case class LogEvent(
    state_from: String,
    state_to: String,
    action: String,   // "Request" | "Response"
    time: Long,
    process_id: String)

/** The reference's full Part-1 pipeline (`Src/main.py:13-51`) as a
  * composable Spark-native library: trace log → per-process features →
  * server featurization → LSH server clustering → cluster-space rewrite
  * → equal-process grouping → deduplicated log + report, plus the
  * Part-2 approximate clustering entry points.
  *
  * Differences from the reference's execution (semantics preserved,
  * SURVEY.md §4):
  *  - per-process ordering is done INSIDE each group
  *    (`array_sort(collect_list(struct(time, …)))`), never
  *    global-sort-then-group;
  *  - the per-server driver loop (`Src/servers.py:56-70`, one Spark job
  *    per server) is ONE union + groupBy;
  *  - broadcast dicts become broadcast dimension joins;
  *  - group ids are deterministic (ascending key order) but assigned
  *    scale-safely — range-sort + `zipWithIndex`
  *    ([[graft.functions.DenseIds]]), never a global
  *    `Window.orderBy` (single-task funnel) and never
  *    `monotonically_increasing_id` (non-deterministic).
  */
object TracePipeline {

  val logSchema: StructType = StructType(Seq(
    StructField("state_from", StringType),
    StructField("state_to", StringType),
    StructField("action", StringType),
    StructField("time", LongType),
    StructField("process_id", StringType)))

  /** Tolerant JSON-lines reader — the reference's data files (under
    * `Data/`, `.json`) terminate each line with a trailing comma, which
    * strict JSON parsers reject; strip it, then parse with the explicit
    * schema. */
  def readLogJson(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(regexp_replace(col("value"), ",\\s*$", "").as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(from_json(col("line"), logSchema).as("e"))
      .select("e.*")
      .filter(col("process_id").isNotNull)

  // ---- Part 1: exact process grouping --------------------------------

  /** process_id → request_path ("user:S1-S1:S2", Requests only, time
    * order) + euler_string ("1S1-1S2-0S2-0S1": enter on Request(→to),
    * exit on Response(from→)); `Src/processes.py:10-44`. */
  def processes(logs: DataFrame,
      from: String = "state_from", to: String = "state_to"): DataFrame =
    logs.groupBy("process_id")
      .agg(array_sort(collect_list(struct(col("time"), col(from).as("f"),
        col(to).as("t"), col("action")))).as("evs"))
      .select(col("process_id"),
        array_join(transform(
          filter(col("evs"), e => e.getField("action") === "Request"),
          e => concat(e.getField("f"), lit(":"), e.getField("t"))), "-")
          .as("request_path"),
        array_join(transform(col("evs"), e =>
          when(e.getField("action") === "Request",
            concat(lit("1"), e.getField("t")))
            .otherwise(concat(lit("0"), e.getField("f")))), "-")
          .as("euler_string"))

  /** First-visit depth per server from the request path: user=0, child =
    * parent+1 (`Src/processes.py:66-106`). Edges whose parent hasn't
    * been visited are skipped (the reference collapses the whole map to
    * {} on malformed input; on well-formed traces the two agree). */
  def serversDepthCol(requestPath: Column): Column =
    aggregate(
      filter(split(requestPath, "-"), e => length(e) > 0),
      map(lit("user"), lit(0)),
      (acc, edge) => {
        val f = element_at(split(edge, ":"), 1)
        val t = element_at(split(edge, ":"), 2)
        when(isnull(element_at(acc, f)) || isnotnull(element_at(acc, t)), acc)
          .otherwise(map_concat(acc,
            map_from_arrays(array(t), array(element_at(acc, f) + 1))))
      })

  /** processes + servers_depth map + depth_to_servers inverse map
    * (`Src/processes.py:108-129`).
    *
    * The inverse map is a PER-ROW expression: group the servers_depth
    * entries by depth value with higher-order functions instead of the
    * explode → two keyed aggregations → self-join this used to be.
    * Inverting a ≤`nServers`-entry map is O(k²) scalar work per row;
    * the old shape paid an explode of every (server, depth) entry, two
    * process-keyed shuffles, and a corpus-sized join to put the column
    * back — at 10M processes that join dominated the whole of part1
    * (round-11 profile: depth_features 359.9 s of part1's 546.5 s
    * phase total; the rewrite cuts the phase ~6× and removes two
    * exchanges from part1's plan). Ordering matches the old
    * aggregation exactly: servers sorted within a depth, entries
    * sorted by depth. */
  def depthFeatures(procs: DataFrame): DataFrame =
    procs
      .withColumn("servers_depth", serversDepthCol(col("request_path")))
      .withColumn("depth_to_servers",
        map_from_entries(array_sort(transform(
          array_distinct(map_values(col("servers_depth"))),
          d => struct(d.as("depth"),
            sort_array(transform(
              filter(map_entries(col("servers_depth")),
                e => e.getField("value") === d),
              e => e.getField("key"))).as("servers"))))))

  /** logs + depth_from (depth of the calling server; −1 when unknown —
    * `Src/processes.py:137-148`). */
  def logsWithDepth(logs: DataFrame, procsWithDepth: DataFrame): DataFrame =
    logs.join(procsWithDepth.select("process_id", "servers_depth"),
        Seq("process_id"), "left")
      .withColumn("depth_from",
        coalesce(element_at(col("servers_depth"), col("state_from")),
          lit(-1)))
      .drop("servers_depth")

  /** Per-server connection sets `"<related>_<In|Out>_<depth>"` over
    * Request edges (depth = callee depth). ONE union + groupBy —
    * replaces the reference's per-server driver loop
    * (`Src/servers.py:35-80`). */
  def serverConnections(logsDepth: DataFrame): DataFrame = {
    val req = logsDepth.filter(col("action") === "Request")
      .withColumn("d", col("depth_from") + 1)
    val in = req.select(col("state_to").as("server_name"),
      concat_ws("_", col("state_from"), lit("In"), col("d")).as("conn"))
    val out = req.select(col("state_from").as("server_name"),
      concat_ws("_", col("state_to"), lit("Out"), col("d")).as("conn"))
    in.unionByName(out)
      .filter(col("server_name") =!= "user")
      .groupBy("server_name")
      .agg(array_sort(collect_set(col("conn"))).as("connections"))
  }

  /** M3+M4: LSH server clustering at Jaccard distance <= threshold →
    * canonical cluster names → base-26 ids; returns the server →
    * cluster_id dimension incl. the fixed ("user" → "user") row
    * (`Src/servers.py:96-174`). */
  def serverClusterDim(spark: SparkSession, servers: DataFrame,
      threshold: Double = 0.05): DataFrame = {
    val pairs = Similarity
      .minhashJoin(servers, "server_name", "connections", threshold)
      .select(col("ida"), col("idb"))
    val clusters = Similarity.neighborClusters(
      servers.select("server_name"), "server_name", pairs)
    val ids = graft.functions.DenseIds
      .denseSortIds(clusters, "cluster_name", "__rank")
      .withColumn("cluster_id", graft.functions.base26Id(col("__rank")))
      .drop("__rank")
    val dim = clusters.join(ids, Seq("cluster_name"))
      .select(col("server_name"), col("cluster_id"))
    val user = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("user", "user")),
      StructType(Seq(StructField("server_name", StringType),
        StructField("cluster_id", StringType))))
    dim.unionByName(user)
  }

  /** Rewrite the log into cluster space: two broadcast dimension joins
    * resolving both endpoints (`Src/servers.py:218-231`). */
  def clusterLogs(logs: DataFrame, dim: DataFrame): DataFrame =
    logs
      .join(broadcast(dim.select(col("server_name").as("state_from"),
        col("cluster_id").as("cluster_from"))), Seq("state_from"))
      .join(broadcast(dim.select(col("server_name").as("state_to"),
        col("cluster_id").as("cluster_to"))), Seq("state_to"))
      .select("process_id", "time", "action", "cluster_from", "cluster_to")

  /** M9: processes with identical cluster-euler-strings, deterministic
    * contiguous group ids (`Src/processes.py:228-232`). */
  def equalProcesses(clusterLogs: DataFrame): DataFrame =
    // one row per euler string post-agg, so the contiguous group ids come
    // from range-sort + zipWithIndex — same ids as a dense_rank window,
    // without the single-task global-window funnel
    graft.functions.DenseIds.zipDenseIds(
      processes(clusterLogs, from = "cluster_from", to = "cluster_to")
        .groupBy(col("euler_string").as("cluster_euler_string"))
        .agg(sort_array(collect_list(col("process_id"))).as("equal_processes")),
      "cluster_euler_string", "group_processes_id")

  /** Deduplicated log: each group keeps its first member's events,
    * rewritten to cluster space and tagged with the group id
    * (`Src/processes.py:235-260`; A3 min-time semantics). */
  def dedupedLog(clusterLogs: DataFrame, groups: DataFrame): DataFrame =
    clusterLogs
      .join(groups.select(element_at(col("equal_processes"), 1)
          .as("process_id"), col("group_processes_id")),
        Seq("process_id"))
      .groupBy(col("group_processes_id"), col("cluster_from"),
        col("cluster_to"), col("action"))
      .agg(min(col("time")).as("time"))
      .select(col("cluster_from").as("state_from"),
        col("cluster_to").as("state_to"), col("time"), col("action"),
        col("group_processes_id").as("process_id"))
      .orderBy("process_id", "time")

  /** Part-1 human-readable report lines ("Group N: [members]" —
    * `Src/processes.py:279-303`, fixed-format via format_string). */
  def part1Report(groups: DataFrame): DataFrame =
    groups.select(format_string("Group %d: [%s]",
      col("group_processes_id"),
      array_join(transform(col("equal_processes"),
        p => concat(lit("'"), p, lit("'"))), ", ")).as("text"))
      .orderBy("text")

  /** Part-1 observations report: the full human-readable dump the
    * reference writes as `*_part1Observations.txt` — per group, each
    * member process's cluster-space log rows rendered as Python dict
    * literals (`Src/processes.py:262-303`; its three row/process/group
    * UDFs become format_string/concat/array_join Columns). Byte-compatible
    * with the reference modulo two arbitrary choices its own runs don't
    * fix: group numbering and cluster letters (both RNG/collect-order
    * dependent there). Within a process, rows order by (time, text);
    * within a group, processes order by id string — deterministic where
    * the reference relies on collect_list order. */
  def part1ObservationsReport(clusterLogs: DataFrame, groups: DataFrame)
      : DataFrame = {
    val gmap = groups.select(col("group_processes_id"),
      col("equal_processes"),
      explode(col("equal_processes")).as("process_id"))
    val rowText = format_string(
      "      {'server_from': '%s', 'server_to': '%s', 'time': %d, " +
        "'action': '%s', 'process_id': '%s'},\n",
      col("cluster_from"), col("cluster_to"), col("time"), col("action"),
      col("process_id"))
    clusterLogs.join(gmap, Seq("process_id"))
      .withColumn("rtxt", rowText)
      .groupBy("process_id")
      .agg(any_value(col("group_processes_id")).as("gid"),
        any_value(col("equal_processes")).as("members"),
        array_sort(collect_list(struct(col("time"), col("rtxt").as("t"))))
          .as("st"))
      .select(col("gid"), col("members"),
        concat(format_string("%s: \n", col("process_id")),
          array_join(transform(col("st"), e => e.getField("t")), ""))
          .as("ptext"))
      .groupBy("gid", "members")
      .agg(array_join(array_sort(collect_list(col("ptext"))), "")
        .as("gtext"))
      .select(format_string("Group %d: [%s] \n %s",
        col("gid"),
        array_join(transform(col("members"),
          p => concat(lit("'"), p, lit("'"))), ", "),
        col("gtext")).as("text"))
      .orderBy("text")
  }

  /** Convenience: raw logs → (groups, dedup'd log). */
  def part1(spark: SparkSession, logs: DataFrame,
      threshold: Double = 0.05): (DataFrame, DataFrame) = {
    val procs = depthFeatures(processes(logs))
    val withDepth = logsWithDepth(logs, procs)
    val dim = serverClusterDim(spark, serverConnections(withDepth), threshold)
    val cl = clusterLogs(logs, dim)
    val groups = equalProcesses(cl)
    (groups, dedupedLog(cl, groups))
  }

  // ---- Part 2: approximate process clustering ------------------------

  /** Per-process "parent:child1,child2" element sets in cluster space
    * (`Src/processes.py:195-226` — the broadcast-dict UDF becomes a
    * groupBy + join). */
  def processElements(clusterLogs: DataFrame): DataFrame =
    clusterLogs.filter(col("action") === "Request")
      .groupBy("process_id", "cluster_from")
      .agg(array_sort(collect_list(col("cluster_to"))).as("children"))
      .select(col("process_id"), concat(col("cluster_from"), lit(":"),
        array_join(col("children"), ",")).as("element"))
      .groupBy("process_id")
      .agg(array_sort(collect_list(col("element"))).as("cluster_elements"))

  /** Stage-1 approximate clustering: DBSCAN over element sets with
    * Jaccard distance (the reference's minhash_dbscan, ε=0.5, minPts=2
    * — `Src/processes.py:319-331`). DBSCAN ids must be UNIQUE — a hash
    * id (r4 used `xxhash64`) is only probabilistically so, and at ~1e9
    * processes the birthday bound makes a silent collision (two
    * processes sharing one DBSCAN point, corrupting labels) a real
    * event. [[graft.functions.DenseIds.zipDenseIds]] assigns ids
    * guaranteed-unique AND scale-safe (range shuffle + zipWithIndex —
    * no global window, no collision). */
  def elementClusters(spark: SparkSession, elements: DataFrame,
      eps: Double = 0.5, minPts: Int = 2): DataFrame = {
    import spark.implicits._
    // `elements` is one row per process_id (post-aggregation), so the
    // frame itself satisfies zipDenseIds's unique-key contract. Lazy
    // localCheckpoint: the numbered frame is read three times (zip
    // offsets job, DBSCAN input, join-back) — without it each read
    // re-runs the upstream aggregation.
    val numbered = graft.functions.DenseIds
      .zipDenseIds(elements.localCheckpoint(false), "process_id", "pidNum")
    val pts = numbered.select(col("pidNum"),
      array_join(col("cluster_elements"), "-").as("value"))
    val out = Dbscan.jaccardDbscan(spark, pts.as[(Long, String)], eps, minPts)
    numbered.join(out, col("pidNum") === col("id"))
      .select(col("process_id"), col("component"), col("is_core"))
  }

  /** Stage-2 refinement: edit-distance DBSCAN over cluster euler
    * strings, constrained WITHIN each stage-1 component — the
    * reference's per-cluster driver loop (`Src/processes.py:347-359`)
    * becomes one global run with a composite "component|euler" value
    * whose distance is ∞ across components. */
  def refineClusters(spark: SparkSession, procs: DataFrame,
      stage1: DataFrame, eps: Double = 6.0, minPts: Int = 2): DataFrame = {
    import spark.implicits._
    val k = math.ceil(eps).toInt
    val Big = 1e9
    def split2(s: String): (String, String) = {
      val i = s.indexOf('|')
      (s.substring(0, i), s.substring(i + 1))
    }
    // guaranteed-unique ids for Dbscan.run — see elementClusters. The
    // lazy localCheckpoint matters doubly here: the join input embeds
    // the ENTIRE stage-1 DBSCAN plan, which would otherwise recompute
    // on every read of `numbered`.
    val numbered = graft.functions.DenseIds.zipDenseIds(
      procs.join(stage1.select(col("process_id"), col("component")),
        Seq("process_id"), "left").localCheckpoint(false),
      "process_id", "pidNum")
    val pts = numbered.filter(col("component") >= 0)
      .select(col("pidNum"), concat(col("component"), lit("|"),
        col("euler_string")).as("value"))
    val out = Dbscan.run(spark, pts.as[(Long, String)], eps, minPts,
      dist = (a, b) => {
        val (ca, ea) = split2(a); val (cb, eb) = split2(b)
        if (ca != cb) Big
        else graft.functions.tokenLevenshtein(
          ea.split("-").toIndexedSeq, eb.split("-").toIndexedSeq).toDouble
      },
      scanDist = (a, b) => {
        val (ca, ea) = split2(a); val (cb, eb) = split2(b)
        if (ca != cb) Big
        else graft.functions.tokenLevenshteinBounded(
          ea.split("-").toIndexedSeq, eb.split("-").toIndexedSeq, k).toDouble
      })
    numbered.drop("component", "is_core")
      .join(out, col("pidNum") === col("id"), "left")
      .select(col("process_id"),
        coalesce(col("component"), lit(-1L)).as("fine_component"),
        coalesce(col("is_core"), lit(false)).as("is_core"))
  }

  /** Part-2 observations report. The reference's equivalent file is
    * always EMPTY — its loop discards the `union` result
    * (`Src/processes.py:402`, the U2 bug); here the per-component lines
    * accumulate through one aggregation, as intended. */
  def part2Report(fine: DataFrame): DataFrame =
    fine.filter(col("fine_component") >= 0)
      .groupBy("fine_component")
      .agg(sort_array(collect_list(col("process_id"))).as("ps"))
      .select(format_string("Cluster %d: [%s]", col("fine_component"),
        array_join(transform(col("ps"), p => concat(lit("'"), p, lit("'"))),
          ", ")).as("text"))
      .orderBy("text")
}
