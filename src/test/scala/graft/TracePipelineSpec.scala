package graft

import graft.trace.{LogEvent, TracePipeline => TP}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Part-1 pipeline specs: the FIXTURES.md §1.1 hand-checkable
  * fixture, order invariance, and the golden grouping of the reference's
  * committed `Data/test.json` (6 singleton groups — verified against
  * `Data/test.json_part1Observations.txt`). */
class TracePipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** FIXTURES.md §1.1: p1 = user→S1→S2 nested; p2 identical shape. */
  private def miniLogs = {
    import spark.implicits._
    Seq(
      LogEvent("user", "S1", "Request", 1, "p1"),
      LogEvent("S1", "S2", "Request", 2, "p1"),
      LogEvent("S2", "S1", "Response", 3, "p1"),
      LogEvent("S1", "user", "Response", 4, "p1"),
      LogEvent("user", "S1", "Request", 5, "p2"),
      LogEvent("S1", "S2", "Request", 6, "p2"),
      LogEvent("S2", "S1", "Response", 7, "p2"),
      LogEvent("S1", "user", "Response", 8, "p2")
    ).toDF()
  }

  test("processes: request path + euler string match hand-derived values") {
    val p = TP.processes(miniLogs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(p("p1") == ("user:S1-S1:S2", "1S1-1S2-0S2-0S1"))
    assert(p("p2") == ("user:S1-S1:S2", "1S1-1S2-0S2-0S1"))
  }

  test("processes: shuffled input rows give identical results (O2 invariance)") {
    import spark.implicits._
    val shuffled = miniLogs.orderBy(rand(99))
    val a = TP.processes(miniLogs).orderBy("process_id").as[(String, String, String)].collect().toSeq
    val b = TP.processes(shuffled).orderBy("process_id").as[(String, String, String)].collect().toSeq
    assert(a == b)
  }

  test("serversDepth: user=0, child=parent+1; depth_to_servers inverse") {
    val feats = TP.depthFeatures(TP.processes(miniLogs))
    val r = feats.filter(col("process_id") === "p1").head()
    val depth = r.getAs[Map[String, Int]]("servers_depth")
    assert(depth == Map("user" -> 0, "S1" -> 1, "S2" -> 2))
    val inv = r.getAs[Map[Int, scala.collection.Seq[String]]]("depth_to_servers")
    assert(inv(0).toList == List("user") && inv(1).toList == List("S1") && inv(2).toList == List("S2"))
  }

  test("logsWithDepth: depth_from resolves, unknown server → -1") {
    val withDepth = TP.logsWithDepth(miniLogs,
      TP.depthFeatures(TP.processes(miniLogs)))
    val d = withDepth.filter(col("state_from") === "S1" &&
      col("action") === "Request").select("depth_from").head().getInt(0)
    assert(d == 1)
  }

  test("serverConnections: In/Out edges with callee depth, no user row") {
    val conns = TP.serverConnections(TP.logsWithDepth(miniLogs,
      TP.depthFeatures(TP.processes(miniLogs))))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(!conns.contains("user"))
    assert(conns("S1") == Set("user_In_1", "S2_Out_2"))
    assert(conns("S2") == Set("S1_In_2"))
  }

  test("part1 on mini fixture: p1+p2 form ONE equal-process group") {
    val (groups, dedup) = TP.part1(spark, miniLogs)
    val g = groups.collect()
    assert(g.length == 1, s"expected one group, got ${g.length}")
    assert(g.head.getAs[scala.collection.Seq[String]]("equal_processes").toList == List("p1", "p2"))
    // dedup'd log keeps exactly one process worth of events (4 rows)
    assert(dedup.count() == 4)
    val report = TP.part1Report(groups).head().getString(0)
    assert(report == "Group 0: ['p1', 'p2']")
  }

  test("golden: reference Data/test.json groups into 6 singletons") {
    val logs = TP.readLogJson(spark, "/root/reference/Data/test.json")
    // 60 events: wc -l reports 59 because the file has no trailing newline
    assert(logs.count() == 60, "trailing-comma JSONL parsed")
    val (groups, dedup) = TP.part1(spark, logs)
    val members = groups.collect()
      .map(_.getAs[scala.collection.Seq[String]]("equal_processes").toList).toSet
    // golden part1Observations: every process is its own group
    assert(members == (1 to 6).map(i => List(s"process$i")).toSet,
      s"got $members")
    assert(dedup.select("process_id").distinct().count() == 6)
  }

  test("golden: reference Data/data_processes_v2.json part-1 partition (461 procs, 16 groups)") {
    // the reference's committed part1Observations partition every one of
    // the 461 processes into 16 cluster-space equal-euler groups; the
    // comparison is letter-independent (group MEMBERSHIP, not cluster ids)
    val obs = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/Data/data_processes_v2.json_part1Observations.txt/" +
        "part-00000-3463cf62-4a6b-4989-b8a9-344d98babcc8-c000.txt")))
    val golden: Set[Set[String]] =
      "Group \\d+: \\[(.*?)\\]".r.findAllMatchIn(obs)
        .map(m => "'([^']+)'".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSet).toSet
    assert(golden.toSeq.map(_.size).sum == 461 && golden.size == 16)

    val logs = TP.readLogJson(spark,
      "/root/reference/Data/data_processes_v2.json")
    val (groups, _) = TP.part1(spark, logs)
    val ours: Set[Set[String]] = groups.collect()
      .map(_.getAs[scala.collection.Seq[String]]("equal_processes").toSet)
      .toSet
    val onlyGolden = golden -- ours
    val onlyOurs = ours -- golden
    assert(onlyGolden.isEmpty && onlyOurs.isEmpty,
      s"partition mismatch: golden-only=${onlyGolden.map(_.size)} ours-only=${onlyOurs.map(_.size)}")
  }

  test("golden: v2 part1Output — all 166 dedup'd rows match after canonical remap") {
    // Row-level golden against the reference's committed dedup'd log.
    // Two documented arbitrary choices separate byte-equality
    // (GoldenProbe, 2026-08-12): the reference's group REPRESENTATIVE is
    // `equal_processes[0]` of an unspecified Python collect order (we
    // pin min-member), and its cluster LETTERS came from a random-seed
    // LSH run (ours are canonical-name ranked). Canonicalize both away —
    // times normalized to each group's first event, letters matched
    // through a single consistent bijection derived from the rows — and
    // assert every one of the 166 rows: per-group row counts, action
    // sequences, normalized time sequences, and endpoint letters.
    def readGoldenLines(dir: String): Seq[String] = {
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val src = scala.io.Source.fromFile(f)
      try src.getLines().toList finally src.close()
    }
    val rowRe = ("\"state_from\":\"([^\"]*)\",\"state_to\":\"([^\"]*)\"," +
      "\"time\":(\\d+),\"action\":\"([^\"]*)\",\"process_id\":(\\d+)").r
    val golden = readGoldenLines(
      "/root/reference/Data/data_processes_v2.json_part1Output.txt")
      .flatMap(l => rowRe.findFirstMatchIn(l))
      .map(m => (m.group(5).toLong,
        (m.group(1), m.group(2), m.group(3).toLong, m.group(4))))
    assert(golden.size == 166, s"golden parse: ${golden.size} rows")
    val goldenByGid = golden.groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(r => (r._3, r._4, r._1, r._2))).toMap

    // group number -> member set, from the observations file
    val obsTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/Data/data_processes_v2.json_part1Observations.txt/" +
          "part-00000-3463cf62-4a6b-4989-b8a9-344d98babcc8-c000.txt")))
    val obsGroups: Map[Long, Set[String]] =
      "Group (\\d+): \\[(.*?)\\]".r.findAllMatchIn(obsTxt)
        .map(m => m.group(1).toLong ->
          "'([^']+)'".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSet)
        .toMap

    val logs = TP.readLogJson(spark,
      "/root/reference/Data/data_processes_v2.json")
    val (groups, dedup) = TP.part1(spark, logs)
    val ourGid: Map[Set[String], Long] = groups.collect()
      .map(r => r.getAs[scala.collection.Seq[String]]("equal_processes").toSet
        -> r.getAs[Long]("group_processes_id")).toMap
    val ourByGid = dedup.collect()
      .map(r => (r.getAs[Long]("process_id"),
        (r.getString(0), r.getString(1), r.getAs[Long]("time"),
          r.getString(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(r => (r._3, r._4, r._1, r._2)).toSeq)
      .toMap
    assert(ourByGid.values.map(_.size).sum == 166)

    val bij = scala.collection.mutable.HashMap.empty[String, String]
    def mapLetter(ours: String, theirs: String, ctx: String): Unit =
      bij.get(ours) match {
        case Some(t) => assert(t == theirs,
          s"bijection conflict at $ctx: $ours -> $t vs $theirs")
        case None => bij(ours) = theirs
      }
    for ((gid, gRows) <- goldenByGid) {
      val members = obsGroups(gid)
      val oRows = ourByGid(ourGid(members))
      assert(oRows.size == gRows.size, s"group $gid row count")
      val gBase = gRows.map(_._3).min
      val oBase = oRows.map(_._3).min
      assert(oRows.map(r => r._3 - oBase) == gRows.map(r => r._3 - gBase),
        s"group $gid normalized times")
      assert(oRows.map(_._4) == gRows.map(_._4), s"group $gid actions")
      oRows.zip(gRows).foreach { case (o, g) =>
        mapLetter(o._1, g._1, s"group $gid from")
        mapLetter(o._2, g._2, s"group $gid to")
      }
    }
    assert(bij.values.toSet.size == bij.size, s"bijection not injective: $bij")
    assert(bij.get("user").contains("user"))
  }

  test("M4 tail: merged cluster connections re-join at threshold 0.6 (Src/servers.py:198-216)") {
    // the reference's cluster-level second LSH join: per-server
    // connection sets are rewritten into cluster space, merged per
    // cluster (A6 distinct-set agg), re-featurized and self-joined at
    // Jaccard distance <= 0.6. Composed here from the library pieces on
    // the reference's own v2 data; the LSH result is checked against an
    // exact all-pairs Jaccard replay of the same merged sets.
    val logs = TP.readLogJson(spark,
      "/root/reference/Data/data_processes_v2.json")
    val procs = TP.depthFeatures(TP.processes(logs))
    val withDepth = TP.logsWithDepth(logs, procs)
    val conns = TP.serverConnections(withDepth)
    val dim = TP.serverClusterDim(spark, conns)
    // rewrite the server prefix of each "related_In|Out_depth" token
    // through the cluster dim (the reference's replace_connections UDF)
    val m = dim.agg(map_from_entries(collect_list(
      struct(col("server_name"), col("cluster_id")))).as("__m"))
    val clusterConns = conns.join(dim, Seq("server_name"))
      .crossJoin(broadcast(m))
      .withColumn("cluster_connections",
        transform(col("connections"), c => concat(
          coalesce(element_at(col("__m"), element_at(split(c, "_"), 1)),
            element_at(split(c, "_"), 1)),
          lit("_"), element_at(split(c, "_"), 2),
          lit("_"), element_at(split(c, "_"), 3))))
    // A6: merged distinct connection set per cluster
    val merged = clusterConns.groupBy("cluster_id")
      .agg(array_distinct(flatten(collect_list(col("cluster_connections"))))
        .as("merged_conns"))
    val lsh = graft.similarity.Similarity
      .minhashJoin(merged, "cluster_id", "merged_conns", 0.6)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // exact replay over the (bounded) merged cluster dimension
    val sets = merged.collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]]("merged_conns").toSet).toMap
    val exact = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toDouble
      union = (sets(a) | sets(b)).size.toDouble
      if union > 0 && 1.0 - inter / union <= 0.6
    } yield (a, b)).toSet
    assert(lsh.subsetOf(exact), s"LSH invented pairs: ${lsh -- exact}")
    // fixed-seed LSH is deterministic; on this data recall is total
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }

  test("part2: element clusters group identical processes, refine splits by euler") {
    val (_, _) = (0, 0) // keep mini pipeline pieces local
    val logs = miniLogs
    val procs = TP.processes(logs)
    val dim = TP.serverClusterDim(spark,
      TP.serverConnections(TP.logsWithDepth(logs, TP.depthFeatures(procs))))
    val cl = TP.clusterLogs(logs, dim)
    val elems = TP.processElements(cl)
    val stage1 = TP.elementClusters(spark, elems, eps = 0.5, minPts = 2)
    val comps = stage1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(comps("p1") == comps("p2") && comps("p1") >= 0,
      "identical element sets must cluster together")
    val clProcs = TP.processes(cl, from = "cluster_from", to = "cluster_to")
    val fine = TP.refineClusters(spark, clProcs, stage1, eps = 6.0, minPts = 2)
    val f = fine.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("p1") == f("p2") && f("p1") >= 0)
    // part-2 report is non-empty (the reference's is always empty — U2 bug)
    val report = TP.part2Report(fine).collect().map(_.getString(0))
    assert(report.length == 1 && report.head.endsWith("['p1', 'p2']"),
      s"got ${report.toSeq}")
  }

  test("byte-golden: test.json part1Observations modulo group/letter bijection") {
    // The reference's own report leaves two choices to the RNG/collect
    // order (group numbers and cluster letters), so byte-compare after
    // normalizing exactly those on BOTH sides: blocks sorted by member
    // list, group ids renumbered by that order, letters renamed by first
    // appearance. Everything else — the Python-dict row formatting,
    // spacing, trailing spaces, newlines, row order — must match bytes.
    val goldenTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/Data/test.json_part1Observations.txt/" +
          "part-00000-ff710508-753e-4d64-9855-5661bfda4088-c000.txt")))
    val logs = TP.readLogJson(spark, "/root/reference/Data/test.json")
    val procs = TP.depthFeatures(TP.processes(logs))
    val dim = TP.serverClusterDim(spark,
      TP.serverConnections(TP.logsWithDepth(logs, procs)), 0.05)
    val cl = TP.clusterLogs(logs, dim)
    val groups = TP.equalProcesses(cl)
    val oursTxt = TP.part1ObservationsReport(cl, groups)
      .collect().map(_.getString(0) + "\n").mkString // as the text sink writes

    def normalize(txt: String): String = {
      val blocks = txt.split("\n\n").toVector
        .map(_.reverse.dropWhile(_ == '\n').reverse)
        .filter(_.trim.nonEmpty)
      val sorted = blocks.sortBy { b =>
        b.substring(b.indexOf('['), b.indexOf(']') + 1)
      }
      val renum = sorted.zipWithIndex.map { case (b, i) =>
        b.replaceFirst("^Group \\d+:", s"Group $i:")
      }
      val joined = renum.mkString("\n\n")
      val letterRe = "'(server_from|server_to)': '([^']+)'".r
      val canon = scala.collection.mutable.LinkedHashMap.empty[String, String]
      letterRe.findAllMatchIn(joined).foreach { m =>
        val v = m.group(2)
        if (v != "user" && !canon.contains(v)) canon(v) = f"C${canon.size}%02d"
      }
      letterRe.replaceAllIn(joined,
        m => s"'${m.group(1)}': '${canon.getOrElse(m.group(2), m.group(2))}'")
    }
    val (g, o) = (normalize(goldenTxt), normalize(oursTxt))
    if (g != o) {
      val i = g.zip(o).indexWhere { case (a, b) => a != b }
      val at = if (i < 0) math.min(g.length, o.length) else i
      fail(s"diverges at byte $at:\n  golden…${g.slice(at - 40, at + 40)}\n" +
        s"  ours…${o.slice(at - 40, at + 40)}")
    }
  }
}
