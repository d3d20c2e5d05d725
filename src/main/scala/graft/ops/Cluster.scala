package graft.ops

import graft.{GQuery, QueryModule, Tables}
import graft.cluster.Dbscan
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered queries for the algorithmic core (SURVEY.md §2.10):
  * MinHashLSH similarity join (M2), neighbor-list clustering (M3),
  * distributed DBSCAN in both jaccard and edit-distance flavors
  * (M5–M7), and connected components (M8). DBSCAN/CC outputs are
  * deterministic (min-label components) but not SQL-expressible, so
  * those entries carry no oracle — the property/fixture specs in
  * `src/test/scala` are their correctness gate (SURVEY.md §5.4).
  */
object Cluster extends QueryModule {

  /** Uniquifies [[ccLargeSmallStar]]'s per-round Observation names
    * across concurrent calls in one session (round-8 ADVICE). */
  private val CcObsCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Part co-occurrence edges for m11/m15/m24: (pa, pb) with pa < pb,
    * parts adjacent when ≥ 2 distinct orders contain both.
    *
    * Round-12 shape (guide §2.4, remove shuffles outright): the old
    * form was distinct(o, p) → self-join on o → groupBy(pa, pb) —
    * THREE exchanges (distinct, join, agg) plus a sort-merge join.
    * Orders bound their own line count (TPC-H ≤ 7 parts/order at any
    * SF), so the per-order pair set is a constant-size local product:
    * ONE groupBy(o) builds the distinct sorted part set per order
    * (collect_set dedups (o, p) inside the aggregate — the separate
    * distinct pass is gone), a higher-order transform emits the
    * ordered pairs per row (the lshPairs bucket-pair pattern — `ps`
    * is a materialized attribute, so the lambda never re-evaluates an
    * upstream expression), and ONE groupBy(pa, pb) counts supporting
    * orders. Two exchanges, no join, identical pair multiset — the
    * pair generation is bounded by order size, never by a hub part's
    * degree, so the shape holds at 100 TB. Measured at sf0.1
    * (isolated, min-of-2): m11 3.6 → 2.5 s, and the same frame feeds
    * m15/m24. */
  private[graft] def partCoEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(flatten(transform(col("ps"),
        x => transform(filter(col("ps"), y => y > x),
          y => struct(x.as("pa"), y.as("pb")))))).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select("pa", "pb")

  /** (user_id, day) sessions with their '-'-joined action path —
    * the process analog fed to the DBSCAN wrappers. */
  private def sessions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      // project BEFORE the spread: the repartition exchange must carry
      // only the four session columns, not the unused value/props
      // payload (explicit rather than trusting pruning through the
      // Repartition node)
      .select("user_id", "ts", "event_id", "event_type")
      // single-row-group file → 1-task scan; without the spread the
      // partial collect_list agg runs single-threaded on the scan task
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("day", expr("ts div 86400000000000"))
      .groupBy("user_id", "day")
      .agg(array_join(transform(array_sort(collect_list(struct(col("ts"),
        col("event_id"), col("event_type")))),
        e => e.getField("event_type")), "-").as("path"))
      .select((col("user_id") * 1000000 + col("day")).as("sid"), col("path"))

  /** Per-node triangle participation counts over an undirected edge
    * frame (columns pa < pb, distinct rows). Degree orientation —
    * every edge points from its lower-(degree, id) endpoint — makes
    * the orientation ACYCLIC with out-degree O(√E): each triangle has
    * exactly one node with two out-edges to the other two, so the
    * wedge self-join (the only quadratic step) is bounded by
    * out-degree rather than a hub's full degree, and each triangle is
    * counted exactly once. Output: (node, n_tri). */
  private[graft] def triangleCounts(e: DataFrame): DataFrame = {
    // explode(array(pa, pb)) reads the persisted edge frame once where
    // the union form read it twice (round 12 — see kcorePeel)
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    // PERSISTED (round 13): the wedge self-join consumes it twice. The
    // r12 no-persist choice ("recompute beats materialize, 2.9 vs
    // 3.3 s") was measured under the then-AQE-off protocol; under the
    // r13 AQE-on protocol the duplicated degree-join subtrees each pay
    // their own broadcast-exchange jobs and stage replans, and the
    // adjacent A/B flips: tracked 3.02/2.64 s vs untracked 5.23/4.46 s
    // at sf0.1 (16 jobs vs 22).
    val oriented = graft.Caches.track(e
      .join(deg.select(col("n").as("pa"), col("dg").as("da")), Seq("pa"))
      .join(deg.select(col("n").as("pb"), col("dg").as("db")), Seq("pb"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("pa") < col("pb")),
          struct(col("pa").as("f"), col("pb").as("t")))
          .otherwise(struct(col("pb").as("f"), col("pa").as("t")))
          .as("oe"))
      .select(col("oe.f").as("f"), col("oe.t").as("t")))
    val wedges = oriented.select(col("f"), col("t").as("b"))
      .join(oriented.select(col("f"), col("t").as("c")), Seq("f"))
      .filter(col("b") < col("c"))
    val tri = wedges
      .select(col("f"), least(col("b"), col("c")).as("pa"),
        greatest(col("b"), col("c")).as("pb"))
      .join(e, Seq("pa", "pb"))
    tri.select(explode(array(col("f"), col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  override def queries: Seq[GQuery] = Seq(

    // M2/J6: Spark ML seeded MinHashLSH approx similarity self-join over
    // document shingles at Jaccard distance <= 0.5. Oracle: exact
    // all-pairs Jaccard (valid because the data's similarity gap makes
    // LSH recall 1.0 here; the ScalaTest spec asserts recall >= 0.9 on
    // adversarial fixtures).
    GQuery("m2_minhash_ml",
      (s, d) => {
        val docs = Dedup.docShingles(s, d)
        Similarity.minhashJoin(docs, "doc_id", "sh", 0.5)
          .select(col("ida"), col("idb"), round(lit(1.0) - col("dist"), 4)
            .as("jac"))
          .orderBy("ida", "idb")
      },
      Some(Dedup.shingleSqlCte +
        """
          |SELECT a.doc_id AS ida, b.doc_id AS idb,
          |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
          |        len(list_distinct(a.sh || b.sh)), 4) AS jac
          |FROM s a JOIN s b ON a.doc_id < b.doc_id
          |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          |      len(list_distinct(a.sh || b.sh)) >= 0.5
          |ORDER BY ida, idb""".stripMargin)),

    // M3: neighbor-list clustering of near-dup documents — each doc's
    // cluster is {itself} ∪ {LSH neighbors at sim >= 0.5}, canonical
    // '+'-joined name; singletons via anti-join (`Src/servers.py:121-147`).
    GQuery("m3_neighbor_clusters",
      (s, d) => {
        val pairs = Dedup.lshPairs(s, d, 0.5)
          .select(col("da").as("ida"), col("db").as("idb"))
        Similarity.neighborClusters(
          Tables.documents(s, d).select("doc_id"), "doc_id", pairs)
          .select(col("doc_id"), col("cluster_name"),
            size(col("members")).cast("long").as("n_members"))
          .orderBy("doc_id")
      },
      Some(Dedup.shingleSqlCte +
        """,
          |p AS (SELECT a.doc_id AS da, b.doc_id AS db
          |      FROM s a JOIN s b ON a.doc_id < b.doc_id
          |      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          |            len(list_distinct(a.sh || b.sh)) >= 0.5),
          |sym AS (SELECT da AS id, db AS nbr FROM p
          |        UNION ALL SELECT db, da FROM p),
          |mem AS (SELECT id, nbr AS m FROM sym
          |        UNION ALL SELECT DISTINCT id, id FROM sym),
          |cl AS (SELECT id, string_agg(CAST(m AS VARCHAR), '+' ORDER BY m)
          |         AS cluster_name, count(*) AS n_members
          |       FROM mem GROUP BY id)
          |SELECT doc_id,
          |  coalesce(cl.cluster_name, CAST(doc_id AS VARCHAR)) AS cluster_name,
          |  coalesce(cl.n_members, 1) AS n_members
          |FROM documents LEFT JOIN cl ON documents.doc_id = cl.id
          |ORDER BY doc_id""".stripMargin)),

    // M5+M7: pivot-partitioned DBSCAN over session paths with token
    // edit distance (eps=2, minPts=3). Deterministic min-label
    // components — which makes the whole clustering SQL-expressible at
    // oracle scale: all-pairs distance (token-lev == char-lev under an
    // injective event_type→char encoding), core/ball logic, label
    // spreading, and a recursive-CTE transitive closure for the label
    // merge. DbscanSpec still guards the distributed machinery
    // (ring/block partitioning) on adversarial fixtures.
    GQuery("m5_dbscan_editdist",
      (s, d) => {
        val sess = s
        import sess.implicits._
        Dbscan.editDistanceDbscan(s,
          sessions(s, d).as[(Long, String)], 2.0, 3)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE
             |enc AS (SELECT event_type,
             |          chr(64 + CAST(row_number() OVER (ORDER BY event_type)
             |              AS INT)) AS c
             |        FROM (SELECT DISTINCT event_type FROM events)),
             |sess AS (SELECT e.user_id*1000000 +
             |                epoch_ns(e.ts)//86400000000000 AS sid,
             |                string_agg(enc.c, '' ORDER BY e.ts, e.event_id) AS v
             |         FROM events e JOIN enc ON e.event_type = enc.event_type
             |         GROUP BY e.user_id, epoch_ns(e.ts)//86400000000000),
             |reps AS (SELECT v, min(sid) AS rep, count(*) AS w
             |         FROM sess GROUP BY v),
             |nbr AS (SELECT a.rep AS ra, b.rep AS rb, b.w AS wb
             |        FROM reps a JOIN reps b ON a.rep <> b.rep
             |        WHERE abs(len(a.v) - len(b.v)) <= 2
             |          AND levenshtein(a.v, b.v) <= 2),
             |ball AS (SELECT ra AS rep, sum(wb) AS nbrw FROM nbr GROUP BY 1),
             |cores AS (SELECT r.rep FROM reps r
             |          LEFT JOIN ball b ON r.rep = b.rep
             |          WHERE r.w + coalesce(b.nbrw, 0) >= 3),
             |lab AS (SELECT rep AS label, rep AS pt FROM cores
             |        UNION
             |        SELECT c.rep AS label, n.rb AS pt
             |        FROM cores c JOIN nbr n ON n.ra = c.rep),
             |pmin AS (SELECT pt, min(label) AS l1 FROM lab GROUP BY pt),
             |edges AS (SELECT p.l1 AS s, l.label AS t FROM pmin p
             |          JOIN lab l ON l.pt = p.pt AND l.label <> p.l1),
             |sym AS (SELECT s, t FROM edges
             |        UNION SELECT t AS s, s AS t FROM edges),
             |verts AS (SELECT DISTINCT label AS vx FROM lab),
             |reach AS (SELECT vx, vx AS u FROM verts
             |          UNION
             |          SELECT r.vx, sym.t AS u
             |          FROM reach r JOIN sym ON r.u = sym.s),
             |comp AS (SELECT vx, min(u) AS cmp FROM reach GROUP BY vx),
             |ptc AS (SELECT l.pt, min(c.cmp) AS component FROM lab l
             |        JOIN comp c ON l.label = c.vx GROUP BY l.pt),
             |ro AS (SELECT r.v, coalesce(p.component, -1) AS component,
             |              (cr.rep IS NOT NULL) AS is_core
             |       FROM reps r LEFT JOIN ptc p ON r.rep = p.pt
             |       LEFT JOIN cores cr ON r.rep = cr.rep)
             |SELECT s.sid AS id, ro.component, ro.is_core
             |FROM sess s JOIN ro ON s.v = ro.v ORDER BY id""".stripMargin)),

    // M5+M6: DBSCAN with Jaccard distance over session action sets
    // (eps=0.4, minPts=3) — same SQL skeleton, Jaccard metric over the
    // canonical (sorted distinct) token sets.
    GQuery("m6_dbscan_jaccard",
      (s, d) => {
        val sess = s
        import sess.implicits._
        Dbscan.jaccardDbscan(s,
          sessions(s, d).as[(Long, String)], 0.4, 3)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE
             |sess AS (SELECT user_id*1000000 +
             |                epoch_ns(ts)//86400000000000 AS sid,
             |                array_to_string(list_sort(list_distinct(
             |                  list(event_type))), '-') AS v
             |         FROM events
             |         GROUP BY user_id, epoch_ns(ts)//86400000000000),
             |reps AS (SELECT v, min(sid) AS rep, count(*) AS w
             |         FROM sess GROUP BY v),
             |nbr AS (SELECT a.rep AS ra, b.rep AS rb, b.w AS wb
             |        FROM reps a JOIN reps b ON a.rep <> b.rep
             |        WHERE (CASE WHEN len(list_distinct(
             |                 string_split(a.v,'-') || string_split(b.v,'-'))) = 0
             |               THEN 1.0
             |               ELSE 1.0 - len(list_intersect(string_split(a.v,'-'),
             |                      string_split(b.v,'-'))) * 1.0
             |                    / len(list_distinct(string_split(a.v,'-') ||
             |                      string_split(b.v,'-')))
             |               END) <= 0.4),
             |ball AS (SELECT ra AS rep, sum(wb) AS nbrw FROM nbr GROUP BY 1),
             |cores AS (SELECT r.rep FROM reps r
             |          LEFT JOIN ball b ON r.rep = b.rep
             |          WHERE r.w + coalesce(b.nbrw, 0) >= 3),
             |lab AS (SELECT rep AS label, rep AS pt FROM cores
             |        UNION
             |        SELECT c.rep AS label, n.rb AS pt
             |        FROM cores c JOIN nbr n ON n.ra = c.rep),
             |pmin AS (SELECT pt, min(label) AS l1 FROM lab GROUP BY pt),
             |edges AS (SELECT p.l1 AS s, l.label AS t FROM pmin p
             |          JOIN lab l ON l.pt = p.pt AND l.label <> p.l1),
             |sym AS (SELECT s, t FROM edges
             |        UNION SELECT t AS s, s AS t FROM edges),
             |verts AS (SELECT DISTINCT label AS vx FROM lab),
             |reach AS (SELECT vx, vx AS u FROM verts
             |          UNION
             |          SELECT r.vx, sym.t AS u
             |          FROM reach r JOIN sym ON r.u = sym.s),
             |comp AS (SELECT vx, min(u) AS cmp FROM reach GROUP BY vx),
             |ptc AS (SELECT l.pt, min(c.cmp) AS component FROM lab l
             |        JOIN comp c ON l.label = c.vx GROUP BY l.pt),
             |ro AS (SELECT r.v, coalesce(p.component, -1) AS component,
             |              (cr.rep IS NOT NULL) AS is_core
             |       FROM reps r LEFT JOIN ptc p ON r.rep = p.pt
             |       LEFT JOIN cores cr ON r.rep = cr.rep)
             |SELECT s.sid AS id, ro.component, ro.is_core
             |FROM sess s JOIN ro ON s.v = ro.v ORDER BY id""".stripMargin)),

    // M8: connected components over a co-activity graph — users are
    // connected when they share >= 3 (hour, event_type) activity cells.
    // Hour granularity keeps cells small, so the candidate-pair join is
    // bounded (the coarser day-level cells produced ~20x more pairs for
    // the same component structure).
    // M11 (see [[triangleCounts]] for the algorithm):
    // distributed triangle counting with DEGREE ORIENTATION over
    // the part-co-occurrence graph: parts are adjacent when ≥ 2 orders
    // contain both (per-order fan-out is bounded by order size, so edge
    // generation is linear in lineitem; the support threshold is the
    // market-basket semantics AND the sparsifier — single co-occurrence
    // is noise, and keeping it makes the wedge stage pay ~50M pairs at
    // sf0.1 for triangles of no meaning). Orienting every edge
    // from its lower-(degree, id) endpoint makes the orientation
    // acyclic with out-degree O(sqrt(|E|)) — each triangle then has
    // EXACTLY one node with two out-edges to the others, so the
    // wedge self-join (the only quadratic step) is bounded by
    // out-degree, never by a hub's full degree. The standard way to
    // count triangles on a 100 TB graph without a hub blowup.
    GQuery("m11_triangles",
      (s, d) => {
        val e = partCoEdges(s, d)
          .transform(graft.Caches.track)
        triangleCounts(e)
          .orderBy(col("n_tri").desc, col("node")).limit(15)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |  FROM lineitem),
             |e AS (SELECT a.p AS pa, b.p AS pb
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
             |      GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (SELECT n, count(*) AS dg FROM (
             |          SELECT pa AS n FROM e
             |          UNION ALL SELECT pb FROM e) GROUP BY 1),
             |r AS (SELECT
             |        CASE WHEN d1.dg < d2.dg OR
             |                  (d1.dg = d2.dg AND pa < pb)
             |             THEN pa ELSE pb END AS f,
             |        CASE WHEN d1.dg < d2.dg OR
             |                  (d1.dg = d2.dg AND pa < pb)
             |             THEN pb ELSE pa END AS t
             |      FROM e JOIN deg d1 ON d1.n = pa
             |             JOIN deg d2 ON d2.n = pb),
             |w AS (SELECT e1.f, e1.t AS b, e2.t AS c
             |      FROM r e1 JOIN r e2 ON e1.f = e2.f AND e1.t < e2.t),
             |tri AS (SELECT w.f, least(w.b, w.c) AS pa,
             |          greatest(w.b, w.c) AS pb
             |        FROM w JOIN e
             |          ON e.pa = least(w.b, w.c)
             |         AND e.pb = greatest(w.b, w.c)),
             |nodes AS (SELECT unnest([f, pa, pb]) AS node FROM tri)
             |SELECT node, count(*) AS n_tri FROM nodes
             |GROUP BY 1 ORDER BY n_tri DESC, node LIMIT 15""".stripMargin)),

    // K-core decomposition (fixed 3 peeling rounds over m11's part
    // co-occurrence graph): iteratively delete vertices of degree < K —
    // the dense-substructure extractor behind community seeds and spam-
    // ring mining. Each round is two keyed aggregations + two semi-
    // shaped equi-joins, all shuffles on the vertex id; no all-pairs
    // anywhere, so a 100 TB edge list peels in O(E) per round. The
    // REGISTERED query runs exactly KcoreRounds rounds so the DuckDB
    // oracle can replay every round as a CTE chain; the run-to-
    // convergence variant (`kcoreConverged`, localCheckpoint lineage
    // cuts per round, stops when the vertex count is stable) is the
    // library path, gated by ConvergenceSpec.
    GQuery("m15_kcore",
      (s, d) => {
        val e = partCoEdges(s, d)
          .unionByName(plantedKcoreEdges(s))
          .transform(graft.Caches.track)
        kcorePeel(e, KcoreK, KcoreRounds)
          .orderBy("node")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |  FROM lineitem),
             |""".stripMargin + plantedKcoreSql + """,
             |e0 AS MATERIALIZED (SELECT a.p AS pa, b.p AS pb
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
             |      GROUP BY 1, 2 HAVING count(*) >= 2
             |      UNION ALL SELECT pa, pb FROM planted),
             |""".stripMargin +
        (1 to KcoreRounds).map(i => kcoreSqlRound(i, s"e${i - 1}"))
          .mkString(",\n") +
        s"""
           |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
           |  SELECT pa AS node FROM e$KcoreRounds
           |  UNION ALL SELECT pb FROM e$KcoreRounds)
           |GROUP BY 1 ORDER BY node""".stripMargin)),

    // M24: the run-to-CONVERGENCE k-core (what a user actually runs;
    // m15's fixed 3 rounds exist so the oracle replay depth is pinned)
    // promoted from spec-gated to first-class (round-10 VERDICT #6).
    // The oracle replays the same peeling-round CTE chain as m15 but to
    // a depth that provably reaches the fixpoint on the harness data:
    // peeling is monotone (each round's edge set ⊆ the previous), and
    // the measured stabilization is round 4 (sf0.01) / 6 (sf0.1, sf1) —
    // 8 chained rounds therefore land ON the fixpoint at every measured
    // SF, verified by diffing the 8- vs 9-round chains (identical at
    // all three SFs). ConvergenceSpec cross-checks the registered query
    // against both the library's kcoreConverged and a deep fixed-rounds
    // peel, so registered == library is a spec invariant, not a reading.
    GQuery("m24_kcore_converged",
      (s, d) => {
        val e = partCoEdges(s, d)
          .unionByName(plantedKcoreEdges(s))
        kcoreConverged(e, KcoreK).orderBy("node")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             |  FROM lineitem),
             |""".stripMargin + plantedKcoreSql + """,
             |e0 AS MATERIALIZED (SELECT a.p AS pa, b.p AS pb
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
             |      GROUP BY 1, 2 HAVING count(*) >= 2
             |      UNION ALL SELECT pa, pb FROM planted),
             |""".stripMargin +
        (1 to 8).map(i => kcoreSqlRound(i, s"e${i - 1}"))
          .mkString(",\n") +
        s"""
           |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
           |  SELECT pa AS node FROM e8
           |  UNION ALL SELECT pb FROM e8)
           |GROUP BY 1 ORDER BY node""".stripMargin)),

    GQuery("m8_connected_components",
      (s, d) => {
        // persisted EAGERLY: the distinct activity-cell summary feeds
        // BOTH sides of the self-join and the vertex set — unpersisted,
        // the events scan + distinct shuffle runs three times, and a
        // LAZY persist still lets the three consumers' stages race to
        // first-touch the unbuilt cache under the AQE-on protocol
        // (each recomputing the full scan+distinct — the m23 pattern).
        val ue = Tables.events(s, d)
          .withColumn("hour", expr("ts div 3600000000000"))
          .select("user_id", "hour", "event_type").distinct()
          .localCheckpoint(true)
        val e = coActivityEdges(ue, 3)
        val v = ue.select(col("user_id").as("v")).distinct()
        Dbscan.connectedComponents(s, v, e).orderBy("v")
      },
      // components ARE SQL-expressible at oracle scale: transitive
      // closure via recursive CTE, component label = min reachable id —
      // the same min-label semantics the union-find/GraphX path produces.
      Some("""WITH RECURSIVE
             |ue AS (SELECT DISTINCT user_id,
             |         epoch_ns(ts) // 3600000000000 AS hour, event_type
             |       FROM events),
             |e AS (SELECT a.user_id AS l1, b.user_id AS l2
             |      FROM ue a JOIN ue b ON a.hour = b.hour
             |        AND a.event_type = b.event_type AND a.user_id < b.user_id
             |      GROUP BY 1, 2 HAVING count(*) >= 3),
             |sym AS (SELECT l1 AS s, l2 AS t FROM e
             |        UNION ALL SELECT l2, l1 FROM e),
             |verts AS (SELECT DISTINCT user_id AS v FROM events),
             |reach AS (SELECT v, v AS u FROM verts
             |          UNION
             |          SELECT r.v, sym.t AS u
             |          FROM reach r JOIN sym ON r.u = sym.s)
             |SELECT v, min(u) AS component FROM reach GROUP BY v
             |ORDER BY v""".stripMargin)),

    // M17: the SAME component semantics as m8, computed by the pure-
    // DataFrame large-star/small-star contraction instead of
    // union-find/GraphX ([[ccLargeSmallStar]]) — registered first-class
    // because a CONVERGED CC has an exact declarative oracle. Until
    // round 10 that oracle was the reachability-closure recursive CTE —
    // correct but quadratic in component size, so the sf1 gate (13.9M
    // edges, dense blobs) had to exclude it a priori. Replaced by a
    // BOUNDED min-label propagation with pointer doubling: each chained
    // MATERIALIZED round sets L(v) = min(L(v), min over in-neighbors
    // L(u), L(L(v))); the L(L(v)) term squares the effective radius per
    // round, so 6 rounds cover any component the closure could. Round
    // sufficiency is not assumed: the 6-round chain was diffed against
    // the 7-round chain at sf0.01/sf0.1/sf1 (identical → fixpoint ≤6)
    // and against the old closure oracle where the closure is feasible
    // (sf0.01/sf0.1, identical). sf1 replay: ~34 s in DuckDB vs the
    // closure's a-priori-excluded quadratic blowup — this closed the
    // last top-15 sf1 oracle cell (14/14 → 15/15, SCALE.md round 10).
    GQuery("m17_cc_star",
      (s, d) => {
        // eager persist — see m8 (three consumers racing a lazy cache)
        val ue = Tables.events(s, d)
          .withColumn("hour", expr("ts div 3600000000000"))
          .select("user_id", "hour", "event_type").distinct()
          .localCheckpoint(true)
        val e = coActivityEdges(ue, 3)
        val v = ue.select(col("user_id").as("v")).distinct()
        val comp = ccLargeSmallStar(e)._1
        v.join(comp, Seq("v"), "left")
          .select(col("v"),
            coalesce(col("component"), col("v")).as("component"))
          .orderBy("v")
      },
      Some {
        val base =
          """WITH
            |ue AS MATERIALIZED (SELECT DISTINCT user_id,
            |    epoch_ns(ts) // 3600000000000 AS hour, event_type
            |  FROM events),
            |e AS MATERIALIZED (SELECT a.user_id AS l1, b.user_id AS l2
            |  FROM ue a JOIN ue b ON a.hour = b.hour
            |    AND a.event_type = b.event_type AND a.user_id < b.user_id
            |  GROUP BY 1, 2 HAVING count(*) >= 3),
            |sym AS MATERIALIZED (SELECT l1 AS s, l2 AS t FROM e
            |  UNION ALL SELECT l2, l1 FROM e),
            |l0 AS MATERIALIZED (
            |  SELECT DISTINCT user_id AS v, user_id AS l FROM events)""".stripMargin
        val rounds = (1 to 6).map { i =>
          val p = s"l${i - 1}"
          s""",
             |l$i AS MATERIALIZED (SELECT v, min(l) AS l FROM (
             |    SELECT v, l FROM $p
             |    UNION ALL
             |    SELECT sym.t AS v, $p.l FROM sym JOIN $p ON sym.s = $p.v
             |    UNION ALL
             |    SELECT a.v, b.l FROM $p a JOIN $p b ON a.l = b.v
             |  ) GROUP BY v)""".stripMargin
        }.mkString
        base + rounds + "\nSELECT v, l AS component FROM l6 ORDER BY v"
      }),

    // M13: PageRank — two power iterations over the customer↔supplier
    // order graph (nodes disambiguated as 2·custkey / 2·suppkey+1,
    // edges symmetrized), the crawl-frontier / domain-authority
    // primitive of a web-scale ingest pipeline. Each iteration is the
    // standard Pregel-as-join shape: contributions = rank ⋈ degree
    // projected along edges, one keyed sum per destination — every
    // shuffle is on the node key, nothing corpus-sized is broadcast,
    // exactly the plan a 1000-executor graph run wants. Arithmetic is
    // INTEGER-EXACT end to end so DuckDB replays it bit-for-bit:
    // micro-ranks start at 1e6, per-edge contributions use integer
    // division r div deg, and the damping step is 150000 + (17·s div 20)
    // — the 0.85 factor as exact integer arithmetic, never a float
    // product (whose rounding differs between engines). Convergence
    // needs more iterations at depth; the loop shape (like n7's Lloyd
    // chain) extends without changing any stage's cost.
    GQuery("m13_pagerank",
      (s, d) => pagerank(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b")), 2)
        .orderBy(col("r").desc, col("node")).limit(25)
        .select(col("node"), col("r").as("rank_micro")),
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |        UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
             |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r
             |       FROM deg),
             |c1 AS (SELECT sym.dst AS node,
             |         CAST(sum(r0.r // deg.deg) AS BIGINT) AS s
             |       FROM sym JOIN r0 ON sym.src = r0.node
             |                JOIN deg ON sym.src = deg.src
             |       GROUP BY 1),
             |r1 AS (SELECT node,
             |         CAST(150000 + (17 * s) // 20 AS BIGINT) AS r
             |       FROM c1),
             |c2 AS (SELECT sym.dst AS node,
             |         CAST(sum(r1.r // deg.deg) AS BIGINT) AS s
             |       FROM sym JOIN r1 ON sym.src = r1.node
             |                JOIN deg ON sym.src = deg.src
             |       GROUP BY 1)
             |SELECT node, CAST(150000 + (17 * s) // 20 AS BIGINT)
             |  AS rank_micro
             |FROM c2 ORDER BY rank_micro DESC, node LIMIT 25""".stripMargin)),

    // M14 (see [[labelPropagation]]): synchronous LPA community
    // detection over the same customer↔supplier graph m13 ranks — the
    // label frame is node-keyed, each iteration is one count shuffle +
    // one per-node window, and determinism comes from the
    // (count desc, min label) tie-break rather than hash-order mode().
    GQuery("m14_label_prop",
      (s, d) => labelPropagation(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b")), 2)
        .orderBy("node"),
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |        UNION ALL SELECT b, a FROM e),
             |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
             |c1 AS (SELECT sym.dst AS node, l0.lbl AS cand, count(*) AS n
             |       FROM sym JOIN l0 ON sym.src = l0.node GROUP BY 1, 2),
             |l1 AS (SELECT node, cand AS lbl FROM (
             |  SELECT node, cand, row_number() OVER (PARTITION BY node
             |    ORDER BY n DESC, cand) AS rn FROM c1) WHERE rn = 1),
             |c2 AS (SELECT sym.dst AS node, l1.lbl AS cand, count(*) AS n
             |       FROM sym JOIN l1 ON sym.src = l1.node GROUP BY 1, 2)
             |SELECT node, cand AS lbl FROM (
             |  SELECT node, cand, row_number() OVER (PARTITION BY node
             |    ORDER BY n DESC, cand) AS rn FROM c2) WHERE rn = 1
             |ORDER BY node""".stripMargin)),

    // M16: single-source shortest path (BFS hop distance) from the
    // seed node over the same symmetrized customer↔supplier graph as
    // m13/m14 — the reachability-with-distance primitive behind crawl
    // frontier scheduling and link-depth features. Each round is a
    // frontier expansion (one join on src) + a min-combine (one keyed
    // aggregation): Bellman-Ford-as-join, all shuffles node-keyed,
    // distance state bounded by |V|, nothing broadcast — the plan a
    // 1000-executor BFS wants. Arithmetic is pure BIGINT (dist + 1,
    // min) so every round replays bit-exactly. The REGISTERED query
    // runs exactly SsspRounds rounds so DuckDB replays each round as a
    // CTE; the run-to-empty-frontier variant ([[ssspConverged]],
    // localCheckpoint lineage cuts per round — a 40-hop chain peels
    // one hop per round with O(1) plans) is the library path, gated by
    // ConvergenceSpec.
    GQuery("m16_sssp",
      (s, d) => sssp(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b")), SsspSeed, SsspRounds)
        .orderBy("node"),
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |        UNION ALL SELECT b, a FROM e),
             |d0 AS (SELECT CAST(2 AS BIGINT) AS node,
             |         CAST(0 AS BIGINT) AS dist),
             |""".stripMargin +
        (1 to SsspRounds).map(i => ssspSqlRound(i, s"d${i - 1}"))
          .mkString(",\n") +
        s"""
           |SELECT node, dist FROM d$SsspRounds ORDER BY node"""
          .stripMargin)),

    // M18: HITS hubs-and-authorities over the DIRECTED customer→
    // supplier order graph — the link-analysis dual of m13's PageRank
    // (authority = endorsed by good hubs; hub = endorses good
    // authorities), the classic crawl-seed / source-reputation signal.
    // 1.5 mutual-reinforcement rounds (a¹ ← h⁰, h¹ ← a¹, a² ← h¹),
    // INTEGER-exact: h⁰ = 1e6 for every customer makes a¹ exactly
    // 1e6·indegree (computed directly as one keyed count — the
    // algebra, not a join), and the two remaining steps are keyed
    // sums over the persisted distinct edge frame. Un-normalized on
    // purpose: 2 rounds stay well inside BIGINT (≤1e15 here), both
    // engines replay bit-for-bit; at depth each round divides by the
    // global score sum — a 1-row broadcast, same shape as m13's
    // damping. Every shuffle is keyed by an endpoint; the score
    // frames (per-customer / per-supplier) broadcast into the edge
    // joins at this scale and degrade to keyed shuffle joins past the
    // threshold — nothing corpus-sized is ever broadcast.
    GQuery("m18_hits",
      (s, d) => {
        // eager persist (round 13): a1, the h1 join and the final join
        // are three concurrent consumers — see m8/m23
        val e = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
          .distinct()
          .localCheckpoint(true)
        val a1 = e.groupBy("v")
          .agg((count(lit(1)) * 1000000L).as("a"))
        val h1 = e.join(a1, Seq("v"))
          .groupBy("u").agg(sum("a").as("h"))
        e.join(h1, Seq("u"))
          .groupBy("v").agg(sum(col("h")).as("auth"))
          .orderBy(col("auth").desc, col("v"))
          .limit(25)
          .select(col("v").as("suppkey"), col("auth"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey AS u, l_suppkey AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |a1 AS (SELECT v, CAST(count(*) * 1000000 AS BIGINT) AS a
             |       FROM e GROUP BY 1),
             |h1 AS (SELECT u, CAST(sum(a) AS BIGINT) AS h
             |       FROM e JOIN a1 USING (v) GROUP BY 1),
             |a2 AS (SELECT v, CAST(sum(h) AS BIGINT) AS auth
             |       FROM e JOIN h1 USING (u) GROUP BY 1)
             |SELECT v AS suppkey, auth FROM a2
             |ORDER BY auth DESC, v LIMIT 25""".stripMargin)),

    // M19: EXACT modularity scoring of m14's LPA communities — the
    // quality metric that turns "we clustered the graph" into a
    // number (Newman Q: within-community edge excess over the random-
    // graph expectation). Kept INTEGER-exact as a fraction over the
    // common denominator 4m²: per community c, contrib_num =
    // 4·m·e_c − d_c² and q_den = 4m², so Q = Σ contrib_num / q_den
    // with zero float arithmetic anywhere (bounds: both terms ≤ 4m²
    // ≈ 1e12 at sf0.1 — far inside BIGINT). Shape: the LPA label
    // frame joins the edge frame twice (both endpoint labels, keyed
    // equi-joins), then two keyed aggs; m rides as a 1-row broadcast.
    // Top 25 communities by size keeps the output bounded at any SF.
    GQuery("m19_modularity",
      (s, d) => {
        // eager persists (round 13): e feeds the LPA, the edge count m,
        // the degree frame and both ein legs; lbl feeds dc and ein —
        // lazy caches let those concurrent branches race (see m8/m23)
        val e = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b"))
          .distinct()
          .localCheckpoint(true)
        val lbl = labelPropagation(e, 2).localCheckpoint(true)
        val m = e.agg(count(lit(1)).as("m"))
        val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val dc = deg.join(lbl, Seq("node"))
          .groupBy("lbl")
          .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_sum"))
        val ein = e
          .join(lbl.select(col("node").as("a"), col("lbl").as("la")),
            Seq("a"))
          .join(lbl.select(col("node").as("b"), col("lbl").as("lb")),
            Seq("b"))
          .filter(col("la") === col("lb"))
          .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_in"))
        dc.join(ein, Seq("lbl"), "left")
          .crossJoin(broadcast(m))
          .select(col("lbl"), col("n_nodes"),
            coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"),
            (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L))
              - col("d_sum") * col("d_sum")).as("contrib_num"),
            (lit(4L) * col("m") * col("m")).as("q_den"))
          .orderBy(col("n_nodes").desc, col("lbl")).limit(25)
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |        UNION ALL SELECT b, a FROM e),
             |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
             |c1 AS (SELECT sym.dst AS node, l0.lbl AS cand, count(*) AS n
             |       FROM sym JOIN l0 ON sym.src = l0.node GROUP BY 1, 2),
             |l1 AS (SELECT node, cand AS lbl FROM (
             |  SELECT node, cand, row_number() OVER (PARTITION BY node
             |    ORDER BY n DESC, cand) AS rn FROM c1) WHERE rn = 1),
             |c2 AS (SELECT sym.dst AS node, l1.lbl AS cand, count(*) AS n
             |       FROM sym JOIN l1 ON sym.src = l1.node GROUP BY 1, 2),
             |l2 AS (SELECT node, cand AS lbl FROM (
             |  SELECT node, cand, row_number() OVER (PARTITION BY node
             |    ORDER BY n DESC, cand) AS rn FROM c2) WHERE rn = 1),
             |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
             |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
             |        FROM (SELECT a AS node FROM e
             |              UNION ALL SELECT b FROM e) GROUP BY 1),
             |dc AS (SELECT l2.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
             |         CAST(sum(deg.deg) AS BIGINT) AS d_sum
             |       FROM l2 JOIN deg ON l2.node = deg.node GROUP BY 1),
             |ein AS (SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_in
             |        FROM e JOIN l2 la ON e.a = la.node
             |               JOIN l2 lb ON e.b = lb.node
             |        WHERE la.lbl = lb.lbl GROUP BY 1)
             |SELECT dc.lbl, dc.n_nodes,
             |  CAST(coalesce(ein.e_in, 0) AS BIGINT) AS e_in, dc.d_sum,
             |  CAST(4 * mm.m * coalesce(ein.e_in, 0)
             |    - dc.d_sum * dc.d_sum AS BIGINT) AS contrib_num,
             |  CAST(4 * mm.m * mm.m AS BIGINT) AS q_den
             |FROM dc LEFT JOIN ein ON dc.lbl = ein.lbl CROSS JOIN mm
             |ORDER BY n_nodes DESC, dc.lbl LIMIT 25""".stripMargin)),

    // M23: seeded random walks — the DeepWalk/node2vec sampling
    // primitive: fixed-length walks whose step choices are
    // hash-derived (md5 of walk id, step, current node), so the
    // "random" corpus is bit-reproducible across engines and reruns
    // (exactly how production walk corpora pin their seeds). Graph =
    // m13's customer↔supplier order graph; walks start at every
    // 20th node and take 3 steps. Scale posture: each step is TWO
    // equi-joins keyed on the node — degree attach, then (node, idx)
    // adjacency probe where idx = hash % degree. The (node, idx)
    // composite key SHARDS a hub's adjacency list across partitions,
    // so a 1M-degree hub never concentrates on one task — and that
    // holds for the adjacency CONSTRUCTION too (round-7 ADVICE): idx
    // is ranked within ORDER-PRESERVING dst-range buckets (the x35
    // shardShuffle pattern) — rank inside (src, bucket) plus a per-src
    // prefix offset over the bucket-count frame — so a hub's ranking
    // spreads across ~deg/2^16 tasks instead of one src-partition
    // window task, while producing idx values IDENTICAL to the
    // oracle's row_number() OVER (PARTITION BY src ORDER BY dst).
    // Adjacency and degree frames are built once, persisted, and
    // reused by all 3 hops; walk count scales with nodes, never
    // quadratic.
    GQuery("m23_random_walks",
      (s, d) => {
        val e = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("a"),
            (col("l_suppkey") * 2 + 1).as("b"))
          .distinct()
          // EAGER localCheckpoint, not lazy track (round 13): sym's
          // two branches and the deg/adj consumers re-run the
          // scan+join+distinct up to 4× without a persist, and a LAZY
          // persist still lets the consumers race — under the AQE-on
          // protocol the three hop joins' broadcast-subquery futures
          // launch concurrently with the degree probe, each
          // first-touching the unbuilt cache and re-scanning ~108 MB
          // of base parquet (measured three concurrent duplicate scan
          // stages). Eager cuts materialize each frame exactly once,
          // in dependency order.
          .localCheckpoint(true)
        val sym = e.select(col("a").as("src"), col("b").as("dst"))
          .union(e.select(col("b").as("src"), col("a").as("dst")))
        val deg = sym
          .groupBy(col("src").as("cur"))
          .agg(count(lit(1)).cast("long").as("deg"))
          .localCheckpoint(true)
        // one bounded probe on the persisted degree frame decides the
        // construction: past the hub cap the sharded ranking runs.
        // (The probe also MATERIALIZES the deg cache before the hop
        // assembly references it three times.)
        val maxDegRow = deg.agg(max(col("deg"))).head()
        val maxDeg = if (maxDegRow.isNullAt(0)) 0L else maxDegRow.getLong(0)
        // adj is EAGERLY localCheckpoint-ed, not lazily tracked (round
        // 13): all three hop joins reference it, and under the AQE-on
        // protocol their adjacency-side stages launch as concurrent
        // subquery jobs — with a lazy cache each raced to first-touch
        // it and recomputed the full sym+rank subtree (measured: four
        // concurrent ~5 s jobs, each re-reading the base tables and
        // re-shuffling ~15 MB, m23 ~18 s in a degraded window). The
        // eager cut materializes the ranking exactly once; checkpoint
        // preserves its partitioning for the hop joins.
        // ... and pre-partitioned by the hop-join key (cur, idx), so
        // the three hop SMJs read the checkpoint's partitioning
        // instead of re-exchanging the full adjacency per hop (the
        // walk frontier is the only per-hop shuffle; the composite key
        // keeps hub adjacency sharded at any scale).
        val adj = rankAdjacency(sym, sharded = maxDeg > HubRankCap)
          .repartition(col("cur"), col("idx"))
          .localCheckpoint(true)
        def hop(w: DataFrame, t: Int): DataFrame =
          w.join(deg, Seq("cur"))
            .withColumn("idx",
              conv(substring(md5(concat(lit("walk_"),
                col("walk_id").cast("string"), lit(s"_${t}_"),
                col("cur").cast("string"))), 1, 8), 16, 10)
                .cast("long") % col("deg"))
            .join(adj, Seq("cur", "idx"))
            .select(col("walk_id"), col("dst").as("cur"),
              concat(col("path"), lit("-"),
                col("dst").cast("string")).as("path"))
        val w0 = deg.filter(col("cur") % 20 === 0)
          .select(col("cur").as("walk_id"), col("cur"),
            col("cur").cast("string").as("path"))
        hop(hop(hop(w0, 1), 2), 3)
          .select(col("walk_id"), col("path"),
            col("cur").as("end_node"))
          .orderBy("walk_id")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sym AS (SELECT a AS src, b AS dst FROM e
             |        UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
             |        FROM sym GROUP BY 1),
             |adj AS (SELECT src, dst,
             |          CAST(row_number() OVER (PARTITION BY src
             |            ORDER BY dst) - 1 AS BIGINT) AS idx
             |        FROM sym),
             |w0 AS (SELECT src AS walk_id, src AS cur,
             |         CAST(src AS VARCHAR) AS path
             |       FROM deg WHERE src % 20 = 0),
             |w1 AS (SELECT w0.walk_id, adj.dst AS cur,
             |         w0.path || '-' || adj.dst AS path
             |       FROM w0 JOIN deg ON deg.src = w0.cur
             |         JOIN adj ON adj.src = w0.cur AND adj.idx =
             |           ('0x' || substr(md5('walk_' || w0.walk_id ||
             |             '_1_' || w0.cur), 1, 8))::BIGINT % deg.deg),
             |w2 AS (SELECT w1.walk_id, adj.dst AS cur,
             |         w1.path || '-' || adj.dst AS path
             |       FROM w1 JOIN deg ON deg.src = w1.cur
             |         JOIN adj ON adj.src = w1.cur AND adj.idx =
             |           ('0x' || substr(md5('walk_' || w1.walk_id ||
             |             '_2_' || w1.cur), 1, 8))::BIGINT % deg.deg),
             |w3 AS (SELECT w2.walk_id, adj.dst AS cur,
             |         w2.path || '-' || adj.dst AS path
             |       FROM w2 JOIN deg ON deg.src = w2.cur
             |         JOIN adj ON adj.src = w2.cur AND adj.idx =
             |           ('0x' || substr(md5('walk_' || w2.walk_id ||
             |             '_3_' || w2.cur), 1, 8))::BIGINT % deg.deg)
             |SELECT walk_id, path, cur AS end_node
             |FROM w3 ORDER BY walk_id""".stripMargin))
  )

  /** Two synchronous label-propagation iterations over an undirected
    * (a, b) edge frame — community detection (denser-than-random
    * neighborhoods), where connected components (m8) only answer
    * reachability. Fully deterministic: each node adopts the label
    * with the highest neighbor frequency, ties broken by the SMALLEST
    * label — one keyed count + one per-node window rank per iteration,
    * no mode() nondeterminism, no floats anywhere, so the oracle
    * replays both iterations exactly. Returns (node, lbl). */
  /** m15 constants: core threshold and the fixed oracle round count.
    * K=2 (prune-to-cycles): the w≥2 co-occurrence graph thins with SF
    * (sf0.1: max degree 6), so K=3 empties at bench scale while K=2
    * keeps a non-trivial core at every harness SF (1535 nodes at
    * sf0.01, 13 at sf0.1 — measured). */
  private[graft] val KcoreK = 2
  private[graft] val KcoreRounds = 3

  /** Planted k-core harness subgraph (round-10 VERDICT #5): the
    * organic w≥2 co-occurrence graph THINS as SF grows (measured core:
    * 1,535 nodes at sf0.01, 13 at sf0.1, 130 at sf1), so at bench
    * scale the k-core operators were correctness-tested on near-trivial
    * cores. Both engines now union a deterministic planted structure —
    * the d5 planted-clone trick, graph edition — in an id namespace
    * (1e12+) disjoint from any part key at any SF:
    *
    *   - 4 cliques of 30 (node c·1000+i): 120 core nodes of degree 29
    *     that survive every peel at every SF;
    *   - 15 pendants per clique (degree 1): peeled in round 1;
    *   - one 3-chain per clique (clique node 0 – 200 – 201 – 202):
    *     peels one node per round, reaching ITS fixpoint exactly at
    *     round [[KcoreRounds]] — so the planted part exercises every
    *     round of m15's fixed peel and never extends m24's measured
    *     organic convergence depth (4–6 rounds, < the 8-round oracle
    *     chain).
    *
    * 1,812 edges — a constant-size fixture, not data-derived, so the
    * frame is a literal in both engines. */
  private[graft] def plantedKcoreEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    val P = 1000000000000L
    val cliques = for {
      c <- 0 until 4; i <- 0 until 30; j <- (i + 1) until 30
    } yield (P + c * 1000L + i, P + c * 1000L + j)
    val pendants = for { c <- 0 until 4; p <- 0 until 15 }
      yield (P + c * 1000L + p, P + c * 1000L + 100 + p)
    val chains = for {
      c <- 0 until 4
      (f, t) <- Seq((0L, 200L), (200L, 201L), (201L, 202L))
    } yield (P + c * 1000L + f, P + c * 1000L + t)
    (cliques ++ pendants ++ chains).toDF("pa", "pb")
  }

  /** SQL twin of [[plantedKcoreEdges]] — same 1,812 rows via range()
    * products (verified identical multiset). */
  private[graft] val plantedKcoreSql: String =
    """planted AS (
      |  SELECT 1000000000000 + c.c*1000 + i.i AS pa,
      |         1000000000000 + c.c*1000 + j.j AS pb
      |  FROM range(4) c(c), range(30) i(i), range(30) j(j)
      |  WHERE i.i < j.j
      |  UNION ALL
      |  SELECT 1000000000000 + c.c*1000 + p.p,
      |         1000000000000 + c.c*1000 + 100 + p.p
      |  FROM range(4) c(c), range(15) p(p)
      |  UNION ALL
      |  SELECT 1000000000000 + c.c*1000 + x.f,
      |         1000000000000 + c.c*1000 + x.t
      |  FROM range(4) c(c),
      |       (VALUES (0,200),(200,201),(201,202)) x(f,t))""".stripMargin

  /** Oracle fragment: one peeling round `prevE` → `e$i` (degree count,
    * ≥K survivor set, edge filter to both-endpoint survivors). */
  // AS MATERIALIZED (DuckDB-only syntax — oracles never run through
  // Spark's parser): each round references its predecessor three times
  // (twice in the degree union, once in the survivor join), so an
  // inlining replay recomputes e0 3^rounds times — the reason the sf1
  // oracle timed out at >5 min in round 8. Materialized, each round is
  // computed once and the sf1 replay is seconds (round-8 VERDICT #5).
  private def kcoreSqlRound(i: Int, prevE: String): String =
    s"""deg$i AS (SELECT n, count(*) AS dg FROM (
       |  SELECT pa AS n FROM $prevE
       |  UNION ALL SELECT pb FROM $prevE) GROUP BY 1),
       |s$i AS (SELECT n FROM deg$i WHERE dg >= $KcoreK),
       |e$i AS MATERIALIZED (SELECT pa, pb FROM $prevE
       |        JOIN s$i sa ON sa.n = pa
       |        JOIN s$i sb ON sb.n = pb)""".stripMargin

  /** Exactly `rounds` peeling rounds of the k-core loop; output = the
    * residual degree of every endpoint of the surviving edge set (the
    * SQL-replayable finite prefix of [[kcoreConverged]]). */
  private[graft] def kcorePeel(edges: DataFrame, k: Int, rounds: Int)
      : DataFrame = {
    // degree via explode(array(pa, pb)), not unionAll(pa, pb): each
    // round references its predecessor through BOTH the survivor set
    // (twice) and the edge filter (once), so the analyzed-plan size is
    // (1 + 2·refs-in-deg)^rounds × the edge subtree. unionAll reads e
    // twice inside deg → 5^3 = 125 copies at 3 rounds (measured: a
    // 9,800-line formatted plan, 502 parquet scans in print — Catalyst
    // pays that tree on every action even though execution hits the
    // per-round persisted frames). explode reads e once → 3^3 = 27.
    // Same multiset of endpoint rows, same counts (guide §3.3: very
    // large plans make planning itself the bottleneck).
    // Rounds are localCheckpoint-ed EAGERLY (round 13) instead of
    // lazily tracked: under the AQE-on bench protocol the lazy form
    // left all 3 rounds inside ONE action whose deep stage chain ran
    // as ~29 sequential adaptive query-stage jobs, each paying its own
    // replan + scheduling latency (measured 5.4/4.4 s at sf0.1); the
    // eager per-round cut — kcoreConverged's discipline — keeps every
    // job's stage chain shallow (adjacent A/B 3.9/3.5 s, 21 jobs).
    // Same frames, same semantics; lineage is cut exactly as in the
    // sibling converged loops.
    var e = edges
    for (_ <- 1 to rounds) {
      val deg = e.select(explode(array(col("pa"), col("pb"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val surv = deg.filter(col("dg") >= k).select("n")
      e = e.join(surv.withColumnRenamed("n", "pa"), Seq("pa"))
        .join(surv.withColumnRenamed("n", "pb"), Seq("pb"))
        .select("pa", "pb")
        .localCheckpoint(true)
    }
    e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Run the peel to a FIXPOINT: stop when a round deletes no vertex.
    * Each round's edge frame is localCheckpoint-ed (eager) — the same
    * lineage-cut discipline as [[pagerankConverged]] — so a deep peel
    * (a long pendant chain peels one link per round) keeps O(1) plans.
    * Returns (node, deg) of the k-core. */
  private[graft] def kcoreConverged(edges: DataFrame, k: Int,
      maxRounds: Int = 50): DataFrame = {
    // Round-12 loop shape (guide §1.2/§2): ONE job per round instead of
    // two, and scale-adaptive stage widths instead of a constant 32.
    //
    //  - STOP SIGNATURE FUSED: the old loop ran a separate surv.count()
    //    job per round before the checkpoint job. Peeling is monotone
    //    (each round's edge set ⊆ the previous), so edge-COUNT
    //    stability is exact set equality, which in turn means no vertex
    //    was removed — the same fixpoint the vertex-count probe
    //    detected. The count rides the checkpoint materialization via
    //    observe() (the ccLargeSmallStar trick): zero extra jobs.
    //  - PARTITION LADDER: after round 1 the surviving edge frame is
    //    thousands of rows; 32-way shuffles pay more scheduling than
    //    compute. The previous round's exact count (free, observed)
    //    sizes this round's explicit repartitions at ~64k rows per
    //    partition — the decision AQE coalescing would make at runtime
    //    (AQE is off in the bench session); a 100 TB peel keeps full
    //    parallelism because the count keeps it there. The explicit
    //    repartition(parts, key) nodes replace (not add to) the
    //    exchanges EnsureRequirements would insert at 32.
    //  - DEGREE VIA explode(array(pa, pb)): one reference to the
    //    checkpointed frame instead of two (see kcorePeel).
    val sess = edges.sparkSession
    def partsFor(n: Long): Int =
      math.max(4, math.min(sess.sparkContext.defaultParallelism.toLong,
        n / 65536 + 1).toInt)
    val obs0 = org.apache.spark.sql.Observation(
      s"kcore_sig_${CcObsCounter.incrementAndGet()}_init")
    var e = edges.observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint(true)
    var nEdges = obs0.get("n").asInstanceOf[Long]
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxRounds) {
      val parts = partsFor(nEdges)
      val surv = e
        .select(explode(array(col("pa"), col("pb"))).as("n"))
        .repartition(parts, col("n"))
        .groupBy("n").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select("n")
      val obs = org.apache.spark.sql.Observation(
        s"kcore_sig_${CcObsCounter.incrementAndGet()}_$rounds")
      val next = e.repartition(parts, col("pa"))
        .join(surv.withColumnRenamed("n", "pa"), Seq("pa"))
        .repartition(parts, col("pb"))
        .join(surv.withColumnRenamed("n", "pb"), Seq("pb"))
        .select("pa", "pb")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      val nNext = obs.get("n").asInstanceOf[Long]
      if (nNext == nEdges) stable = true
      else { nEdges = nNext; rounds += 1 }
      e = next
    }
    e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  private[graft] def labelPropagation(edges: DataFrame, iters: Int)
      : DataFrame = {
    val e = edges.select(col("a"), col("b")).distinct()
    // same one-exchange-then-persist shape as [[pagerank]]: all
    // iteration joins read sym partitioned by src
    // eager cut (round 13): l0's distinct and step 1's join are
    // concurrent leaf stages racing a lazy cache — see pagerank
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    // (count desc, min label) pick as a struct-MAX aggregation, not a
    // row_number window (round 12, guide §2.3 aggregate-before-shuffle):
    // hashpartitioning(node, cand) does not satisfy the window's
    // node-only clustering, so the old shape paid a THIRD exchange plus
    // a per-partition sort carrying every (node, cand, n) row; max of
    // struct(n, -cand) is partial-aggregated map-side (one row per node
    // crosses the wire) and -(max(-cand)) = min cand reproduces the
    // tie-break exactly. Labels are non-negative node ids, so the
    // negation never overflows.
    def step(l: DataFrame): DataFrame =
      sym.join(l.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl").as("cand"))
        .agg(count(lit(1)).as("n"))
        .groupBy("node")
        .agg(max(struct(col("n"), (-col("cand")).as("nc"))).as("m"))
        .select(col("node"), (-col("m.nc")).as("lbl"))
    var l = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to iters) l = step(l)
    l
  }

  /** Iterate-until-converged PageRank (SURVEY §7.4 risk 3 — iterative
    * lineage): the same integer-exact step as [[pagerank]], looped
    * until the max per-node micro-rank delta is <= `tolMicro` (exact
    * long arithmetic — no float epsilon) or `maxIters`. Each
    * iteration's rank frame is `localCheckpoint`ed EAGERLY, so (a)
    * lineage is cut every round — plan depth stays O(1) no matter how
    * many iterations run, the thing a 20-iteration PageRank at scale
    * needs — and (b) the convergence probe (one tiny max-delta agg per
    * round, the unavoidable driver action of any until-converged loop)
    * re-reads the materialized node frame, never the lineage. State is
    * node-keyed rows only (bounded by |V|); `sym` takes the one
    * explicit exchange and persists exactly as in [[pagerank]].
    * Returns (result with (node, r), iterations run). */
  private[graft] def pagerankConverged(edges: DataFrame, tolMicro: Long,
      maxIters: Int = 30): (DataFrame, Int) = {
    val e = edges.select(col("a"), col("b")).distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .transform(graft.Caches.track)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .transform(graft.Caches.track)
    def step(r: DataFrame): DataFrame =
      sym.join(r.join(deg, col("node") === col("src")).select(
          col("node").as("src"), expr("r div deg").as("c")),
        Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
        .select(col("node"),
          (lit(150000L) + expr("(17 * s) div 20")).as("r"))
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      .localCheckpoint()
    var it = 0
    var delta = Long.MaxValue
    while (delta > tolMicro && it < maxIters) {
      val next = step(r).localCheckpoint()
      // undirected sym ⇒ every node has an in-edge ⇒ the node set is
      // stable round-over-round and an inner join covers all nodes
      delta = next.join(r.select(col("node"), col("r").as("r0")), Seq("node"))
        .agg(max(abs(col("r") - col("r0")))).head().getLong(0)
      r = next
      it += 1
    }
    (r, it)
  }

  /** Iterate-until-converged synchronous LPA: the same deterministic
    * (count desc, min label) step as [[labelPropagation]], looped until
    * NO node changes label (exact integer equality) or `maxIters` —
    * with the same eager localCheckpoint lineage cut per round as
    * [[pagerankConverged]]. Returns (result with (node, lbl),
    * iterations run). maxIters also bounds the synchronous-LPA
    * oscillation pathology on bipartite structures. */
  private[graft] def labelPropagationConverged(edges: DataFrame,
      maxIters: Int = 30): (DataFrame, Int) = {
    val e = edges.select(col("a"), col("b")).distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .transform(graft.Caches.track)
    // struct-max pick — see [[labelPropagation]] for the rationale
    def step(l: DataFrame): DataFrame =
      sym.join(l.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl").as("cand"))
        .agg(count(lit(1)).as("n"))
        .groupBy("node")
        .agg(max(struct(col("n"), (-col("cand")).as("nc"))).as("m"))
        .select(col("node"), (-col("m.nc")).as("lbl"))
    var l = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    var it = 0
    var changed = Long.MaxValue
    while (changed > 0 && it < maxIters) {
      val next = step(l).localCheckpoint()
      changed = next.join(l.select(col("node"), col("lbl").as("l0")),
          Seq("node"))
        .filter(col("lbl") =!= col("l0")).count()
      l = next
      it += 1
    }
    (l, it)
  }

  /** Integer-exact PageRank over an undirected (a, b) edge frame:
    * micro-ranks start at 1e6, contributions use integer division by
    * degree, damping is 150000 + (17·s div 20) — 0.85 as exact integer
    * arithmetic, reproducible across engines and partitionings. Returns
    * (node, r) after `iters` Pregel-as-join power iterations. */
  private[graft] def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // e deliberately NOT persisted (here and in the sibling loops):
    // sym's union branches do re-derive it — column pruning splits
    // them into non-reusable subtrees — but the subtree is one
    // broadcast join + aggregate, and the sym persist below already
    // amortizes every iteration. Tracking e as well was measured
    // SLOWER at sf0.1 (m13 3.27 → 3.69 s, m14 3.47 → 4.35 s:
    // cache-build cost exceeds the cheap duplicate). m23, whose edge
    // frame fed FOUR consumers with no sym persist, keeps its track
    // (5.70 → 4.27 s).
    val e = edges.select(col("a"), col("b")).distinct()
    // ONE explicit exchange on src, persisted: the degree aggregate and
    // every iteration's contribution join all read sym partitioned by
    // src — without this each of the 1+iters consumers re-runs the
    // edge distinct AND re-shuffles (the DBSCAN nbrPairs trick)
    // EAGER localCheckpoint (round 13): the degree aggregate and the
    // first iteration's join are concurrent leaf stages of the one
    // action — a lazy persist let them race to first-touch the unbuilt
    // cache under the AQE-on protocol, each re-running the edge
    // distinct (the m23 pattern).
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    def step(r: DataFrame): DataFrame =
      sym.join(r.join(deg, col("node") === col("src")).select(
          col("node").as("src"), expr("r div deg").as("c")),
        Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
        .select(col("node"),
          (lit(150000L) + expr("(17 * s) div 20")).as("r"))
    var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) r = step(r)
    r
  }

  /** m16 constants: BFS seed node (2 = customer #1 under the 2·custkey
    * encoding — present at every harness SF) and the fixed oracle round
    * count. 4 rounds reaches the whole giant component on the dense
    * order graph while keeping the oracle CTE chain shallow. */
  private[graft] val SsspSeed = 2L
  private[graft] val SsspRounds = 4

  /** Oracle fragment: one BFS relaxation `prevD` → `d$i` (frontier
    * expansion along sym + min-combine with the carried distances). */
  private def ssspSqlRound(i: Int, prevD: String): String =
    s"""d$i AS (SELECT node, min(dist) AS dist FROM (
       |  SELECT node, dist FROM $prevD
       |  UNION ALL
       |  SELECT sym.dst AS node, p.dist + 1 AS dist
       |  FROM $prevD p JOIN sym ON p.node = sym.src)
       |GROUP BY 1)""".stripMargin

  /** Exactly `rounds` BFS relaxations from `seed` over the symmetrized
    * (a, b) edge frame — the SQL-replayable finite prefix of
    * [[ssspConverged]]. Returns (node, dist) for nodes reached within
    * `rounds` hops. Each round's distance frame feeds BOTH the carry
    * and the expansion, so it is tracked-persisted per round. */
  private[graft] def sssp(edges: DataFrame, seed: Long, rounds: Int)
      : DataFrame = {
    val e = edges.select(col("a"), col("b")).distinct()
    // EAGER cuts (round 13, see pagerank): sym is read by every round,
    // and each round's distance frame is referenced twice (union leg +
    // join leg) — lazy persists let the concurrent leaf stages race on
    // the unbuilt caches under the AQE-on protocol, and the chained
    // lazy rounds replan as one deep adaptive chain.
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    var dist = e.sparkSession.range(1)
      .select(lit(seed).as("node"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      dist = dist.unionByName(
          sym.join(dist.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Co-activity edge generation for m8/m17: users sharing ≥
    * `minShared` distinct (hour, event_type) activity cells become an
    * edge. Exact when `hotCap` is None — the registered, oracle-matched
    * form. The self-join is quadratic in per-cell user count: measured
    * at sf1 (SCALE.md), 10× users in the same wall-clock window grew
    * the edge frame ~100× (13.86M edges) — the expected group-size
    * square, absorbed fine at that scale, but a 100 TB hot cell with
    * 1M users would contribute 5·10¹¹ pairs. `hotCap = Some(k)` is the
    * d2 stop-shingle trade for that regime: keep only the k
    * deterministically md5-ranked users per cell, bounding every
    * cell's contribution at k²/2 pairs; recall loss is confined to
    * co-activity INSIDE capped cells (SkewAndBucketSpec pins the
    * bound, the subset property, and planted-pair survival). */
  private[graft] def coActivityEdges(ue: DataFrame, minShared: Long,
      hotCap: Option[Int] = None): DataFrame = {
    val base = hotCap match {
      case None => ue
      case Some(k) =>
        val wCell = org.apache.spark.sql.expressions.Window
          .partitionBy("hour", "event_type")
          .orderBy(conv(substring(md5(col("user_id").cast("string")),
            1, 8), 16, 10).cast("long"), col("user_id"))
        ue.withColumn("rk", row_number().over(wCell))
          .filter(col("rk") <= k).drop("rk")
    }
    base.select(col("hour"), col("event_type"), col("user_id").as("ua"))
      .join(base.select(col("hour"), col("event_type"),
        col("user_id").as("ub")), Seq("hour", "event_type"))
      .filter(col("ua") < col("ub"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minShared)
      .select(col("ua").as("l1"), col("ub").as("l2"))
  }

  /** Degree bound above which [[rankAdjacency]] shards a source's
    * ranking across dst-range buckets instead of one per-src window
    * task. 2^18 rows is comfortably a single window task; past it the
    * sharded construction's extra aggregate+join pays for itself. */
  private[graft] val HubRankCap = 262144L

  /** (src, dst) → (cur, dst, idx) adjacency where idx is the per-src
    * rank of dst (exactly the oracle's `row_number() OVER (PARTITION
    * BY src ORDER BY dst) - 1`). `sharded = false` ranks with that
    * window directly — one task per src, fine until a hub approaches
    * [[HubRankCap]]. `sharded = true` is the hub-safe construction
    * (round-7 ADVICE): bkt = dst div 2^16 is monotone in dst, so
    * (rank within (src, bkt)) + (count of earlier buckets) equals the
    * global per-src rank while a 1M-degree hub spreads over ~deg/2^16
    * tasks; the per-src prefix window runs on the bucket-COUNT frame,
    * never the data. Identical output either way (SkewAndBucketSpec
    * asserts equality on a hub fixture). */
  private[graft] def rankAdjacency(sym: DataFrame,
      sharded: Boolean): DataFrame = {
    if (!sharded) {
      val wAdj = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy("dst")
      sym.select(col("src").as("cur"), col("dst"),
        (row_number().over(wAdj).cast("long") - 1).as("idx"))
    } else {
      val wInB = org.apache.spark.sql.expressions.Window
        .partitionBy("src", "bkt").orderBy("dst")
      val wOff = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy("bkt")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val symB = sym
        .withColumn("bkt", expr("dst div 65536"))
        .repartition(col("src"), col("bkt"))
      val offs = symB
        .groupBy("src", "bkt").agg(count(lit(1)).as("bn"))
        .withColumn("off",
          coalesce(sum(col("bn")).over(wOff), lit(0L)))
        .select("src", "bkt", "off")
      symB
        .withColumn("r", row_number().over(wInB).cast("long") - 1)
        .join(offs, Seq("src", "bkt"))
        .select(col("src").as("cur"), col("dst"),
          (col("r") + col("off")).as("idx"))
    }
  }

  /** Pure-DataFrame connected components — the alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): the GraphX-free fallback
    * SURVEY §7.1 names for when GraphX typing fights the Dataset flow,
    * and the third member of the converged-loop family (with
    * [[pagerankConverged]]/[[ssspConverged]]). Each round is two
    * star operations, each ONE keyed min-aggregation + ONE equi-join
    * on the node key — no Pregel scheduler, no vertex broadcast; the
    * edge frame SHRINKS toward depth-1 stars rooted at component
    * minima and is localCheckpoint-ed per round (O(1) plans at any
    * depth). Converges in O(log diameter) rounds. Stop condition is
    * EXACT set equality of successive edge frames (count + one-sided
    * EXCEPT — two bounded jobs per round, the same class as the other
    * loops' convergence probes). Returns ((v, component = min id in
    * component) for every vertex with ≥1 edge, rounds run). */
  private[graft] def ccLargeSmallStar(edges: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    val sess = edges.sparkSession
    // Partition-count ladder: each round re-keys the (shrinking) edge
    // frame by one endpoint, and on a contracted frame of a few
    // thousand rows 32-way stages pay more scheduling than compute
    // (round-7 bench: ~10 s for ~5 rounds at sf0.1, root-caused to
    // per-round scheduler latency). The previous round's exact count
    // (free — see the observe() fusion below) sizes the next round at
    // ~64k rows/partition, the same decision AQE coalescing would make
    // at runtime (AQE is off in the bench session); a 100 TB run keeps
    // full parallelism because the count keeps it there.
    def partsFor(n: Long): Int =
      math.max(4, math.min(sess.sparkContext.defaultParallelism.toLong,
        n / 65536 + 1).toInt)
    // canon keyed (a, b): the repartition feeds distinct's aggregate
    // directly, so dedup adds no exchange of its own
    def canon(e: DataFrame, parts: Int): DataFrame = e
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .repartition(parts, col("a"), col("b"))
      .distinct()
    def neighborMin(sym: DataFrame): DataFrame = sym
      .groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // large-star: every neighbor v > u links to u's neighborhood min.
    // ONE exchange (repartition by u) feeds BOTH the neighborhood-min
    // aggregate and the probe side of the join — Spark's exchange
    // reuse collapses the two scans (round-7 VERDICT #3: large/small
    // star shared-frame fusion).
    def largeStar(e: DataFrame, parts: Int): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
        .repartition(parts, col("u"))
      canon(sym.join(neighborMin(sym), Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")), parts)
    }
    // small-star: along larger→smaller edges, u and its smaller
    // neighbors all link to the minimum — same single-exchange shape
    def smallStar(e: DataFrame, parts: Int): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
        .repartition(parts, col("u"))
      val m = neighborMin(dir)
      canon(dir.join(m, Seq("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(m.select(col("u").as("a"), col("m").as("b"))), parts)
    }
    def sig(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)), sum(col("a")), sum(col("b"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var e = canon(edges.select(col("l1").as("a"), col("l2").as("b")),
        sess.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    var eSig = sig(e)
    var it = 0
    var stable = false
    while (!stable && it < maxRounds) {
      val parts = partsFor(eSig._1)
      // (count, Σa, Σb) signature FUSED into the contraction job via
      // observe(): the checkpoint materialization already streams every
      // row, so the per-round signature costs zero extra jobs. The
      // EXACT set-equality confirmation (one except shuffle) still runs
      // only when the signature stops moving — exactness preserved.
      // per-call unique observation name (round-8 ADVICE): Spark's
      // Observation listener matches executions by metric name, so two
      // concurrent CC runs in one session (parallel suites) sharing a
      // round index could cross-read or block obs.get
      val obs = org.apache.spark.sql.Observation(
        s"cc_sig_${CcObsCounter.incrementAndGet()}_$it")
      // NB (round 13): chaining TWO star pairs per checkpoint to halve
      // driver round trips was tried and measured WORSE (m17 8.0 ->
      // 10.5-16.6 s, 50 -> 64 jobs): each star op references its input
      // through both the neighborhood-min aggregate and the probe side,
      // so an unmaterialized intermediate pair duplicates the first
      // pair's subtree multiplicatively and AQE fragments the deeper
      // chain into more sequential replan jobs, not fewer. One pair per
      // materialization stays.
      val next = smallStar(largeStar(e, parts), parts)
        .observe(obs, count(lit(1)).as("n"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"))
        .localCheckpoint(true)
      val m = obs.get
      def asL(v: Any): Long = if (v == null) 0L else v.asInstanceOf[Long]
      val nextSig = (asL(m("n")), asL(m("sa")), asL(m("sb")))
      stable = nextSig == eSig && next.except(e).isEmpty
      eSig = nextSig
      e = next
      it += 1
    }
    // fixpoint edges are canonical (root, v) stars: every endpoint
    // labels to the min endpoint, the root to itself
    val comp = e.select(col("a").as("v"), col("a").as("component"))
      .unionAll(e.select(col("b").as("v"), col("a").as("component")))
      .groupBy("v").agg(min("component").as("component"))
    (comp, it)
  }

  /** Run BFS to the FIXPOINT: stop when a round reaches no new node
    * and improves no distance (exact integer check on (count, sum) —
    * both monotone under relaxation, so stability of the pair IS the
    * fixpoint). Each round's frame is localCheckpoint-ed eagerly: a
    * 40-hop chain peels one hop per round with O(1) plan depth, the
    * same lineage discipline as [[pagerankConverged]]. Returns
    * ((node, dist), rounds run). */
  private[graft] def ssspConverged(edges: DataFrame, seed: Long,
      maxRounds: Int = 50): (DataFrame, Int) = {
    val e = edges.select(col("a"), col("b")).distinct()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .transform(graft.Caches.track)
    var dist = e.sparkSession.range(1)
      .select(lit(seed).as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var sig = (1L, 0L)
    var it = 0
    var stable = false
    while (!stable && it < maxRounds) {
      val next = dist.unionByName(
          sym.join(dist.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      val row = next.agg(count(lit(1)), sum("dist")).head()
      val nextSig = (row.getLong(0), row.getLong(1))
      if (nextSig == sig) stable = true
      else { sig = nextSig; dist = next; it += 1 }
    }
    (dist, it)
  }
}
