package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iterate-until-converged graph loops (SURVEY §7.4 risk 3): fixed-depth
  * m13/m14 keep their exact oracles; these specs gate the UNBOUNDED
  * variants — tolerance-based stopping in exact integer arithmetic and
  * localCheckpoint lineage cuts that keep plan depth O(1) across 10+
  * iterations (the shape a 20-iteration PageRank on a 1000-executor
  * cluster needs: without the cuts, iteration k replans and may
  * re-execute a depth-k lineage; with them, each round reads the
  * previous round's materialized node frame only). */
class ConvergenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** K4 clique (1-4) with a pendant path 4-5-6-7-8-9: min-label flows
    * one hop per synchronous round, so 2 iterations CANNOT converge but
    * ~path-length rounds do, with no bipartite oscillation (the clique
    * anchors the minimum). */
  private def barbell() = {
    import spark.implicits._
    (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
      Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L)))
      .toDF("a", "b")
  }

  test("labelPropagationConverged: needs >2 rounds, reaches a fixpoint") {
    val (res, iters) = ops.Cluster.labelPropagationConverged(barbell())
    assert(iters > 2, s"fixture too easy: converged in $iters")
    assert(iters < 30, s"did not converge: $iters")
    val labels = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 9)
    assert(labels.values.toSet == Set(1L),
      s"min label must flood the whole graph: $labels")
    // fixpoint: one more synchronous step changes nothing
    val (res2, it2) = ops.Cluster.labelPropagationConverged(barbell(), 50)
    assert(it2 == iters, "stopping point must be deterministic")
    assert(res2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == labels)
  }

  test("pagerankConverged: tolerance stop beyond 2 iterations, exact ints") {
    val (res, iters) =
      ops.Cluster.pagerankConverged(barbell(), tolMicro = 2000L)
    assert(iters > 2, s"fixture too easy: converged in $iters")
    assert(iters < 30, s"did not converge in 30: $iters")
    val r = res.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 9)
    // exact integer micro-ranks: symmetric clique members 2 and 3 play
    // identical roles (both connect to {1,2,3,4}\self only) — their
    // ranks must be EQUAL, not approximately equal
    assert(r(2L) == r(3L), s"symmetric nodes diverged: ${r(2L)} ${r(3L)}")
    // the pendant tail end has the lowest stationary mass
    assert(r(9L) == r.values.min, s"tail end not minimal: $r")
  }

  test("localCheckpoint keeps lineage O(1) across 10+ iterations") {
    val (res, iters) =
      ops.Cluster.pagerankConverged(barbell(), tolMicro = 1L, maxIters = 12)
    assert(iters == 12, s"tol=1 must exhaust maxIters, got $iters")
    // the result plan must be a checkpoint scan, not a 12-deep join
    // tower: count logical nodes (a non-checkpointed 12-iteration plan
    // has hundreds — each round adds joins, an aggregate and a window)
    val nNodes = res.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nNodes <= 10,
      s"lineage not cut: $nNodes logical nodes\n${res.queryExecution.optimizedPlan}")
    Caches.drain()
  }

  test("ssspConverged: deep chain needs ~diameter rounds, exact hop counts") {
    import spark.implicits._
    // chain 1-2-...-12: the frontier advances one hop per round, so the
    // fixed 4-round prefix cannot reach the far end but the converged
    // variant must, with dist = exact hop index
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val prefix = ops.Cluster.sssp(chain, 1L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prefix.keySet == (1L to 5L).toSet,
      s"4 rounds must reach exactly hops 0-4: $prefix")
    val (res, iters) = ops.Cluster.ssspConverged(chain, 1L)
    assert(iters > 4 && iters < 30, s"chain diameter demands ~11: $iters")
    val d = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == (1L to 12L).map(i => i -> (i - 1)).toMap,
      s"hop distances must be exact: $d")
    // lineage cut: the result plan reads the checkpoint, not an
    // iters-deep union/join tower
    val nNodes = res.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nNodes <= 10, s"lineage not cut: $nNodes nodes")
    Caches.drain()
  }

  test("ccLargeSmallStar equals union-find CC; deep chain, O(log) rounds") {
    import spark.implicits._
    // chain 1-...-16 (diameter 15): star contraction must converge in
    // O(log n) rounds, far under the diameter — the property that
    // separates it from one-hop label flooding
    val chain = (1L until 16L).map(i => (i, i + 1)).toDF("l1", "l2")
    val (cc, rounds) = ops.Cluster.ccLargeSmallStar(chain)
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 16L).map(_ -> 1L).toMap, s"got $labels")
    assert(rounds > 1 && rounds <= 6,
      s"expected O(log 16) rounds, got $rounds")

    // seeded random graph: must agree exactly with the production
    // union-find/GraphX path on every vertex
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)(
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2)
    val eDf = edges.toDF("l1", "l2")
    val (cc2, _) = ops.Cluster.ccLargeSmallStar(eDf)
    val got = cc2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cluster.Dbscan.componentsFromEdges(spark, eDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"star CC diverges from union-find on ${got.toSet.diff(want.toSet)}")
    Caches.drain()
  }

  test("kcoreConverged: cascade peel needs >1 round; only the clique stays") {
    import spark.implicits._
    // K4 clique (1-4, each deg 3) + hub 10 wired to clique node 4 and to
    // three leaves 11-13: round 1 peels the deg-1 leaves, dropping the
    // hub to deg 1; round 2 peels the hub. A single fixed round keeps
    // the hub — so the fixpoint genuinely needs the cascade.
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) ++ Seq((4L, 10L), (10L, 11L), (10L, 12L), (10L, 13L)))
      .toDF("pa", "pb")
    val oneRound = graft.ops.Cluster.kcorePeel(edges, 3, 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound.contains(10L),
      s"hub should survive ONE round (it has deg 4 pre-peel): $oneRound")
    val core = graft.ops.Cluster.kcoreConverged(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the K4 at degree 3: $core")
    Caches.drain()
  }

  test("m24_kcore_converged: registered query IS the library fixpoint") {
    // round-10 VERDICT #6: the converged k-core is first-class, so the
    // registered GQuery must be the library path, not a lookalike.
    // Cross-check on harness data (sf0.001 keeps it fast): registered
    // == kcoreConverged == a DRIVER-SIDE exact peel on the collected
    // edge set. (A deep fixed-rounds kcorePeel is NOT usable as the
    // reference here: each un-checkpointed round references its
    // predecessor ~5×, so a 12-round plan has 5^12 canonicalization
    // nodes — measured to OOM the test JVM. The driver-side peel on a
    // few hundred collected edges is exact and O(E·rounds).)
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory)
    val reg = SparkEntry.queries("m24_kcore_converged")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.{col, count, lit}
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val e = li.select(col("o"), col("p").as("pa"))
      .join(li.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select("pa", "pb")
      .unionByName(ops.Cluster.plantedKcoreEdges(spark))
    val lib = ops.Cluster.kcoreConverged(e, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side exact fixpoint peel (sf0.001: a few hundred edges)
    var edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var stable = false
    while (!stable) {
      val deg = edges.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val surv = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(p => surv(p._1) && surv(p._2))
      stable = next == edges
      edges = next
    }
    val want = edges.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(reg == lib, "registered m24 diverges from kcoreConverged")
    assert(lib == want, "fixpoint diverges from the driver-side peel")
    assert(reg.nonEmpty, "vacuous: empty core on harness data")
    // the planted structure behaves as designed: all 120 clique nodes
    // survive at degree 29; pendants and the full 3-chains are peeled
    val P = 1000000000000L
    for (c <- 0 until 4; i <- 0 until 30) {
      val n = P + c * 1000L + i
      assert(reg.get(n).contains(29L), s"planted clique node $n: ${reg.get(n)}")
    }
    for (c <- 0 until 4; t <- Seq(100L, 200L, 201L, 202L))
      assert(!reg.contains(P + c * 1000L + t),
        s"planted peelable node ${P + c * 1000L + t} survived")
    Caches.drain()
  }

  test("btConverged: MM needs >3 rounds on a skewed ladder, fixpoint is stable") {
    import spark.implicits._
    // A dominates B 9:1, B dominates C 9:1, C dominates D 9:1 — the
    // strength ratios are large, so the MM iteration moves for many
    // rounds before the micro-unit deltas fall under tolerance
    def duels(w: String, l: String) =
      Seq.fill(9)((w, l, w)) ++ Seq.fill(1)((w, l, l))
    val comp = (duels("A", "B") ++ duels("B", "C") ++ duels("C", "D"))
      .toDF("sa", "sb", "win")
    val (p, iters) = ops.TextAnalysis.btConverged(comp, tolMicro = 100L)
    assert(iters > 3, s"fixture too easy: converged in $iters")
    // driver-side rounds are microseconds — a deep MM tail (measured
    // 79 rounds to 100-micro tolerance here) is fine by design
    assert(iters < 200, s"did not converge in 200: $iters")
    val m = p.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("A") > m("B") && m("B") > m("C") && m("C") > m("D"),
      s"ordering lost: $m")
    // fixed-3 x37 and the converged run agree on the ORDERING (the
    // fixed oracle is a prefix of the same iteration)
    val fixed = ops.TextAnalysis.btFromComparisons(comp, 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val convRank = m.toSeq.sortBy(-_._2).map(_._1)
    val fixedRank = fixed.toSeq.sortBy(_._2).map(_._1)
    assert(convRank == fixedRank, s"$convRank vs $fixedRank")
    Caches.drain()
  }

  test("btConverged: past-cap Spark fallback matches the driver loop") {
    import spark.implicits._
    // DENSE comparison graph (round-7 VERDICT #6): all 66 pairs of 12
    // entities duel 3× (lower name wins 2 of 3). maxCollectedPairs=0
    // forces the past-cap path, where the pair frame never leaves
    // Spark and only the entity-sized strength vector round-trips the
    // driver per MM round — the two paths share guard arithmetic
    // (greatest(·,1) ≙ math.max(·,1)) so their integer sequences must
    // be IDENTICAL, iteration count included.
    val ents = (0 until 12).map(i => f"e$i%02d")
    val comp = (for {
      a <- ents; b <- ents if a < b
      k <- 0 until 3
    } yield (a, b, if (k < 2) a else b)).toDF("sa", "sb", "win")
    val (pd, itd) = ops.TextAnalysis.btConverged(comp, tolMicro = 100L)
    val (ps, its) = ops.TextAnalysis.btConverged(comp, tolMicro = 100L,
      maxCollectedPairs = 0L)
    assert(itd == its, s"iteration counts diverge: $itd vs $its")
    val md = pd.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ms = ps.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(md == ms, s"strength vectors diverge:\n$md\n$ms")
    // e00 wins the most duels; strengths must strictly follow the index
    val byName = md.toSeq.sortBy(_._1).map(_._2)
    assert(byName == byName.sorted.reverse, s"ordering lost: $md")
    Caches.drain()
  }
}
