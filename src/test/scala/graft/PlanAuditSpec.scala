package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression net: the scale-critical plan shapes that
  * `runMain graft.Explain` audits by hand, locked in as tests so a
  * refactor cannot silently trade them away. String-level assertions
  * on `executedPlan` are deliberate — they express exactly what a
  * plan reviewer greps for (PushedFilters, join strategy, Expand
  * count), survive Spark-internal class renames better than node
  * casts, and fail with the full plan in the message.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("no registered query plans a CartesianProduct") {
    // a cross product that is not a broadcast nested-loop is the one
    // join shape that can never survive a 100x scale-up; every cross
    // in the repo must ride a broadcast of a bounded side
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val p =
        try plan(n)
        catch { case e: Throwable => fail(s"$n failed to plan: $e") }
      if (p.contains("CartesianProduct")) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct planned in: ${offenders.mkString(", ")}")
  }

  test("p4: filter predicates are pushed into the parquet scan") {
    val p = plan("p4_filter_predicates")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"expected non-empty PushedFilters:\n$p")
  }

  test("j7: all three dimension joins broadcast (no SMJ for dims)") {
    val p = plan("j7_join_broadcast")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 BroadcastHashJoin, got $n:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("o1: global sort+limit compiles to TakeOrderedAndProject") {
    val p = plan("o1_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"global sort planned:\n$p")
  }

  test("j14: overlap join builds the bounded promo side as broadcast") {
    val p = plan("j14_interval_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected BroadcastNestedLoopJoin:\n$p")
  }

  test("a16 pivots without Expand; a20 grouping-sets uses exactly one") {
    assert(!plan("a16_pivot").contains("Expand"),
      "explicit-value pivot must not add an Expand")
    val n = "Expand".r.findAllIn(plan("a20_grouping_sets")).length
    assert(n == 1, s"grouping sets should plan exactly one Expand, got $n")
  }

  test("j11: the bloom filter sits on the scan, before any exchange") {
    val p = plan("j11_bloom_prune")
    val filterAt = p.indexOf("might_contain")
    val exchangeAt = p.indexOf("Exchange")
    assert(filterAt >= 0, s"bloom filter missing from plan:\n$p")
    // formatted plans list downstream ops first: the scan-side filter
    // must appear BELOW (later in the string than) the first exchange
    assert(exchangeAt < 0 || filterAt > exchangeAt,
      s"bloom filter not at the scan:\n$p")
  }

  test("m13: PageRank joins stay keyed — no nested-loop anywhere") {
    // every pagerank stage must be a hash/SMJ equi-join on the node
    // key; a BroadcastNestedLoopJoin would mean a rank or degree frame
    // (node-sized, NOT bounded) is being broadcast-crossed
    val p = plan("m13_pagerank")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pagerank planned a nested loop:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-25 should be TakeOrdered, not a global sort:\n$p")
  }

  test("d10: winnowing candidates come from an equi-join, md5 below the window exchange") {
    val p = plan("d10_winnowing")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"winnowing pair generation must be the keyed fingerprint join:\n$p")
    // the gram hash must be computed scan-side (below the per-doc
    // window exchange), not re-derived after the shuffle
    val md5At = p.lastIndexOf("md5")
    val exchangeAt = p.indexOf("Exchange")
    assert(md5At >= 0 && exchangeAt >= 0 && md5At > exchangeAt,
      s"md5 not below the first exchange:\n$p")
  }

  test("x30: chunking is map-only — no shuffle beyond spread and sort") {
    // the operator's scale claim: between the input spread and the
    // presentation sort there is NO shuffle — chunk generation is an
    // embarrassingly parallel map stage
    val p = plan("x30_chunk_overlap")
    val n = "Exchange".r.findAllIn(p).length
    assert(n == 2, s"expected exactly spread + sort exchanges, got $n:\n$p")
  }

  test("x31: window rank-limit pushes a partial top-k below the shuffle") {
    // A-ES keeps k rows per source; WindowGroupLimit must appear on
    // BOTH sides of the window exchange (partial per-partition top-k
    // before the shuffle — the heap refinement the comment claims)
    val p = plan("x31_weighted_sample")
    val n = "WindowGroupLimit".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final WindowGroupLimit, got $n:\n$p")
  }

  test("m16: BFS expansion never plans a cartesian product") {
    // BroadcastNestedLoopJoin IS allowed here: the round-0 frontier is
    // a literal 1-row seed frame, so constant propagation folds its
    // join key away and the (bounded, 1-row) broadcast nested loop is
    // the correct plan — textually repeated once per unrolled round.
    // What must never appear is an unbounded cross of two node-sized
    // frames.
    val p = plan("m16_sssp")
    assert(!p.contains("CartesianProduct"),
      s"BFS planned an unbounded cross:\n$p")
  }

  test("w8: native session windows plan the session-merge node, not a " +
      "window-function pass") {
    val p = plan("w8_session_window")
    // MergingSessions (the partial-agg path: per-partition session
    // pre-merge BEFORE the user_id exchange, map-side combine for
    // sessions) or UpdatingSessions is the dedicated physical path; a
    // lag/running-sum fallback would surface as a Window node
    assert(p.contains("MergingSessions") || p.contains("UpdatingSessions"),
      s"expected a session-merge node in plan:\n$p")
    assert(!p.contains("Window("), s"session windows fell back to a " +
      s"window-function pass:\n$p")
  }

  test("x33: both perceptron weight joins broadcast the 64-row side") {
    // the feature frame (corpus-sized) must never be the build side;
    // w1 riding into the scoring join and dw/w1 riding into the final
    // assembly are all bounded-by-64 frames
    val p = plan("x33_linear_probe")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast weight joins, got $n:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a weight join fell back to SMJ (corpus-sized shuffle):\n$p")
  }

  test("t20: OHLC window and agg share one data exchange") {
    // the (series, hour) window sort and the keyed agg reuse the same
    // hash partitioning: exactly 2 exchanges total — the data exchange
    // and the deterministic output orderBy
    val p = plan("t20_ohlc_bars")
    val n = "Exchange".r.findAllIn(p).length
    assert(n == 2, s"expected data + output-sort exchanges only, got $n:\n$p")
  }

  test("s19: profiling sweep plans re-aggregation, not Expand") {
    // the single countDistinct compiles to two-phase re-aggregation on
    // (col_name, v) — no Expand row-multiplication; 2 agg exchanges +
    // the output sort
    val p = plan("s19_table_stats")
    assert(!p.contains("Expand"), s"distinct agg fell back to Expand:\n$p")
    val n = "Exchange".r.findAllIn(p).length
    assert(n == 3, s"expected 2 agg exchanges + output sort, got $n:\n$p")
  }

  test("n9: MaxSim broadcasts the query tokens and keeps partial top-k " +
      "below the rank shuffle") {
    val p = plan("n9_maxsim")
    // corpus×query pairing must ride a broadcast of the bounded query
    // side, never a shuffle join or unbounded cross
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query-token broadcast missing:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token pairing fell back to a corpus shuffle join:\n$p")
    // rank-limit pushes a per-partition top-k before the qdoc exchange
    val n = "WindowGroupLimit".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final WindowGroupLimit, got $n:\n$p")
  }

  test("n7: trained-IVF centroid frames broadcast; corpus never does") {
    val p = plan("n7_ann_ivf_trained")
    // three assignment stages (2 Lloyd + the index build) each
    // broadcast a constant-K centroid frame; the plan TEXT repeats
    // shared subtrees per consumer, so assert the floor, not equality
    val n = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >= 3 centroid broadcasts, got $n:\n$p")
    // and every one of them must broadcast the LIMIT'd (constant-K)
    // side — the corpus side of an assignment never appears as a
    // BroadcastExchange input (limit nodes mark the centroid seeds)
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      s"constant-K centroid limit missing from plan:\n$p")
  }

  test("x35: the doc-level prefix-sum window partitions by bucket; " +
      "offsets broadcast back") {
    val p = plan("x35_shard_shuffle")
    // the data-sized cumsum must run per-bucket (parallel), never as a
    // global single-task window — only the <=4096-row bucket-offset
    // frame may window globally
    assert(p.contains("windowspecdefinition(b#") ||
      p.contains("windowspecdefinition(b "),
      s"per-doc window lost its bucket partitioning:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must join back as a broadcast:\n$p")
  }

  test("j17: both correlated subqueries decorrelate into keyed joins") {
    val p = plan("j17_decorrelate")
    // scalar subquery -> per-nation aggregate joined back; EXISTS ->
    // left semi. Neither may survive as a per-row subquery execution
    // or a nested loop.
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(!p.contains("NestedLoop"),
      s"correlated subquery fell back to a nested loop:\n$p")
    assert(!p.contains("InSubquery") && !p.contains("ScalarSubquery"),
      s"subquery survived undecorrelated:\n$p")
  }

  test("x36: BM25 query terms broadcast; top-10 never plans a global sort") {
    val p = plan("x36_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"5-term query frame must broadcast into the tf join:\n$p")
  }

  test("x40: both retrieval lists are partial top-k feeding bounded windows") {
    val p = plan("x40_rrf_fusion")
    // the ≥2 TakeOrderedAndProject nodes are the lexical top-50, the
    // semantic top-50, and the fused top-10 — the corpus-sized score
    // frames must NEVER sort globally
    val topk = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(topk >= 3, s"expected 3 partial top-k nodes, got $topk:\n$p")
  }

  test("n11: one broadcast scoring pass feeds floor agg and negative top-k") {
    val p = plan("n11_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"constant query set must broadcast against the corpus:\n$p")
    // round 13: the scored frame is an EAGER localCheckpoint (its two
    // consumers raced the old lazy cache) — the single scoring pass now
    // shows up as a materialized RDD scan, not an InMemoryTableScan
    assert(p.contains("Scan ExistingRDD"),
      s"scored frame must be materialized once for its two consumers:\n$p")
  }
}
