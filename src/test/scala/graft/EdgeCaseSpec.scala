package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: operators must return EMPTY results —
  * not throw — on empty frames, and singleton inputs must flow through
  * the pair-generating paths as no-pairs. The operational edge a long
  * pipeline hits whenever an upstream filter drains a partition/day. */
class EdgeCaseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("dedup pair generators: empty and singleton corpora yield no pairs") {
    import spark.implicits._
    for (docs <- Seq(emptyDocs, Seq((1L, "a b c d e f g h i j")).toDF(
        "doc_id", "text"))) {
      assert(graft.ops.Dedup.winnowPairs(docs, 1).count() == 0)
      assert(graft.ops.Dedup.ngramJaccardPairsOf(
        graft.ops.Dedup.shinglesOf(docs), 0.1, None).count() == 0)
    }
  }

  test("winnowing: docs below one full window produce no fingerprints") {
    import spark.implicits._
    // 7 tokens < k + w - 1 = 8 → zero windows, zero rows, no underflow
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.winnowFingerprints(docs).count() == 0)
  }

  test("graph ops: empty edge frames return empty results") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.ops.Cluster.pagerank(none, 2).count() == 0)
    assert(graft.ops.Cluster.labelPropagation(none, 2).count() == 0)
  }

  test("pagerank: self-loop-only graph stays finite and deterministic") {
    import spark.implicits._
    val loop = Seq((1L, 1L)).toDF("a", "b")
    val r = graft.ops.Cluster.pagerank(loop, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // one node, deg 2 (symmetrized loop), all mass returns to itself:
    // uniform fixed point → exactly 1e6 micro-rank
    assert(r == Map(1L -> 1000000L), s"got $r")
  }

  test("burstHours: empty events and single-hour users never flag") {
    import spark.implicits._
    assert(graft.ops.Trace.burstHours(
      Seq.empty[(Long, Long)].toDF("user_id", "ts")).count() == 0)
    // one hour of activity: c == median, never > 2·median
    val one = Seq.fill(5)((1L, 10L)).toDF("user_id", "ts")
    assert(graft.ops.Trace.burstHours(one).count() == 0)
  }

  test("lloydStep: empty corpus yields an empty centroid frame") {
    import spark.implicits._
    val vecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val cents = graft.ops.Ann.seedCentroids(vecs)
    assert(graft.ops.Ann.lloydStep(vecs, cents).count() == 0)
    assert(graft.ops.Ann.ivfTopK(vecs, cents).count() == 0)
  }

  test("cdcDiff: both sides empty, and one side empty") {
    import spark.implicits._
    val e = Seq.empty[(Long, Double)].toDF("k", "p")
    val v = Seq((1L, 1.0)).toDF("k", "p")
    assert(graft.ops.Relational.cdcDiff(e, e, "k", "p").count() == 0)
    val ins = graft.ops.Relational.cdcDiff(e, v, "k", "p").collect()
    assert(ins.length == 1 && ins.head.getString(1) == "I")
    val del = graft.ops.Relational.cdcDiff(v, e, "k", "p").collect()
    assert(del.length == 1 && del.head.getString(1) == "D")
  }
}
