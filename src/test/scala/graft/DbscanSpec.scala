package graft

import graft.cluster.Dbscan
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN + connected-components specs (SURVEY.md §5.3): known-cluster
  * fixtures, the core-point invariant, noise handling, CC fixpoint. */
class DbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Numeric distance on stringified ints — lets us plant exact
    * geometry: two dense blobs far apart + isolated noise. */
  private val numDist: (String, String) => Double =
    (a, b) => math.abs(a.toDouble - b.toDouble)

  private def numPoints(vals: Seq[Int]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v.toString) }.toDS()
  }

  test("two blobs + noise: correct membership, noise = -1") {
    // blob A at 0..4, blob B at 100..104, noise at 50
    val pts = numPoints(Seq(0, 1, 2, 3, 4, 100, 101, 102, 103, 104, 50))
    val out = Dbscan.run(spark, pts, eps = 1.5, minPts = 3, numDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    val compA = byId(0L)._2
    val compB = byId(5L)._2
    assert(compA != compB, "blobs must be distinct components")
    assert((0L to 4L).forall(byId(_)._2 == compA))
    assert((5L to 9L).forall(byId(_)._2 == compB))
    assert(byId(10L)._2 == -1L && !byId(10L)._3, "isolated point is noise")
    // interior points are core; all blob members here have >= 2 neighbors
    assert((1L to 3L).forall(byId(_)._3))
  }

  test("chain across ring boundaries merges into one component") {
    // consecutive ints 0..19: every adjacent pair is an eps-pair; rings
    // (eps=1.5) split the chain, CC must merge the fragments back.
    val pts = numPoints(0 until 20)
    val comps = Dbscan.run(spark, pts, eps = 1.5, minPts = 2, numDist)
      .collect().map(r => r.getLong(1)).toSet
    assert(comps.size == 1, s"chain fragmented: $comps")
  }

  test("core-point invariant: all of a core's eps-neighbors share its component") {
    val vals = Seq(0, 1, 2, 7, 8, 9, 10, 30, 31, 32, 60)
    val pts = numPoints(vals)
    val out = Dbscan.run(spark, pts, eps = 2.0, minPts = 3, numDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val comp = out.map(t => t._1 -> t._2).toMap
    val cores = out.filter(_._3).map(_._1).toSet
    for (c <- cores; (id2, v2) <- vals.indices.map(i => (i.toLong, vals(i)))
         if id2 != c && math.abs(vals(c.toInt) - v2) <= 2.0) {
      assert(comp(id2) == comp(c),
        s"neighbor $id2 of core $c in different component")
    }
  }

  test("minPts too high => everything noise (empty-core path)") {
    val pts = numPoints(Seq(0, 10, 20))
    val out = Dbscan.run(spark, pts, eps = 1.0, minPts = 2, numDist).collect()
    assert(out.isEmpty || out.forall(_.getLong(1) == -1L))
  }

  test("editDistanceDbscan groups near-identical euler strings") {
    import spark.implicits._
    val sessions = Seq(
      (1L, "1A-1B-0B-0A"), (2L, "1A-1B-0B-0A"), (3L, "1A-1C-0C-0A"),
      (4L, "1X-1Y-1Z-0Z-0Y-0X"), (5L, "1X-1Y-1Z-0Z-0Y-0X"),
      (6L, "1Q-0Q")
    ).toDS()
    val out = Dbscan.editDistanceDbscan(spark, sessions, eps = 2.0, minPts = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      "strings within edit distance 2 cluster together")
    assert(out(4L) == out(5L))
    assert(out(1L) != out(4L), "distant shapes stay separate")
    assert(out(6L) == -1L, "lone short trace is noise")
  }

  test("connectedComponents: min-id labels, isolated vertex keeps itself") {
    import spark.implicits._
    val v = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("l1", "l2")
    val out = Dbscan.connectedComponents(spark, v, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L && out(5L) == 5L)
    // fixpoint: re-running on the component graph changes nothing
    val e2 = Seq((out(1L), out(2L))).toDF("l1", "l2")
    val again = Dbscan.connectedComponents(spark, Seq(1L).toDF("v"), e2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again(1L) == 1L)
  }
}
