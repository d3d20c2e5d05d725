package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property spec for the degree-oriented triangle counter beyond the
  * m11 oracle: planted graphs with known triangle structure. */
class TriangleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    // normalize to pa < pb, distinct — the documented input contract
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("pa", "pb")
    graft.ops.Cluster.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every node sits on exactly 3 of the 4 triangles") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c = counts(k4)
    assert(c == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $c")
  }

  test("a path has no triangles; adding one chord closes exactly one") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(counts(path).isEmpty)
    val chord = counts(path :+ (0L, 2L))
    assert(chord == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $chord")
  }

  test("hub star plus one rim edge: the hub pays one triangle, not deg²") {
    // star around node 100 with 20 rays; a single rim edge (1, 2)
    // closes exactly one triangle — and with degree orientation the
    // hub (highest degree) is every oriented edge's TARGET, so the
    // wedge join never fans out from it
    val star = (1L to 20L).map(i => (100L, i))
    val c = counts(star :+ (1L, 2L))
    assert(c == Map(100L -> 1L, 1L -> 1L, 2L -> 1L), s"got $c")
  }

  test("two disjoint triangles count independently") {
    val c = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 1L, 11L -> 1L, 12L -> 1L), s"got $c")
  }

  test("pagerank: star hub dominates, symmetric leaves tie exactly") {
    import spark.implicits._
    val star = (1L to 8L).map(i => (0L, i)).toDF("a", "b")
    val r = graft.ops.Cluster.pagerank(star, 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val leaves = (1L to 8L).map(r)
    assert(leaves.distinct.size == 1,
      s"symmetric leaves must have identical integer ranks: $r")
    assert(r(0L) > leaves.head * 2,
      s"hub authority must dominate a leaf: hub=${r(0L)} leaf=${leaves.head}")
  }

  test("label propagation: bridged cliques resolve to two communities") {
    import spark.implicits._
    // two K4 cliques joined by one bridge edge (4—11): after two
    // deterministic iterations every node in a clique carries that
    // clique's min id, and the bridge does NOT merge the communities
    // (the property that separates LPA from connected components,
    // which would return ONE component here)
    def k4(base: Long) = for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)
    val edges = (k4(1L) ++ k4(11L) :+ (4L, 11L)).toDF("a", "b")
    val got = graft.ops.Cluster.labelPropagation(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(got(_) == 1L), s"clique A labels: $got")
    assert((11L to 14L).forall(got(_) == 11L), s"clique B labels: $got")
  }

  test("pagerank: regular graphs stay uniform through iterations") {
    import spark.implicits._
    // triangle = 2-regular: uniform rank is a fixed point of the
    // integer-exact update (deg divides evenly), so every node holds
    // exactly 1e6 micro-rank after any number of iterations
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r = graft.ops.Cluster.pagerank(tri, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet == Set(1000000L), s"got $r")
  }
}
