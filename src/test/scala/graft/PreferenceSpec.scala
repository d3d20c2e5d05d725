package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property specs for the preference/label aggregation operators
  * (x37 Bradley-Terry ranking) beyond their DuckDB oracle rows: the MM
  * core must recover planted strength orderings and respect the
  * model's symmetry.
  */
class PreferenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def bt(comps: Seq[(String, String, String)], iters: Int = 3) = {
    import spark.implicits._
    ops.TextAnalysis.btFromComparisons(
      comps.toDF("sa", "sb", "win"), iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("x37 BT core recovers a planted transitive ordering") {
    // A beats B 4:1, B beats C 4:1, A beats C 5:0 — strengths must
    // order A > B > C regardless of iteration count
    val duels =
      Seq.fill(4)(("A", "B", "A")) ++ Seq.fill(1)(("A", "B", "B")) ++
      Seq.fill(4)(("B", "C", "B")) ++ Seq.fill(1)(("B", "C", "C")) ++
      Seq.fill(5)(("A", "C", "A"))
    for (it <- Seq(1, 3, 6)) {
      val m = bt(duels, it)
      val (sa, sb, sc) = (m("A")._2, m("B")._2, m("C")._2)
      assert(sa > sb && sb > sc, s"iters=$it strengths=$m")
      assert(m("A")._3 == 1L && m("B")._3 == 2L && m("C")._3 == 3L)
    }
  }

  test("x37 BT core: symmetric duels give equal strengths") {
    // every pair splits 1:1 — the MM fixpoint is uniform, and the
    // integer micro-unit arithmetic must land all three on the SAME
    // value (any asymmetry would be an arithmetic-order bug)
    val duels = Seq(
      ("A", "B", "A"), ("A", "B", "B"),
      ("B", "C", "B"), ("B", "C", "C"),
      ("A", "C", "A"), ("A", "C", "C"))
    val m = bt(duels, 4)
    val strengths = m.values.map(_._2).toSet
    assert(strengths.size == 1, s"expected uniform strengths, got $m")
  }

  test("x37 BT core: zero-win entity drops to strength 0 and last rank") {
    val duels = Seq(("A", "B", "A"), ("A", "B", "A"), ("B", "C", "B"),
      ("A", "C", "A"))
    val m = bt(duels)
    assert(m("C")._1 == 0L && m("C")._2 == 0L)
    assert(m("C")._3 == 3L)
    assert(m("A")._2 > m("B")._2)
  }

  test("x38 vote kernel: majority, unanimity, and accuracy on planted annotations") {
    import spark.implicits._
    // doc 1: 3×"xx" vs 2×"en" → majority flips AWAY from the true lang;
    // doc 2: unanimous "en"; doc 3: 4-1 split toward the true lang
    val ann = (
      Seq.fill(3)((1L, "en", "s1", "xx")) ++ Seq.fill(2)((1L, "en", "s1", "en")) ++
      Seq.fill(5)((2L, "en", "s1", "en")) ++
      Seq.fill(4)((3L, "de", "s2", "de")) ++ Seq.fill(1)((3L, "de", "s2", "xx"))
    ).toDF("doc_id", "lang", "source", "lbl")
    val out = ops.TextAnalysis.voteFromAnnotations(ann).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // s1: agreements 3/5 and 5/5 → 0.8 mean; half unanimous; doc 1's
    // majority is wrong → accuracy 0.5
    assert(out("s1") == ((2L, 0.8, 0.5, 0.5)))
    assert(out("s2") == ((1L, 0.8, 0.0, 1.0)))
  }

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("x41 DPO pairs are the reward extremes of x42's per-sample frame") {
    val adv = q("x42_group_advantage").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val bySrc = adv.groupBy(_._1)
    val pairs = q("x41_dpo_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (src, chosen, rejected, rc, rr, margin) =>
      assert(chosen != rejected)
      assert(margin == rc - rr && margin >= 500)
      // cross-operator consistency: the pair's rewards are the
      // source's true extremes in the advantage frame
      val rs = bySrc(src).map(_._3)
      assert(rc == rs.max, s"$src chosen reward $rc != max ${rs.max}")
      assert(rr == rs.min, s"$src rejected reward $rr != min ${rs.min}")
    }
    // sub-margin sources are absent, not zero-row artifacts
    bySrc.foreach { case (src, rows) =>
      val has = pairs.exists(_._1 == src)
      assert(has == (rows.map(_._3).max - rows.map(_._3).min >= 500),
        s"margin gate wrong for $src")
    }
  }

  test("x42 advantages are zero-mean and reward-monotonic per group") {
    val adv = q("x42_group_advantage").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    adv.groupBy(_._1).foreach { case (src, rows) =>
      // Σ round(z_i·1e6) stays within n/2 micro of the exact zero sum
      val mean = rows.map(_._3).sum.toDouble / rows.length
      assert(math.abs(mean) <= 1.0, s"$src mean adv $mean")
      // standardization preserves reward order
      val ordered = rows.sortBy(_._2).map(_._3)
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(a <= b, s"$src not monotonic")
      }
    }
  }
}
