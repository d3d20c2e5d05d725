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

  test("ccLargeSmallStar: empty and self-loop-only edge frames") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("l1", "l2")
    val (cc0, it0) = graft.ops.Cluster.ccLargeSmallStar(none)
    assert(cc0.count() == 0 && it0 <= 1)
    // self-loops carry no connectivity: canonicalization drops them
    val loops = Seq((5L, 5L), (9L, 9L)).toDF("l1", "l2")
    val (cc1, _) = graft.ops.Cluster.ccLargeSmallStar(loops)
    assert(cc1.count() == 0)
    Caches.drain()
  }

  test("sssp: empty graph keeps only the seed at distance 0") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val fixed = graft.ops.Cluster.sssp(none, 7L, 4).collect()
    assert(fixed.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((7L, 0L)))
    val (conv, iters) = graft.ops.Cluster.ssspConverged(none, 7L)
    assert(iters == 0 && conv.count() == 1)
    Caches.drain()
  }

  test("chunkOverlap: boundary docs — empty, sub-window, exact-window") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                  // blank → no chunks
      (2L, (1 to 10).map("t" + _).mkString(" ")), // < stride → 1 chunk
      (3L, (1 to 48).map("t" + _).mkString(" ")), // == stride → 1 chunk
      (4L, (1 to 49).map("t" + _).mkString(" "))) // stride+1 → 2 chunks
      .toDF("doc_id", "text")
    val ch = graft.ops.TextAnalysis.chunkOverlap(docs, 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ch.toSeq == Seq((2L, 0L, 10L), (3L, 0L, 48L),
      (4L, 0L, 49L), (4L, 1L, 1L)), s"got ${ch.toSeq}")
  }

  test("weightedSample: empty and single-doc strata") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "w")
    assert(graft.ops.TextAnalysis.weightedSample(empty, 5).count() == 0)
    val one = Seq((1L, "s", 10L)).toDF("doc_id", "source", "w")
    val r = graft.ops.TextAnalysis.weightedSample(one, 5).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }

  test("bpeEncodeDocs: empty corpus encodes to an empty frame") {
    assert(graft.ops.TextAnalysis.bpeEncodeDocs(emptyDocs).count() == 0)
    graft.Caches.drain()
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

  test("dupSpanStats: all-short corpus reports zero spans, keeps every doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "x y z w")).toDF(
      "doc_id", "text")
    val got = graft.ops.Dedup.dupSpanStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)),
      s"short/empty docs must report 0 spans, got ${got.toSeq}")
  }

  test("semdedup: singleton corpus keeps its only member") {
    import spark.implicits._
    val v = Seq((7L, Array.fill(8)(0.5))).toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val c = Seq((1L, Array.fill(8)(0.5))).toDF("cid", "cv")
      .select(col("cid"), col("cv"),
        sqrt(graft.ops.Ann.dotCol(col("cv"), col("cv"))).as("cn"))
    val got = graft.ops.Dedup.semdedup(v, c, 0.5).collect()
    assert(got.length == 1 && got.head.getBoolean(3),
      "lone vector must be kept")
  }

  test("pqTopK: corpus smaller than the codebook still returns neighbors") {
    import spark.implicits._
    // 6 vectors < PqK=16 seeds and < QueryK=25 queries: every vector is
    // both a seed and a query; ADC must still rank the other 5
    val rnd = new scala.util.Random(3)
    val vs = (0 until 6).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val df = vs.toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val got = graft.ops.Ann.pqTopK(df, 5).collect()
    assert(got.length == 30, s"6 queries x 5 nbrs expected, ${got.length}")
  }

  test("session_window boundary: event at exactly last_ts+gap MERGES " +
      "into the session; first strictly-later event opens a new one " +
      "(w8's oracle encodes the same strict-> convention)") {
    import spark.implicits._
    // gap = 10 s; events at 0 s, 10 s (== boundary → MERGES: Spark
    // session windows are closed on the right for the merge test),
    // 21 s (> last+gap=20 s → NEW session)
    val e = Seq((1L, 0L), (1L, 10_000_000L), (1L, 21_000_000L))
      .toDF("user_id", "tu")
      .select(col("user_id"), timestamp_micros(col("tu")).as("tss"))
    val got = e.groupBy(col("user_id"),
        session_window(col("tss"), "10 seconds").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("sw.start")), unix_micros(col("sw.end")),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 20_000_000L, 2L),
      (21_000_000L, 31_000_000L, 1L)),
      s"boundary event must merge, strictly-later must split: ${got.toSeq}")
  }

  test("x33 perceptron step 1: w1 is exactly the positive-class count " +
      "sum per feature cell (w=0 scores everything 0 -> yhat=0)") {
    import spark.implicits._
    // planted 2-doc corpus: 'aa aa' (en) hashes to one cell with c=2;
    // 'bbb' (fr) to another. Step-1 weights: en cell = 2, fr cell = 0;
    // step 2: 'aa aa' now scores 4 > 0 (correct, no update), 'bbb'
    // scores 0 -> yhat=0 = y (correct) -> w2 == w1.
    val fa = (2 * 31 + 'a'.toInt) % 64
    val fb = (3 * 31 + 'b'.toInt) % 64
    val docs = Seq((1L, "en", "aa aa"), (2L, "fr", "bbb"))
    val dir = java.nio.file.Files.createTempDirectory("x33probe").toString
    docs.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x33_linear_probe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(fa, fb).sorted.map { f =>
      if (f == fa) (f.toLong, 2L, 2L) else (f.toLong, 0L, 0L) },
      s"got ${got.toSeq}, expected cells fa=$fa fb=$fb")
  }

  test("dsirWeights: absent target source still yields finite weights") {
    import spark.implicits._
    val docs = Seq((1L, "raw", "a b c"), (2L, "raw", "d e f"))
      .toDF("doc_id", "source", "text")
    val got = graft.ops.TextAnalysis.dsirWeights(docs, "nope").collect()
    assert(got.length == 2 && got.forall(r =>
      !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite),
      "weights must stay finite with an empty target")
  }

  test("btFromComparisons: empty duels and a single one-sided pair stay sane") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, String)].toDF("sa", "sb", "win")
    assert(graft.ops.TextAnalysis.btFromComparisons(empty, 3).count() == 0)
    // one pair, all duels one way: loser holds W=0 → strength 0,
    // never a division failure
    val oneWay = Seq.fill(3)(("A", "B", "A")).toDF("sa", "sb", "win")
    val m = graft.ops.TextAnalysis.btFromComparisons(oneWay, 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(m("A")._1 == 3L && m("B") == ((0L, 0L)), s"$m")
  }

  test("voteFromAnnotations: empty frame and single annotation") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "source", "lbl")
    assert(graft.ops.TextAnalysis.voteFromAnnotations(empty).count() == 0)
    val one = Seq((1L, "en", "s", "en"))
      .toDF("doc_id", "lang", "source", "lbl")
    val r = graft.ops.TextAnalysis.voteFromAnnotations(one).collect()
    // one annotator: consensus trivially unanimous at n_agree=1 → the
    // 1/5 agreement denominator still reports its fixed-quorum scale
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }

  test("hardNegatives: all-same-label corpus yields no negatives, no throw") {
    import spark.implicits._
    val vecs = (0L until 5L)
      .map(i => (i, Array.tabulate(4)(j => if (j == i % 4) 1.0 else 0.0), 7))
      .toDF("vec_id", "v", "label")
    assert(graft.ops.Ann.hardNegatives(vecs, 5, 3, 50000L).count() == 0)
  }

  // ---- x47 Fleiss-kappa regimes (round-7 VERDICT #5 / ADVICE) ----

  private def kappaOf(rows: Seq[(String, Long, Long, Long)],
      exactBelow: Long): Map[String, Option[Long]] = {
    import spark.implicits._
    graft.ops.TextAnalysis.fleissKappaReport(
        rows.toDF("source", "n_docs", "s_sum", "c_sq"), exactBelow)
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
  }

  test("x47 kappa: exact and pbar/pe forms agree where both are exact") {
    // planted clean triple: N=1000, S=13000, C=13e6 → κ = −0.25 in
    // BOTH forms (exact: (40e6−52e6)/(100e6−52e6); decomposed:
    // (0.4−0.52)/0.48)
    val clean = Seq(("a", 1000L, 13000L, 13000000L))
    assert(kappaOf(clean, Long.MaxValue) == Map("a" -> Some(-250000L)))
    assert(kappaOf(clean, 0L) == Map("a" -> Some(-250000L)))
    // seeded fuzz across the valid stats space: the two forms may
    // differ only by double-rounding in the final micro digit
    val rnd = new scala.util.Random(4711)
    val rows = (0 until 40).map { k =>
      val n = 10L + math.abs(rnd.nextLong()) % 1000000L
      val s = 5 * n + math.abs(rnd.nextLong()) % (20 * n)
      // below 25N² (perfect agreement) and above the even-spread floor
      val c = 5 * n * n + math.abs(rnd.nextLong()) % (19 * n * n)
      (f"s$k%02d", n, s, c)
    }
    val exact = kappaOf(rows, Long.MaxValue)
    val decomposed = kappaOf(rows, 0L)
    rows.foreach { case (src, _, _, _) =>
      val (a, b) = (exact(src).get, decomposed(src).get)
      assert(math.abs(a - b) <= 1L, s"$src: exact=$a decomposed=$b")
    }
  }

  test("x47 kappa: perfect agreement yields NULL in both regimes") {
    // c_sq = 25N² (every annotation the same label) → P_e = 1 → the
    // chance-corrected denominator vanishes; both engines' branch
    // emits NULL (round-7 ADVICE: Spark NULL vs DuckDB non-NULL)
    val perfect = Seq(("p", 100L, 2500L, 250000L))
    assert(kappaOf(perfect, Long.MaxValue) == Map("p" -> None))
    assert(kappaOf(perfect, 0L) == Map("p" -> None))
  }

  test("x47 kappa: past-2e8-docs sources take the no-wrap pbar/pe path") {
    // N=3.5e8: the exact form's 5N(S−5N) term is 1.04e19 — PAST Long
    // range (silent wrap in non-ANSI Spark). The default report must
    // route this row through the decomposition and land within one
    // micro of the BigInt-exact value.
    val n = 350000000L
    val s = 22L * n
    val c = 1500000000000000000L // 1.5e18 < 25N² = 3.06e18
    assert(BigInt(5) * n * (s - 5 * n) > BigInt(Long.MaxValue),
      "fixture must actually overflow the exact form")
    val pbar = (s - 5.0 * n) / (20.0 * n)
    val pe = c.toDouble / (25.0 * n.toDouble * n.toDouble)
    val expected = math.round(1e6 * (pbar - pe) / (1.0 - pe))
    val got = kappaOf(Seq(("big", n, s, c)),
      graft.ops.TextAnalysis.FleissExactBelow)("big").get
    assert(math.abs(got - expected) <= 1L, s"got=$got expected=$expected")
    // BigInt ground truth: κ = (5N(S−5N) − 4C)/(100N² − 4C)
    val num = BigInt(5) * n * (s - 5 * n) - BigInt(4) * c
    val den = BigInt(100) * n * n - BigInt(4) * c
    val truth =
      (BigDecimal(num) * 1000000 / BigDecimal(den)).rounded.toLong
    assert(math.abs(got - truth) <= 1L, s"got=$got truth=$truth")
  }

  test("x47 kappa: sources beyond the c_sq-exact bound fail LOUDLY") {
    // N=7e8 exceeds FleissCsqBound: c_sq itself may have wrapped
    // upstream, so no downstream rearrangement is trustworthy — the
    // guard branch raises instead of silently diverging from DuckDB
    val e = intercept[Exception] {
      kappaOf(Seq(("huge", 700000000L, 3500000000L, 1000L)),
        graft.ops.TextAnalysis.FleissExactBelow)
    }
    assert(e.getMessage != null)
  }
}
