package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property specs for the curation operators (x6 stratified sampling,
  * x7 token-budget packing) beyond their DuckDB oracle rows: sampling
  * determinism/containment and the greedy-prefix/budget invariants. */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("x6 sample is deterministic, contained, and respects strata rates") {
    val a = q("x6_strat_sample").collect().map(_.getLong(0)).toSeq
    val b = q("x6_strat_sample").collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash-based sampling must be reproducible run-to-run")
    val all = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.toSet.subsetOf(all))
    // rate sanity: a mod-100 bucket threshold keeps roughly rate% per
    // stratum; with hundreds of docs per language the loose 3x envelope
    // only catches wiring bugs (rate applied to the wrong stratum)
    val byLang = q("x6_strat_sample").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enRate > 0.05 && enRate < 0.75, s"en rate $enRate vs nominal 0.25")
  }

  test("x7 keeps the budget and packs highest-quality-first per language") {
    val rows = q("x7_budget_pack")
      .select("lang", "doc_id", "n_toks", "quality", "cum_toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // budget invariant: every running total (so every per-lang sum) <= 2000
    assert(rows.forall(_._5 <= 2000L))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._3).sum == rs.map(_._5).max,
        s"$lang: kept rows must form one contiguous running total")
    }
    // greedy-prefix invariant: within a language, every kept doc ranks
    // (quality desc, doc_id asc) before every dropped doc
    val keptIds = rows.map(_._2).toSet
    val scored = q("x2_quality").select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val langs = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    langs.groupBy(_._2).foreach { case (lang, docs) =>
      val order = docs.map(_._1).filter(scored.contains)
        .sortBy(id => (-scored(id), id))
      val keptPos = order.zipWithIndex.filter(p => keptIds.contains(p._1))
      val dropPos = order.zipWithIndex.filterNot(p => keptIds.contains(p._1))
      if (keptPos.nonEmpty && dropPos.nonEmpty)
        assert(keptPos.map(_._2).max < dropPos.map(_._2).min,
          s"$lang: kept set must be a prefix of the quality order")
    }
  }

  test("x8 repetition stats: planted loop flagged, all-distinct doc clean") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("ab cd " * 50).trim),            // one bigram repeated
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")), // all distinct
      (3L, "solo"))                           // <2 tokens: no grams
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(3L), "gram-less docs drop out")
    val (n1, dup1, top1, flag1) = out(1L)
    assert(n1 == 99 && dup1 > 0.9 && top1 > 0.4 && flag1,
      s"looped doc must be flagged, got $out")
    val (n2, dup2, top2, flag2) = out(2L)
    assert(n2 == 59 && dup2 == 0.0 && !flag2,
      s"all-distinct doc must be clean, got $out")
  }

  test("x9 decontam: verbatim copy of a benchmark doc scores rate 1.0") {
    import spark.implicits._
    val benchText = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, benchText),                          // benchmark member
      (10L, benchText),                         // verbatim contamination
      (11L, (1 to 30).map(i => s"c$i").mkString(" ")), // disjoint
      (12L, benchText.split(" ").take(10).mkString(" ") + " " +
        (1 to 20).map(i => s"d$i").mkString(" "))) // partial overlap
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis
      .decontam(docs, col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(!out.contains(0L), "benchmark rows are excluded from the report")
    assert(out(10L)._3 == 1.0 && out(10L)._4, s"verbatim copy: $out")
    assert(out(11L)._2 == 0L && !out(11L)._4, s"disjoint doc: $out")
    assert(out(12L)._2 == 6L && out(12L)._4,
      s"10 shared leading tokens = 6 shared 5-grams: $out")
  }

  test("x10 KMV estimate tracks the exact distinct count") {
    val rows = q("x10_kmv_distinct")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    val exact = Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.functions.tokens(col("text")))
        .as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    for ((src, (nKept, est)) <- rows) {
      val truth = exact(src).toDouble
      if (nKept < 256)
        assert(est == truth, s"$src under-k estimate must be exact")
      else
        // KMV standard error is 1/sqrt(k-1) ≈ 6.3% at k=256; 3σ envelope
        assert(math.abs(est - truth) / truth < 0.19,
          s"$src: est $est vs exact $truth drifts past 3σ")
    }
  }

  test("x13 KmvAggregator: order- and partitioning-independent, equals x10") {
    // Algebraic contract: any fold/merge tree over any permutation must
    // equal sorted-distinct-take-k of the whole input.
    val agg = new graft.functions.KmvAggregator(8)
    val rnd = new scala.util.Random(42)
    val xs = Vector.fill(300)(rnd.nextLong(1L << 40))
    val expect = xs.distinct.sorted.take(8)
    for (trial <- 0 until 20) {
      val perm = rnd.shuffle(xs)
      // random partitioning into 1..6 chunks, each folded then merged
      val nChunks = 1 + rnd.nextInt(6)
      val chunks = perm.grouped(math.max(1, perm.size / nChunks)).toSeq
      val merged = chunks
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(merged.hashes == expect, s"trial $trial diverged")
    }
    // duplicate-heavy input: buffer holds DISTINCT hashes only
    val dup = agg.reduce(agg.reduce(agg.zero, 5L), 5L)
    assert(dup.hashes == Vector(5L))

    // end-to-end: the one-pass aggregator query returns exactly the
    // window-based x10 rows (same sketch, same estimator)
    val viaAgg = q("x13_kmv_agg").collect().map(_.toSeq).toSet
    val viaWin = q("x10_kmv_distinct").collect().map(_.toSeq).toSet
    assert(viaAgg == viaWin)
  }

  test("approx_count_distinct (HLL++) within 5% of exact; KMV agrees") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.tokens(col("text"))).as("tok"))
    val exact = toks.distinct().count()
    val approx = toks.agg(approx_count_distinct(col("tok"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL $approx vs exact $exact")
    // the KMV sketch (our own mergeable estimator) must land in the
    // same envelope — two independent sketch families cross-checking
    val kmvTotal = q("x10_kmv_distinct")
      .agg(org.apache.spark.sql.functions.sum("est_distinct")).head()
      .getDouble(0)
    val exactPerSource = Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.functions.tokens(col("text")))
        .as("tok")).distinct().count()
    assert(math.abs(kmvTotal - exactPerSource) / exactPerSource < 0.10,
      s"KMV sum $kmvTotal vs exact per-source sum $exactPerSource")
  }

  test("x14 count-min estimate is a one-sided, bounded overestimate") {
    val rows = q("x14_countmin")
      .select("tok", "exact_cnt", "cms_est").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    // one-sided error: a count-min cell only ever overcounts
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: est $est < exact $exact")
    }
    // standard CMS bound: err <= (e/w)·N w.h.p. per probe; 3x envelope
    // so only wiring bugs (wrong hash row, wrong min) trip it
    val n = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.tokens(col("text")))).count()
    val bound = 3 * (math.E / 512) * n
    rows.foreach { case (tok, exact, est) =>
      assert(est - exact <= bound,
        s"$tok overestimate ${est - exact} exceeds bound $bound")
    }
  }

  test("x25 bpeMerge is whole-symbol-boundary-aware (round-6 ADVICE)") {
    import spark.implicits._
    // (word, pa, pb, expected) — the cross-boundary trap: once merge 1
    // has produced symbol 'th', applying ('h','e') to "th e" must NOT
    // merge (the left symbol is 'th', not 'h'); plus adjacent-repeat
    // runs, which a single-space sentinel pad would under-merge.
    val cases = Seq(
      ("t h e", "h", "e", "t he"),       // genuine pair merges
      ("th e", "h", "e", "th e"),        // cross-boundary must NOT merge
      ("e h e h e", "h", "e", "e he he"),
      ("pa pb pa pb", "pa", "pb", "papb papb"), // both adjacent pairs
      ("a a a", "a", "a", "aa a"),       // left-to-right non-overlapping
      ("a a a a", "a", "a", "aa aa"),
      ("x pa pb y", "pa", "pb", "x papb y"),
      ("pa pb", "pa", "pb", "papb"))
    val got = cases.toDF("w", "pa", "pb", "want")
      .select(ops.TextAnalysis.bpeMerge(col("w"), col("pa"), col("pb"))
        .as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"bpeMerge: got '${r.getString(0)}', want '${r.getString(1)}'"))
  }

  test("x25 merge table deviates from naive replace on planted corpus") {
    import spark.implicits._
    // A corpus where iteration-2's naive string replace would merge
    // across the boundary of iteration-1's new symbol: words "the"
    // (→ 't h e' → 'th e' after merge ('t','h')) plus planted "he"
    // pairs. Naive replace(w, 'h e', 'he') would corrupt 'th e'.
    val w0 = Seq.fill(5)("t h e").map((_, 3L)) ++
      (Seq.fill(4)("x h e") ++ Seq.fill(4)("h e y")).map((_, 2L))
    val vocab = w0.toDF("w", "c")
    val p1 = vocab.select(ops.TextAnalysis
      .bpeMerge(col("w"), lit("t"), lit("h")).as("w"), col("c"))
    // after ('t','h'): "th e" must keep its 'h e' UN-mergeable
    val merged2 = p1.select(ops.TextAnalysis
      .bpeMerge(col("w"), lit("h"), lit("e")).as("w")).as[String].collect()
    assert(merged2.count(_ == "th e") == 5,
      s"'th e' corrupted by cross-boundary merge: ${merged2.toSeq}")
    assert(merged2.count(_ == "x he") == 4)
    assert(merged2.count(_ == "he y") == 4)
  }

  test("x27 DSIR upweights target-vocab docs, downweights disjoint vocab") {
    import spark.implicits._
    // target docs share a vocabulary; raw docs split between
    // target-like and disjoint-vocab. DSIR's log-ratio must rank the
    // target-like raw doc strictly above every disjoint-vocab doc.
    val tgtText = "alpha beta gamma delta epsilon zeta eta theta"
    val offText = "one two three four five six seven eight"
    val docs = Seq(
      (1L, "tgt", tgtText), (2L, "tgt", tgtText), (3L, "tgt", tgtText),
      (10L, "raw", tgtText),           // target-like raw doc
      (11L, "raw", offText), (12L, "raw", offText))
      .toDF("doc_id", "source", "text")
    val w = ops.TextAnalysis.dsirWeights(docs, "tgt").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(11L) && w(10L) > w(12L),
      s"target-like doc not upweighted: $w")
    assert(w(1L) > w(11L), s"target doc not above disjoint raw: $w")
  }

  test("x29 BPE encode: hand-computed merge chain on a planted corpus") {
    import spark.implicits._
    // vocabulary {aaab: 3}. Symbolized 'a a a b'. Training: t1=(a,a) n=6
    // (left-to-right non-overlapping → 'aa a b'); t2: (aa,a) n=3 vs
    // (a,b) n=3 tie → lexicographic pa picks (a,b) → 'aa ab';
    // t3=(aa,ab) → single symbol 'aaab'. Every occurrence of the word
    // must therefore encode to ONE symbol.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab"))
      .toDF("doc_id", "text")
    val r = ops.TextAnalysis.bpeEncodeDocs(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 2L, 8L, 2L), (2L, 1L, 4L, 1L)),
      s"merge chain must fully fuse 'aaab': ${r.toSeq}")
    Caches.drain()
  }

  test("x29 on harness docs: n_toks <= n_bpe <= n_chars, merges bite") {
    val rows = q("x29_bpe_encode")
      .select("n_toks", "n_chars", "n_bpe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, c, b) =>
      assert(t <= b && b <= c, s"symbol count out of range: ($t, $c, $b)")
    }
    // 3 merge rules on a natural-ish corpus must compress SOMETHING
    assert(rows.map(r => r._2 - r._3).sum > 0, "no merge ever applied")
    Caches.drain()
  }

  test("bpeTrain: deep loop — early exhaustion, x25 prefix agreement, O(1) plan") {
    import spark.implicits._
    // 'aaab' corpus: the full merge sequence is exactly (a,a), (a,b),
    // (aa,ab) — after which every word is ONE symbol and the trainer
    // must stop EARLY despite maxMerges=12
    val tiny = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val (mt, vFinal) = ops.TextAnalysis.bpeTrain(tiny, 12)
    val rules = mt.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq == Seq((1L, "a", "a", 6L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 3L)), s"got ${rules.toSeq}")
    assert(vFinal.collect().map(_.getString(0)).toSeq == Seq("aaab"))

    // a 13-symbol word demands 12 merges: the loop must go the full
    // depth, and the final vocab plan must be a checkpoint scan (O(1)),
    // not a 12-round projection tower
    val deep = Seq((1L, "abcdefghijklm")).toDF("doc_id", "text")
    val (mt2, v2) = ops.TextAnalysis.bpeTrain(deep, 12)
    assert(mt2.count() == 12)
    assert(v2.collect().map(_.getString(0)).toSeq == Seq("abcdefghijklm"))
    val nNodes = v2.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nNodes <= 6, s"lineage not cut: $nNodes nodes")

    // prefix agreement: the first 3 rules on the harness corpus equal
    // the oracle-verified x25 merge table
    val x25 = q("x25_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val (mt3, _) = ops.TextAnalysis.bpeTrain(
      Tables.documents(spark, sfDir).select("doc_id", "text"), 3)
    val prefix = mt3.collect()
      .map(r => (r.getLong(0), r.getString(1) + "+" + r.getString(2))).toMap
    assert(prefix == x25, s"deep-trainer prefix $prefix != x25 $x25")
    Caches.drain()
  }

  test("x31 weighted sample equals a driver-side A-ES rederivation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", 5L), (2L, "s1", 50L), (3L, "s1", 500L), (4L, "s1", 1L),
      (5L, "s2", 10L), (6L, "s2", 10L), (7L, "s2", 10L))
      .toDF("doc_id", "source", "w")
    val got = ops.TextAnalysis.weightedSample(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent rederivation from first principles (MessageDigest md5,
    // not Spark's): u = (h48+1)/2^48, key = round(-ln(u)*1e6)/w, keep
    // the 2 smallest keys per source
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val h = java.lang.Long.parseLong(hex, 16)
      math.round(-math.log((h + 1) / 281474976710656.0) * 1e6).toDouble / w
    }
    val want = Seq((1L, "s1", 5L), (2L, "s1", 50L), (3L, "s1", 500L),
      (4L, "s1", 1L), (5L, "s2", 10L), (6L, "s2", 10L), (7L, "s2", 10L))
      .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        ds.sortBy(d => (key(d._1, d._3), d._1)).take(2).zipWithIndex
          .map { case (d, i) => (src, i + 1L, d._1) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  private def md5h48(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16)
  }

  test("x35 shard manifest equals a driver-side prefix-sum rederivation") {
    import spark.implicits._
    // token counts chosen so shards split mid-stream AND one doc
    // (40 tokens > B=16) spans several budget units doc-atomically
    val ws = Seq(1L -> 7, 2L -> 5, 3L -> 40, 4L -> 9, 5L -> 3,
      6L -> 12, 7L -> 1)
    val docs = ws.map { case (id, n) => (id, Seq.fill(n)("t").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = ops.TextAnalysis.shardShuffle(docs, 16L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // rederive: md5-48 hash order, global cumsum, shard = cumBefore/B
    val ordered = ws.map { case (id, n) => (md5h48(id), n.toLong) }
      .sortBy(_._1)
    val want = ordered.scanLeft(0L)(_ + _._2).zip(ordered)
      .map { case (cb, (h, w)) => (cb / 16L, h, w) }
      .groupBy(_._1).toSeq.map { case (shard, rows) =>
        (shard, rows.size.toLong, rows.map(_._3).sum,
          rows.map(_._2).min, rows.map(_._2).max)
      }.sortBy(_._1)
    assert(got == want, s"got $got\nwant $want")
    // every doc lands in exactly one shard and token mass is conserved
    assert(got.map(_._2).sum == ws.size && got.map(_._3).sum == 77L)
    // degenerate inputs: empty corpus and blank docs produce no shards
    assert(ops.TextAnalysis.shardShuffle(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 16L).count() == 0)
    assert(ops.TextAnalysis.shardShuffle(
      Seq((1L, "   ")).toDF("doc_id", "text"), 16L).count() == 0)
  }

  test("x36 BM25 equals an integer-exact rederivation; no-hit docs drop") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a a b c"), (2L, "a b b d"), (3L, "c d e f"))
    val docs = corpus.toDF("doc_id", "text")
    val got = ops.TextAnalysis.bm25TopK(docs, 1, 2, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // rederive with the same integer quantization (BigDecimal HALF_UP
    // mirrors Spark's round()) — df-ranks 1..2 select the query terms
    def r2l(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val tf = corpus.flatMap { case (id, t) =>
      t.split("\\s+").map(tok => (id, tok)) }
      .groupBy(identity).map { case ((id, tok), o) => (id, tok, o.size.toLong) }
    val dl = tf.groupBy(_._1).map { case (id, o) => id -> o.map(_._3).sum }
    val n = dl.size
    val avgdlMilli = r2l(dl.values.sum.toDouble / n * 1e3)
    val q = tf.groupBy(_._2).map { case (tok, o) => tok -> o.size.toLong }
      .toSeq.sortBy { case (tok, df) => (-df, tok) }.take(2)
      .map { case (tok, df) =>
        tok -> r2l(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6) }
      .toMap
    val want = tf.filter(r => q.contains(r._2)).map { case (id, tok, f) =>
      val denom = f * 1000000L + 300000L +
        r2l(9e8 * dl(id) / avgdlMilli)
      id -> (q(tok) * f * 2200000L) / denom
    }.groupBy(_._1).toSeq
      .map { case (id, o) => (id, o.map(_._2).sum, o.size.toLong) }
      .sortBy { case (id, sc, _) => (-sc, id) }
    assert(got == want, s"got $got\nwant $want")
    // doc 3 shares no query term and must be absent, not zero-scored
    assert(!got.exists(_._1 == 3L))
    assert(ops.TextAnalysis.bm25TopK(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 1, 2, 10)
      .count() == 0)
  }

  test("x39 kanon partitions every doc exactly once and levels are consistent") {
    val out = q("x39_kanon").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // conservation: each document lands in exactly one released class
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_._5).sum == total, "class sizes must partition the corpus")
    // level-0 classes all cleared k (risky ones were generalized away)
    out.filter(_._3 == 0L).foreach(c => assert(c._6 && c._5 >= 5, s"$c"))
    // a level-1 class is the 4x-coarse merge of risky level-0 mass:
    // its bucket must be reachable from some sub-k fine bucket
    val fineRisky = out.filter(_._3 == 1L)
    fineRisky.foreach(c => assert(c._6 == (c._5 >= 5), s"$c"))
    // levels never overlap on the same (lang, source, coarse bucket)
    // with a level-0 class claiming the same fine bucket range twice
    assert(out.map(c => (c._1, c._2, c._3, c._4)).distinct.length
      == out.length)
  }

  test("x40 RRF fusion: scores recompute from ranks, ordering and arity hold") {
    val rows = q("x40_rrf_fusion").collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (doc, lr, sr, s) =>
      assert(lr.isDefined || sr.isDefined, s"doc $doc in neither list")
      val expect = lr.map(x => 1000000L / (60L + x)).getOrElse(0L) +
        sr.map(x => 1000000L / (60L + x)).getOrElse(0L)
      assert(s == expect, s"doc $doc rrf $s != $expect from ($lr, $sr)")
    }
    // descending fused score; determinism across runs
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
    assert(q("x40_rrf_fusion").collect().map(_.getLong(0)).toSeq ==
      rows.map(_._1).toSeq)
  }

  test("x43 temperature mix flattens: probabilities sum to 1, boost anti-monotonic in size") {
    val rows = q("x43_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // Σ p_micro = 1e6 minus at most one floor-unit per source
    val pSum = rows.map(_._3).sum
    assert(pSum <= 1000000L && pSum >= 1000000L - rows.length,
      s"p sum $pSum")
    // α=1/2 boosts small sources over large ones: boost_micro is
    // non-increasing as token mass grows (ties possible via flooring)
    val bySize = rows.sortBy(_._2)
    bySize.zip(bySize.drop(1)).foreach { case (a, b) =>
      assert(a._4 >= b._4, s"boost not anti-monotonic: $a vs $b")
    }
    // every boost stays a genuine reweight: small sources above 1x,
    // the largest below the mean-preserving line only if some source
    // sits above it
    assert(rows.exists(_._4 > 1000000L) && rows.exists(_._4 < 1000000L))
  }

  test("x44 calibration bins partition the corpus; mean score rises with bin") {
    val rows = q("x44_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    // equi-width bins over scored docs: counts partition the corpus
    // (probe features drop blank docs — none in the harness data)
    val total = Tables.documents(spark, sfDir)
      .filter(trim(col("text")) =!= "").count()
    assert(rows.map(_._2).sum == total)
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    // bins are score ranges in increasing order → per-bin means rise
    val sorted = rows.sortBy(_._1)
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      assert(a._4 < b._4, s"bin means not increasing: $a vs $b")
    }
  }

  test("x45 ngram eval equals a driver-side clipped-overlap rederivation") {
    val rows = q("x45_ngram_eval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size, "one row per candidate doc")
    rows.foreach { r =>
      assert(Seq(r._3, r._4, r._5, r._6).forall(v => v >= 0 && v <= 1000000))
    }
    def counts(id: Long, n: Int): Map[String, Long] = {
      val t = texts(id).trim.split("\\s+").toSeq
      t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    }
    // exact rederivation on 10 spread-out pairs
    rows.sortBy(_._1).grouped(rows.length / 10 + 1).map(_.head).foreach {
      case (cid, rid, r1, p1, r2, p2) =>
        for ((n, er, ep) <- Seq((1, r1, p1), (2, r2, p2))) {
          val (cc, cr) = (counts(cid, n), counts(rid, n))
          val inter = cc.keysIterator
            .map(g => math.min(cc(g), cr.getOrElse(g, 0L))).sum
          assert(er == inter * 1000000L / math.max(cr.values.sum, 1L),
            s"recall mismatch pair ($cid,$rid) n=$n")
          assert(ep == inter * 1000000L / math.max(cc.values.sum, 1L),
            s"precision mismatch pair ($cid,$rid) n=$n")
        }
    }
  }
}
