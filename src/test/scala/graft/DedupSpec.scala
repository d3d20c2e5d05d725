package graft

import graft.ops.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash dedup specs: planted near-dups collide, distant docs don't,
  * chunk-bucket recall is exact for hamming <= 3 (pigeonhole). */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the fast key order sort table scan merge part window small hash " +
      "join batch stream spark group query row data slow filter customer"

  test("planted near-dup (one token changed) has small hamming; detected") {
    val docs = docsDf(Seq(
      (1L, base),
      // near-dup of 1: one token changed; under the md5-derived 60-bit
      // signatures this swap measures hamming 3 (signature arithmetic is
      // pinned by the d4 DuckDB oracle, so the fixture is stable)
      (2L, base.replace("window", "chunk")),
      (3L, "completely different words entirely unrelated content xyz " +
        "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val sigs = Dedup.simhashSigsOf(docs)
    val pairs = Dedup.simhashPairs(sigs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "distant doc must not pair")
  }

  test("identical docs have hamming 0") {
    val docs = docsDf(Seq((1L, base), (2L, base)))
    val out = Dedup.simhashPairs(Dedup.simhashSigsOf(docs), 3).collect()
    assert(out.length == 1 && out.head.getLong(2) == 0L)
  }

  test("d2 hot-bucket cap: stop-shingles dropped, planted near-dups survive") {
    // 30 filler docs all share one hot phrase (its trigrams appear in
    // every doc → posting lists of 30+), plus 2 planted near-dup pairs
    // whose overlap lives in their own unique content.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = docsDf(
      (0 until 30).map(i => (i.toLong, s"$hot filler$i unique$i token$i")) ++
        Seq(
          (100L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (101L, s"alpha beta gamma delta epsilon zeta eta theta iota lambda"),
          (200L, s"one two three four five six seven eight nine ten"),
          (201L, s"one two three four five six seven eight nine eleven")))
    val sh = Dedup.shinglesOf(docs).cache()
    val uncapped = Dedup.ngramJaccardPairsOf(sh, 0.5, None).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.ngramJaccardPairsOf(sh, 0.5, Some(10)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // recall-biased-exact: capped pairs are a subset, never new pairs...
    assert(capped.keySet.subsetOf(uncapped.keySet),
      s"cap invented pairs: ${capped.keySet -- uncapped.keySet}")
    // ...and per-pair jaccard can only drop (shared skips hot shingles)
    capped.foreach { case (k, j) => assert(j <= uncapped(k) + 1e-9) }
    // the planted near-dups share only cold shingles → still found
    assert(capped.contains((100L, 101L)) && capped.contains((200L, 201L)),
      s"planted pairs lost under cap: ${capped.keySet}")
    // the hot phrase alone no longer generates candidate work: filler
    // docs pair with nobody once its trigrams are dropped
    assert(!capped.keySet.exists { case (a, b) => a < 30 || b < 30 })
  }

  test("d7 containment catches a subset doc that Jaccard misses") {
    // doc 1 is VERBATIM contained in doc 2, which is 3x longer:
    // c(1→2) = 1.0 while jaccard ≈ |A|/|B| ≈ 0.33 — below d2's 0.5
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = docsDf(Seq(
      (1L, small),
      (2L, s"$small one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"),
      (3L, "totally different content with no overlap at all here")))
    val sh = Dedup.shinglesOf(docs).cache()
    val jac = Dedup.ngramJaccardPairsOf(sh, 0.5, None).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard at 0.5 should NOT pair the subset doc")
    val cont = Dedup.containmentPairsOf(sh, 0.8, None).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(cont.exists { case (a, b, cab, _) =>
      a == 1L && b == 2L && cab == 1.0 },
      s"containment must pair (1, 2) with c_ab = 1.0: ${cont.toSeq}")
    assert(!cont.exists(t => t._1 == 3L || t._2 == 3L),
      "disjoint doc must not pair")
  }

  test("d8 segment dedup: a copied half survives only at first occurrence") {
    // doc 2's first 10 tokens are VERBATIM doc 1's first segment; its
    // second segment is unique — kept_frac must be exactly 0.5, while
    // doc 1 (the first occurrence) keeps everything
    val segA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = docsDf(Seq(
      (1L, s"$segA b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
      (2L, s"$segA c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (3L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")))
    val r = Dedup.segmentDedupStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(r(1L) == ((2L, 2L, 1.0)), s"doc 1 must keep all: ${r(1L)}")
    assert(r(2L) == ((2L, 1L, 0.5)), s"doc 2 must lose the copy: ${r(2L)}")
    assert(r(3L) == ((1L, 1L, 1.0)))
  }

  test("d10 winnowing is shift-invariant: offset passage still detected") {
    // A 12-token passage copied at OFFSET 3 into another document: d8's
    // fixed 10-token segmentation sees no duplicate segment (the copy
    // straddles two segments with different alignment), but winnowing's
    // sliding-window fingerprints depend only on passage CONTENT, so
    // the pair must surface with several shared fingerprints.
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    val docs = docsDf(Seq(
      (1L, s"$passage x1 x2 x3 x4 x5 x6 x7 x8"),
      (2L, s"y1 y2 y3 $passage z1 z2 z3 z4 z5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16")))
    // winnowing fires on the shifted copy
    val pairs = Dedup.winnowPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)),
      s"winnowing should catch exactly the planted pair: $pairs")
    assert(pairs((1L, 2L)) >= 3)
    // the fixed-offset segmenter misses the same planted copy entirely
    val segs = Dedup.segmentDedupStats(docs.select(col("doc_id"),
        col("text"))).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(segs(2L) == 1.0,
      s"fixed segmentation keeps everything (blind to the shifted copy): $segs")
  }

  test("d10 hot-fingerprint cap: boilerplate dropped, planted pair survives") {
    // a passage shared by MANY docs (boilerplate) vs one shared by two:
    // with the cap at 3, the boilerplate fingerprints' posting lists
    // (size 6) are dropped before pair generation, so the 6 boilerplate
    // docs produce no pairs — while the rare two-doc passage's
    // fingerprints (posting lists of 2) survive untouched
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
    val rare = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"
    val docs = docsDf(
      (1L to 6L).map(i => i -> s"$boiler u${i}a u${i}b u${i}c u${i}d") ++
        Seq(10L -> s"$rare v1 v2 v3 v4", 11L -> s"w1 w2 w3 $rare"))
    val capped = Dedup.winnowPairs(docs, 2, Some(3)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 11L)),
      s"cap should keep only the rare pair: $capped")
    // uncapped finds the boilerplate clique too
    val full = Dedup.winnowPairs(docs, 2, None).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.contains((10L, 11L)) && full.exists(p => p._1 <= 6),
      s"uncapped should also pair boilerplate docs: $full")
  }

  test("winnowing guarantee: any shared 8+-token passage collides, 25 random trials") {
    // The winnowing THEOREM (Schleimer et al. §3): two documents
    // sharing a passage long enough to contain one full window of
    // k-grams share at least one selected fingerprint — regardless of
    // passage position or surrounding text. Randomized check with a
    // fixed seed: random unique-token docs, a shared passage of
    // random length (8..20) planted at random offsets in both.
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val trials = (0 until 25).map { t =>
      val passLen = 8 + rnd.nextInt(13)
      val passage = (0 until passLen).map(i => s"p${t}_$i").mkString(" ")
      def doc(tag: String): String = {
        val pre = (0 until rnd.nextInt(12)).map(i => s"$tag-a$i")
        val post = (0 until rnd.nextInt(12)).map(i => s"$tag-b$i")
        (pre ++ Seq(passage) ++ post).mkString(" ")
      }
      (t, doc(s"x$t"), doc(s"y$t"))
    }
    val docs = trials.flatMap { case (t, da, db) =>
      Seq((t * 2L, da), (t * 2L + 1, db)) }.toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = trials.map(_._1).filterNot(t =>
      pairs.contains((t * 2L, t * 2L + 1)))
    assert(missed.isEmpty,
      s"trials with an undetected shared passage: $missed")
  }

  test("d11 incremental dedup: every status class on planted batch") {
    import spark.implicits._
    // existing corpus: docs 1-3 (doc_id % 5 != 4); arriving batch:
    // 4 (verbatim copy of existing 1 → dup_existing keeper 1),
    // 9 + 14 (near-identical to each other only → 9 kept, 14 dup_new),
    // 19 (unique → kept)
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten"
    val dir = java.nio.file.Files.createTempDirectory("graft_d11_").toString
    Seq(
      1L -> a,
      2L -> "red orange yellow green blue indigo violet white black grey",
      3L -> "cat dog bird fish horse cow sheep goat pig duck",
      4L -> a,
      9L -> s"$b extra1",
      14L -> s"$b extra2",
      19L -> "unique solo text with no relative anywhere at all ok"
    ).toDF("doc_id", "text")
      .withColumn("source", lit("t")).withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.incrementalDedup(spark, dir, 0.5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      4L -> ("dup_existing", 1L),
      9L -> ("kept", 9L),
      14L -> ("dup_new", 9L),
      19L -> ("kept", 19L)), s"got $got")
  }

  test("x21 corpus overlap: sketch estimate tracks planted true Jaccard") {
    import org.apache.spark.sql.functions.lit
    val spark2 = spark
    import spark2.implicits._
    // sources A and B share 30 of their 50 docs → true doc-level
    // Jaccard = 30 / 70 ≈ 0.43; C is disjoint → 0. A 64-lane sketch
    // has σ ≈ sqrt(J(1−J)/64) ≈ 0.06 — assert within 3σ.
    val shared = (0 until 30).map(i => s"shared doc number $i with words")
    val aOnly = (0 until 20).map(i => s"alpha only doc $i content here")
    val bOnly = (0 until 20).map(i => s"beta only doc $i content here")
    val cOnly = (0 until 20).map(i => s"gamma only doc $i content here")
    val docs = (shared ++ aOnly).map(("srcA", _)) ++
      (shared ++ bOnly).map(("srcB", _)) ++ cOnly.map(("srcC", _))
    val df = docs.toDF("source", "text")
    val est = graft.ops.TextAnalysis.corpusOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val jAB = 30.0 / 70.0
    assert(math.abs(est(("srcA", "srcB")) - jAB) <= 0.18,
      s"AB estimate ${est(("srcA", "srcB"))} vs true $jAB")
    assert(est(("srcA", "srcC")) == 0.0 && est(("srcB", "srcC")) == 0.0,
      s"disjoint sources must estimate 0: $est")
  }

  test("d5 embedding near-dup finds planted clusters among noise") {
    // the harness embeddings are isotropic noise (max pair cosine
    // ≈ 0.5), so d5's oracle legitimately returns ZERO rows — this
    // planted fixture proves the detection path detects: 3 clusters
    // of 2 near-identical unit vectors among 40 noise vectors.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val noise = (0 until 40).map(i => (i.toLong, unit()))
    val planted = (0 until 3).flatMap { c =>
      val base = unit()
      (0 until 2).map { j =>
        val jit = base.map(_ + rnd.nextGaussian() * 0.01)
        (100L + c * 10 + j, jit)
      }
    }
    val df = (noise ++ planted).toDF("vec_id", "v")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.sqrt(graft.ops.Ann.dotCol(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v"))).as("nrm"))
    val got = Dedup.embeddingNeardupPairs(df, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 3).map(c => (100L + c * 10, 101L + c * 10)).toSet
    assert(expected.subsetOf(got),
      s"planted pairs missing: ${expected -- got}")
    assert(got.forall { case (a, b) => a >= 100 && b >= 100 },
      s"noise pair reported: ${got.filter(p => p._1 < 100 || p._2 < 100)}")
  }

  test("chunk-bucket recall is exact vs all-pairs hamming <= 3") {
    // 40 docs: 10 base variants × small perturbations
    val rnd = new scala.util.Random(11)
    val words = base.split(" ")
    val docs = docsDf((0 until 40).map { i =>
      val toks = words.toBuffer
      // perturb 0-2 tokens of a shared base, grouped by i % 10
      toks(i % 10) = s"w${i % 10}"
      if (i % 3 == 0) toks(rnd.nextInt(toks.size)) = s"p$i"
      (i.toLong, toks.mkString(" "))
    })
    val sigs = Dedup.simhashSigsOf(docs).cache()
    val viaBuckets = Dedup.simhashPairs(sigs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = sigs.select(col("doc_id").as("da"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("db"), col("sig").as("sb"))
    val exact = a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("h", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("h") <= 3)
      .select("da", "db", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(viaBuckets == exact,
      s"bucket recall mismatch: missing ${exact -- viaBuckets}, extra ${viaBuckets -- exact}")
  }

  test("d12 semdedup: planted near-dup dropped, least-central kept") {
    import spark.implicits._
    // two centroids on orthogonal axes; members near each; one planted
    // near-dup pair in cluster A (ids 10, 11 — 11 is nearer the
    // centroid, so SemDeDup keeps 10 and drops 11); a lone member in
    // cluster B survives untouched.
    def vec(xs: (Int, Double)*): Array[Double] = {
      val v = Array.fill(8)(0.0); xs.foreach { case (i, x) => v(i) = x }; v
    }
    val rows = Seq(
      (10L, vec(0 -> 1.0, 1 -> 0.30)),  // cluster A, farther from cA
      (11L, vec(0 -> 1.0, 1 -> 0.28)),  // near-dup of 10, nearer cA
      (20L, vec(2 -> 1.0)),             // lone cluster-B member
      (30L, vec(0 -> 1.0, 3 -> 0.9)))   // cluster A but dissimilar to 10/11
    val vecs = rows.toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val cents = Seq((1L, vec(0 -> 1.0)), (2L, vec(2 -> 1.0)))
      .toDF("cid", "cv")
      .select(col("cid"), col("cv"),
        sqrt(graft.ops.Ann.dotCol(col("cv"), col("cv"))).as("cn"))
    val got = Dedup.semdedup(vecs, cents, 0.99).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(10L -> true, 11L -> false, 20L -> true, 30L -> true),
      s"keep map wrong: $got")
  }

  test("d13 dup spans: shared 16-token passage flagged in both docs only") {
    val passage = (0 until 16).map(i => s"p$i").mkString(" ")
    def filler(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = docsDf(Seq(
      (1L, s"${filler("a", 10)} $passage"),   // passage at tail
      (2L, s"$passage ${filler("b", 10)}"),   // same passage at head
      (3L, filler("c", 30)),                   // no dup
      (4L, filler("d", 10))))                  // too short for any span
    val got = Dedup.dupSpanStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1/2: 26 tokens → 11 spans each; exactly ONE span (the pure
    // passage window) is shared verbatim between them
    assert(got(1L) == ((11L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((11L, 1L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((15L, 0L)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L)), s"doc4: ${got(4L)}")
  }

  test("d15 prefix filtering is lossless: equals brute force on random sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(173)
    // 40 random sets over a 60-token universe with skewed frequencies
    // (token t appears with prob ~ 1/(1+t/6) — hot head, long tail),
    // plus planted exact and near-exact duplicate pairs
    val base = (0 until 40).map { id =>
      id.toLong -> (0 until 60).filter(t =>
        rnd.nextDouble() < 1.0 / (1 + t / 6.0)).map(t => s"t$t").toSet
    }
    val planted = Seq(
      100L -> base(3)._2,                          // exact dup of set 3
      101L -> (base(5)._2 + "tX"),                 // near dup of set 5
      // threshold-boundary pair: J = 2/(2+4−2) = 0.5 EXACTLY, with
      // sizes at the length-filter edge (max = 2·min) and overlap at
      // the positional bound α = ⌈6/3⌉ = 2 — trips any off-by-one in
      // the PPJoin length/positional pruning
      102L -> Set("tB1", "tB2"),
      103L -> Set("tB1", "tB2", "tB3", "tB4"))
    val all = (base ++ planted).filter(_._2.nonEmpty)
    val toks = all.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("doc_id", "tok")
    val got = ops.Dedup.prefixFilterHalf(toks).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over ALL pairs (no pruning at all)
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      c = (sa & sb).size
      if c * 1.0 / (sa.size + sb.size - c) >= 0.5
    } yield (ia, ib)).toSet
    assert(got == brute,
      s"missed=${brute -- got} extra=${got -- brute}")
    assert(brute.contains((3L, 100L)), "planted exact dup not in truth set")
    assert(brute.contains((5L, 101L)), "planted near dup not in truth set")
  }

  test("d17 downweighting conserves one unit of mass per dup group") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("d17_dup_downweight")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.length == total, "every doc gets a weight row")
    rows.groupBy(_._2).foreach { case (g, ms) =>
      // group size column is consistent and weights are uniform
      assert(ms.forall(_._3 == ms.length), s"group $g size mismatch")
      assert(ms.map(_._4).distinct.length == 1)
      // Σ weights = 1e6 up to |group| floor units — the group counts
      // as ONE document of training mass
      val w = ms.map(_._4).sum
      assert(w <= 1000000L && w > 1000000L - ms.length, s"group $g mass $w")
    }
    // singletons keep full weight — downweighting never taxes uniques
    assert(rows.filter(_._3 == 1L).forall(_._4 == 1000000L))
    Caches.drain()
  }

  // Round-9 d15 staging swap (fused codegen'd ngramHash64 instead of
  // materialized n-gram strings + xxhash64): prove the swap changes
  // only the shingle ID SPACE, not d15's output. prefixFilterHalf
  // accepts either staging (long ids pass through, strings are hashed
  // in), so the two paths must agree pair-for-pair on the verified
  // (ida, idb, c, sa, sb, jac) rows — counts, sizes, and Jaccard
  // micro-units included — as long as neither 64-bit hash collides
  // inside a candidate pair, the same trade both paths already accept.
  test("d15 parity: ngramHash64 staging == string-shingle staging " +
      "on real documents (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def run(tok: Column) = Dedup
      .prefixFilterHalf(docs.select(col("doc_id"),
        explode(array_distinct(tok)).as("tok")))
      .orderBy("ida", "idb")
      .collect().map(_.toSeq).toSeq
    val viaStrings = run(
      graft.functions.wordNgrams(graft.functions.tokens(col("text")), 4))
    val viaFused = run(
      graft.plans.NativeFunctions.ngramHash64(
        graft.functions.tokens(col("text")), 4))
    assert(viaStrings.nonEmpty, "fixture produced no verified pairs")
    assert(viaFused == viaStrings)
    Caches.drain()
  }

  // ngramHash64 unit semantics: window count parity with wordNgrams,
  // the short-array empty convention, and distinctness (a fingerprint
  // that collapsed distinct shingles would silently inflate Jaccard).
  test("ngramHash64: per-row gram counts match wordNgrams; short " +
      "arrays yield empty; distinct shingles get distinct hashes") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f g",
      2L -> "a b c",          // len 3 < n=4 → empty
      3L -> "x x x x x x",    // repeated token: grams repeat too
      4L -> "").toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
      graft.functions.wordNgrams(graft.functions.tokens(col("text")), 4)
        .as("gs"),
      graft.plans.NativeFunctions.ngramHash64(
        graft.functions.tokens(col("text")), 4).as("hs"))
      .collect()
    both.foreach { r =>
      val gs = r.getSeq[String](1)
      val hs = r.getSeq[Long](2)
      assert(hs.length == gs.length, s"doc ${r.getLong(0)} count")
      // identical gram strings hash identically, distinct distinctly
      assert(gs.distinct.length == hs.distinct.length,
        s"doc ${r.getLong(0)} fingerprint cardinality")
      // position-wise: equal grams <=> equal hashes
      for (i <- gs.indices; j <- gs.indices)
        assert((gs(i) == gs(j)) == (hs(i) == hs(j)),
          s"doc ${r.getLong(0)} positions $i/$j")
    }
    assert(both.find(_.getLong(0) == 2L).get.getSeq[Long](2).isEmpty)
    assert(both.find(_.getLong(0) == 4L).get.getSeq[Long](2).isEmpty)
  }
}
