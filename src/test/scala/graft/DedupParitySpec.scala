package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parity for the round-9 shingle-staging change: the
  * dedup family now stages 64-bit `ngramHash64` fingerprints where it
  * used to stage n-gram STRINGS. These properties pin, over ScalaCheck-
  * generated corpora (fixed seeds — Spark-backed properties must not
  * flake), exactly what the change claimed:
  *
  *  1. fingerprints are IDENTITY-faithful: per doc, the distinct
  *     fingerprint count equals the distinct string-gram count (no
  *     within-doc collisions on realistic vocabularies);
  *  2. the count-based overlap family (d2 Jaccard, d7 containment) is
  *     staging-INVARIANT: string-staged and hash-staged inputs yield
  *     the same pair sets with the same similarity values — these
  *     operators only ever consume shingle identity;
  *  3. banded-minhash LSH (d3/m2 family) keeps its contract under the
  *     hashed staging: perfect precision (every reported pair's exact
  *     Jaccard ≥ threshold — true by construction, verified anyway)
  *     and full recall on HIGH-similarity planted pairs (J ≥ 0.8,
  *     where 16-band/4-row collision probability is ≥ 0.9998 per pair — deterministic under the fixed seeds; at the
  *     0.5 threshold itself recall is statistical by design and NOT
  *     asserted).
  *
  * The generators build corpora from a small shared vocabulary (so
  * cross-doc gram overlap actually occurs) and plant near-dup pairs by
  * copying a base doc with a single token substitution.
  */
class DedupParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val vocabGen: Gen[Vector[String]] =
    Gen.chooseNum(25, 60).flatMap { n =>
      Gen.containerOfN[Set, String](n,
        Gen.stringOfN(6, Gen.alphaLowerChar)).map(_.toVector)
    }

  /** (docs, plantedPairs): docs as (id, text); planted near-dup pairs
    * are (base, copy) with ONE token of ≥ 20 substituted → word-trigram
    * Jaccard ≥ (17/23 ≈ 0.74) … in practice ≥ 0.85 for mid-doc edits;
    * the property filters on the measured exact Jaccard anyway. */
  private def corpusGen(vocab: Vector[String])
      : Gen[(Seq[(Long, String)], Seq[(Long, Long)])] = for {
    nDocs <- Gen.chooseNum(12, 24)
    lens <- Gen.listOfN(nDocs, Gen.chooseNum(20, 30))
    toks <- Gen.sequence[Seq[Seq[String]], Seq[String]](
      lens.map(l => Gen.listOfN(l, Gen.oneOf(vocab)).map(_.toSeq)))
    nDup <- Gen.chooseNum(2, 4)
    dupOf <- Gen.listOfN(nDup, Gen.chooseNum(0, nDocs - 1))
    subAt <- Gen.listOfN(nDup, Gen.chooseNum(5, 15))
    subTok <- Gen.listOfN(nDup, Gen.oneOf(vocab))
  } yield {
    val baseDocs = toks.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.mkString(" "))
    }
    val dups = dupOf.zip(subAt.zip(subTok)).zipWithIndex.map {
      case ((src, (at, tok)), j) =>
        val ts = toks(src).toVector
        val edited = ts.updated(at % ts.size, tok)
        ((nDocs + j).toLong, edited.mkString(" "), src.toLong)
    }
    (baseDocs ++ dups.map(d => (d._1, d._2)),
      dups.map(d => (math.min(d._3, d._1), math.max(d._3, d._1))))
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** String-staged twin of Dedup.shinglesOf (the pre-round-9 form). */
  private def stringShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(graft.functions.wordNgrams(col("toks"), 3)).as("sh"))

  private def hashedShingles(docs: DataFrame): DataFrame =
    Dedup.shinglesOf(docs)

  private val seeds = Seq(11L, 23L, 47L, 83L)

  test("ngramHash64 fingerprints are identity-faithful per doc " +
    "(distinct counts match the string grams)") {
    seeds.foreach { seed =>
      val (rows, _) = sample(corpusGen(sample(vocabGen, seed)), seed + 1)
      val docs = docsDf(rows)
      val h = hashedShingles(docs)
        .select(col("doc_id"), size(col("sh")).as("n"))
      val s = stringShingles(docs)
        .select(col("doc_id"), size(col("sh")).as("n"))
      val diff = h.join(s, Seq("doc_id"))
        .filter(h("n") =!= s("n")).count()
      assert(diff == 0L, s"seed=$seed: per-doc distinct-gram counts " +
        "diverge between fingerprint and string staging")
    }
  }

  test("d2 Jaccard pairs are staging-invariant (same pairs, same values)") {
    seeds.foreach { seed =>
      val (rows, _) = sample(corpusGen(sample(vocabGen, seed)), seed + 1)
      val docs = docsDf(rows)
      def pairs(sh: DataFrame): Set[(Long, Long, Double)] =
        Dedup.ngramJaccardPairsOf(sh, 0.3, None).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ph = pairs(hashedShingles(docs))
      val ps = pairs(stringShingles(docs))
      assert(ph == ps, s"seed=$seed: d2 pair sets diverge: " +
        s"hashed-only=${ph -- ps}, string-only=${ps -- ph}")
      assert(ph.nonEmpty, s"seed=$seed: degenerate fixture (no pairs)")
    }
  }

  test("d7 containment pairs are staging-invariant") {
    seeds.foreach { seed =>
      val (rows, _) = sample(corpusGen(sample(vocabGen, seed)), seed + 1)
      val docs = docsDf(rows)
      def pairs(sh: DataFrame): Set[(Long, Long, Double, Double)] =
        Dedup.containmentPairsOf(sh, 0.5, None).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3))).toSet
      val ph = pairs(hashedShingles(docs))
      val ps = pairs(stringShingles(docs))
      assert(ph == ps, s"seed=$seed: d7 pair sets diverge")
    }
  }

  test("LSH keeps perfect precision and high-sim recall under the " +
    "hashed staging") {
    seeds.foreach { seed =>
      val (rows, planted) = sample(corpusGen(sample(vocabGen, seed)), seed + 1)
      val docs = docsDf(rows)
      val got = Dedup.lshPairsOf(docs, 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // precision: every reported pair is exact-verified ≥ threshold
      got.foreach { case (da, db, jac) =>
        assert(jac >= 0.5, s"seed=$seed: pair ($da,$db) below threshold")
      }
      // recall on high-sim planted pairs: compute each planted pair's
      // exact string-gram Jaccard; if ≥ 0.8, LSH must report it
      val exact = Dedup.ngramJaccardPairsOf(stringShingles(docs), 0.0, None)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val gotPairs = got.map(p => (p._1, p._2)).toSet
      planted.filter(p => exact.getOrElse(p, 0.0) >= 0.8).foreach { p =>
        assert(gotPairs.contains(p),
          s"seed=$seed: high-sim planted pair $p " +
            s"(J=${exact.getOrElse(p, 0.0)}) missed by LSH")
      }
    }
  }
}
