package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale rehearsal for the LSH dedup path beyond the harness SFs
  * (sf0.1 tops out at 5k documents): a seeded 30k-doc corpus with 300
  * planted near-duplicate pairs, generated DISTRIBUTED (spark.range →
  * deterministic md5-derived pseudo-words; the corpus never exists on
  * the driver), pushed through the exact production machinery d3/m3
  * use (`Dedup.lshPairsOf`: one-pass 64-lane native MinHash, 16×4
  * bands, in-bucket candidate generation, exact-Jaccard verify).
  *
  * What this locks that sf0.1 cannot: at 30k docs an all-pairs scan is
  * 450M comparisons — if a refactor ever regressed the candidate
  * generation to quadratic, the wall-clock bound here fails long
  * before the harness queries would notice.
  */
class DedupStressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("lshPairsOf at 30k docs: planted pairs found exactly, bounded time") {
    val n = 30000L
    val planted = 300
    // base doc i = 40 pseudo-words keyed (i, pos): distinct docs share
    // no trigram; dup doc j >= n copies the first 39 words of base
    // (j-n)*100 and appends a fresh tail word → jaccard 37/39 ≈ 0.95
    def gen(seedExpr: String, len: Int): String =
      s"array_join(transform(sequence(0, ${len - 1}), " +
        s"p -> concat('w', conv(substr(md5(concat(cast(($seedExpr) as " +
        s"string), '#', cast(p as string))), 1, 8), 16, 10))), ' ')"
    val corpus = spark.range(n + planted)
      .select(col("id").as("doc_id"),
        expr(s"CASE WHEN id < $n THEN ${gen("id", 40)} " +
          s"ELSE concat(${gen(s"(id - $n) * 100", 39)}, " +
          s"' qq', cast(id as string)) END").as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.lshPairsOf(corpus, 0.5)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    val expected = (0 until planted)
      .map(i => (i * 100L, n + i)).toSet
    assert(pairs == expected,
      s"missed ${(expected -- pairs).size}, spurious ${(pairs -- expected).size}")
    // generous CI bound — the all-pairs regression this guards against
    // is minutes, not seconds
    assert(secs < 120, s"LSH path took $secs s at 30k docs")
    Caches.drain()
  }

  test("shardShuffle at 100k docs: near-token-balanced shards, bounded time") {
    // doc i = 5 + (md5-derived 0..10) tokens — ~1M tokens total; with
    // B = 4096 every shard's mass must sit within max_doclen of the
    // budget (doc-atomic packing can overshoot by at most one doc)
    val n = 100000L
    val corpus = spark.range(n)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 4 + cast(conv(" +
          "substr(md5(cast(id as string)), 1, 4), 16, 10) as int) % 11)," +
          " p -> 't'), ' ')").as("text"))
    val t0 = System.nanoTime()
    val m = graft.ops.TextAnalysis.shardShuffle(corpus, 4096L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val secs = (System.nanoTime() - t0) / 1e9
    val total = m.map(_._3).sum
    assert(m.map(_._2).sum == n && total > 900000L,
      s"docs or tokens lost: ${m.map(_._2).sum} docs, $total toks")
    // shard ids are dense 0..k; every full shard within one doc of B
    assert(m.map(_._1).toSeq == (0L until m.length).toSeq)
    val full = m.init
    assert(full.forall(s => s._3 > 4096 - 15 && s._3 < 4096 + 15),
      s"unbalanced shard: ${full.filterNot(s => s._3 > 4081 && s._3 < 4111).take(3).toSeq}")
    assert(secs < 60, s"shard shuffle took $secs s at 100k docs")
  }
}
