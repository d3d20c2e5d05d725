package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared across modules.
  *
  * Everything here stays in `org.apache.spark.sql.functions` territory
  * (codegen'd, Catalyst-visible) — no UDFs in hot paths. Reference
  * semantics covered: Jaccard over sets (reference `Src/utils.py:8-13`),
  * token rewriting via higher-order functions (reference
  * `Src/processes.py:158-186`), base-26 cluster ids (reference
  * `Src/servers.py:151-157`).
  */
package object functions {

  /** Whitespace tokenization after trim; empty string → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Jaccard similarity of two array columns treated as sets ∈ [0,1].
    * `1 - jaccardSim` is the Jaccard distance MinHashLSH approximates. */
  def jaccardSim(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0d, lit(1.0)).otherwise(inter / union)
  }

  def jaccardDist(a: Column, b: Column): Column = lit(1.0) - jaccardSim(a, b)

  /** Morton/z-order interleave of the low `bits` bits of two long
    * columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Sorting (or range-partitioning) by the z-value clusters
    * rows so per-file min/max statistics are tight on BOTH dimensions
    * — the layout that makes scan-time skipping work for
    * two-predicate workloads where sorting by either single column
    * only helps that column. Pure bit arithmetic → whole-stage
    * codegen; no UDF. */
  def zorderBits(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  /** The d count-min cells `(r, c)` for a token: row r hashes the
    * token to column c = 48-bit md5 prefix of "r#tok" mod w —
    * portable arithmetic (x10's trick) so DuckDB lands every token in
    * the identical cell. Shared by the batch sketch (x14_countmin)
    * and the streaming one (`StreamOps.countMin`), which is what makes
    * their matrices comparable cell-for-cell. */
  def cmsCells(tok: Column, d: Int = 4, w: Int = 512): Column =
    array((0 until d).map { i =>
      struct(lit(i).as("r"),
        (conv(substring(md5(concat_ws("#", lit(i.toString), tok)), 1, 12),
          16, 10).cast("long") % w).as("c"))
    }: _*)

  /** The same interleave as ANSI SQL text (for DuckDB oracles). */
  def zorderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Cosine similarity of two equal-length numeric array columns.
    * Pure `zip_with` + `aggregate` — whole-stage-codegen friendly, no UDF. */
  def cosineSim(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === 0d || nb === 0d, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** L2 (Euclidean) distance of two numeric array columns. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (p, q) => (p - q) * (p - q)),
      lit(0.0d), (acc, v) => acc + v))

  /** Base-26 identifier A..Z, AA..ZZ for a 0-based rank column (rank < 702).
    * Column-level port of the reference's cluster-id scheme
    * (`Src/servers.py:151-157`); pure expressions so it stays distributed. */
  def base26Id(rank0: Column): Column = {
    val r = rank0.cast("int")
    when(r < 26, chr(r + 65))
      .otherwise(concat(chr((r / 26) + 64), chr((r % 26) + 65)))
  }

  /** Sliding word n-grams over a token-array column: `n` consecutive tokens
    * joined by a single space. Arrays shorter than n → empty array. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Token-level Levenshtein (unit-cost edit distance over string tokens).
    *
    * Intended semantics of the reference's `process_string_edit_distance`
    * (`Src/utils.py:32-71`, the commented-out correct recursion). The active
    * DP there (`Src/utils.py:74-110`) has an off-by-one that never fills the
    * last row/column and returns 0 for every pair — we implement the full DP
    * instead and document the divergence (SURVEY.md §2.9).
    */
  def tokenLevenshtein(s: IndexedSeq[String], t: IndexedSeq[String]): Int = {
    if (s.isEmpty) return t.length
    if (t.isEmpty) return s.length
    var prev = Array.tabulate(t.length + 1)(identity)
    var cur = new Array[Int](t.length + 1)
    var i = 1
    while (i <= s.length) {
      cur(0) = i
      var j = 1
      while (j <= t.length) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(t.length)
  }

  /** [[tokenLevenshteinBounded]] over int-interned token arrays — same
    * banded DP, int equality per cell. Used by the DBSCAN cell scans
    * where tokens are interned once per cell. */
  def intLevenshteinBounded(s: Array[Int], t: Array[Int], maxDist: Int): Int = {
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > maxDist) return maxDist + 1
    if (n == 0) return m
    if (m == 0) return n
    val Big = maxDist + 1
    var prev = Array.tabulate(m + 1)(j => if (j <= maxDist) j else Big)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - maxDist)
      val hi = math.min(m, i + maxDist)
      java.util.Arrays.fill(cur, Big)
      cur(0) = if (i <= maxDist) i else Big
      var rowMin = cur(0)
      var j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        val v = math.min(math.min(
          if (cur(j - 1) < Big) cur(j - 1) + 1 else Big,
          if (prev(j) < Big) prev(j) + 1 else Big),
          if (prev(j - 1) < Big) prev(j - 1) + cost else Big)
        cur(j) = math.min(v, Big)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin >= Big) return Big
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  /** Banded token Levenshtein with early exit: returns the exact
    * distance when it is <= maxDist, otherwise any value > maxDist.
    * Classic Ukkonen band of width 2·maxDist+1 — O(maxDist · |s|)
    * instead of O(|s|·|t|); the length-difference lower bound short-
    * circuits without touching the DP at all. */
  def tokenLevenshteinBounded(s: IndexedSeq[String], t: IndexedSeq[String],
      maxDist: Int): Int = {
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > maxDist) return maxDist + 1
    if (n == 0) return m
    if (m == 0) return n
    val Big = maxDist + 1
    var prev = Array.tabulate(m + 1)(j => if (j <= maxDist) j else Big)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - maxDist)
      val hi = math.min(m, i + maxDist)
      java.util.Arrays.fill(cur, Big)
      cur(0) = if (i <= maxDist) i else Big
      var rowMin = cur(0)
      var j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        val v = math.min(math.min(
          if (cur(j - 1) < Big) cur(j - 1) + 1 else Big,
          if (prev(j) < Big) prev(j) + 1 else Big),
          if (prev(j - 1) < Big) prev(j - 1) + cost else Big)
        cur(j) = math.min(v, Big)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin >= Big) return Big // whole band exceeded maxDist
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }
}
