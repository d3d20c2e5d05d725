package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable KMV buffer: the ≤ k smallest DISTINCT hash values seen,
  * kept sorted ascending. */
final case class KmvBuf(hashes: Seq[Long])

/** KMV summary: how many hashes were kept, the kth-minimum, and the
  * distinct-count estimate (k−1)/kth_min_fraction. */
final case class KmvSummary(n_kept: Int, kth_hash: Long, est_distinct: Double)

/** K-minimum-values cardinality sketch as a typed
  * [[org.apache.spark.sql.expressions.Aggregator]] — the one-pass,
  * partial-aggregation form of the x10 window query. `reduce` folds a
  * row's hash into the buffer only when it beats the current kth
  * minimum; `merge` unions two buffers and re-trims to k. Both are
  * commutative/associative over SETS of hashes, so Spark's map-side
  * combine applies: each task ships at most k longs per group, never a
  * vocabulary. This is the 100 TB path for distinct counting — no
  * window, no per-group row shuffle, state O(k).
  *
  * The estimator and hash domain (48-bit md5 prefix, max 2^48) match
  * x10_kmv_distinct exactly, so the same DuckDB oracle verifies both.
  *
  * Registered as a UDAF via [[NamedAggregators.kmv]] (usable as a
  * Column in any groupBy) — the §7.3 "custom typed Aggregator" surface.
  */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, KmvBuf, KmvSummary] {

  val HashDomain: Double = 281474976710656.0 // 2^48, the md5-prefix domain

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf =
    if (b.hashes.length >= k && h >= b.hashes.last) b
    else {
      val i = insertionPoint(b.hashes, h)
      if (i < b.hashes.length && b.hashes(i) == h) b // already present
      else KmvBuf(((b.hashes.take(i) :+ h) ++ b.hashes.drop(i)).take(k))
    }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hashes ++ b.hashes).distinct.sorted.take(k))

  override def finish(b: KmvBuf): KmvSummary = {
    val n = b.hashes.length
    if (n == 0) KmvSummary(0, 0L, 0.0)
    else if (n < k) KmvSummary(n, b.hashes.last, n.toDouble)
    else KmvSummary(n, b.hashes.last,
      (n - 1) * HashDomain / b.hashes.last)
  }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvSummary] =
    Encoders.product[KmvSummary]

  private def insertionPoint(xs: Seq[Long], h: Long): Int = {
    // binary search over the sorted buffer (Vector: O(log n) access)
    var lo = 0
    var hi = xs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Column-facing registrations of the typed aggregators. */
object NamedAggregators {
  /** KMV distinct-count sketch over a LongType hash column. */
  def kmv(hashCol: Column, k: Int = 256): Column =
    udaf(new KmvAggregator(k)).apply(hashCol)
}
