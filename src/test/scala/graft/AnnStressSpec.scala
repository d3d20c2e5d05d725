package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale rehearsal for the IVF ANN path beyond the harness SFs (sf0.1
  * tops out at 5k vectors): 100k 16-dim vectors in 1000 planted
  * clusters (100 near-identical members each), generated DISTRIBUTED
  * from md5 arithmetic, probed through the production `Ann.ivfTopK`
  * against a 250-cell md5-seed centroid frame. Locks that (a) probe-2
  * IVF retrieval still surfaces same-cluster mates when cells hold
  * ~400 vectors, and (b) the candidate set stays cell-bounded — an
  * all-pairs regression at 100k vectors (10^10 pairs) would blow the
  * wall bound by hours, not seconds.
  */
class AnnStressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("ivfTopK at 100k vectors: same-cluster mates dominate, bounded time") {
    val n = 100000L
    // coordinate j of vector id: cluster base (shared by id div 100)
    // plus 0.05-scaled per-vector jitter, both md5-derived uniforms
    def u(seed: String): String =
      s"(cast(conv(substr(md5($seed), 1, 8), 16, 10) as bigint) % 2000)" +
        " / 1000.0 - 1.0"
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> cast(" +
          s"${u("concat('c', id div 100, '_', j)")} + " +
          s"0.05 * (${u("concat('v', id, '_', j)")}) as double))").as("v"))
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
      .transform(graft.Caches.track)
    val cents = vecs.orderBy(md5(col("vec_id").cast("string"))).limit(250)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    val t0 = System.nanoTime()
    val top = graft.ops.Ann.ivfTopK(vecs, cents)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(top.length > 10000, s"expected ~15k result rows, ${top.length}")
    val sameCluster = top.count { case (q, nb) => q / 100 == nb / 100 }
    val frac = sameCluster.toDouble / top.length
    assert(frac >= 0.95,
      s"planted mates must dominate IVF top-3: $frac")
    assert(secs < 180, s"IVF path took $secs s at 100k vectors")
    Caches.drain()
  }
}
