package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property spec for the n5 Lloyd step beyond its oracle rows: the
  * emitted sufficient statistics must (a) partition the corpus, and
  * (b) yield centroids that IMPROVE the clustering objective — one
  * Lloyd iteration never hurts mean assigned similarity (quantization
  * at 1e-3 is far below the improvement scale). */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("n5 stats partition the corpus; derived centroids improve the objective") {
    val out = SparkEntry.queries("n5_kmeans_step")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val byCid = out.groupBy(_._1)
    // every non-empty cluster reports all 64 positions with one
    // consistent n_vecs
    for ((cid, rows) <- byCid) {
      assert(rows.map(_._2).sorted.toSeq == (0L until 64L),
        s"cluster $cid must report every position once")
      assert(rows.map(_._4).distinct.size == 1,
        s"cluster $cid must report one n_vecs")
    }
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(byCid.map(_._2.head._4).sum == nVecs,
      "cluster sizes must partition the corpus")

    // derive next centroids from the quantized sums and compare the
    // objective (mean best-assignment cosine) against the seed set
    val cents2 = byCid.toSeq.map { case (cid, rows) =>
      val n = rows.head._4.toDouble
      cid -> rows.sortBy(_._2).map(_._3 / 1000.0 / n).toArray
    }
    def meanBestSim(cents: Seq[(Long, Array[Double])]): Double = {
      val vecs = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
      }
      vecs.map(v => cents.map(c => cos(v, c._2)).max).sum / vecs.length
    }
    val seeds = Ann0Seeds()
    val before = meanBestSim(seeds)
    val after = meanBestSim(cents2)
    assert(after >= before - 1e-6,
      f"Lloyd step must not regress the objective: $before%.4f -> $after%.4f")
    assert(after > before + 1e-4,
      f"on random data one step should strictly improve: $before%.4f -> $after%.4f")
  }

  /** The same exactly-K md5-ranked seed set n3/n5 use. */
  private def Ann0Seeds(): Seq[(Long, Array[Double])] =
    graft.ops.Ann.normedVecs(spark, sfDir)
      .orderBy(md5(col("vec_id").cast("string"))).limit(graft.ops.Ann.IvfK)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
}
