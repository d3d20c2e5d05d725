package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Properties of the ANN family. The harness embeddings are isotropic
  * noise (measured: same-label and cross-label pairs both average
  * cosine ≈ 0.00), so absolute recall against "exact top-k of noise"
  * is not a meaningful property of the INDEX — instead each test pins
  * what the index actually promises: LSH collision recall on PLANTED
  * near-duplicate structure, SQ8 rank fidelity to exact L2, exact
  * rerank consistency, and brute-force exactness. */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("n1 brute force is exact by construction") {
    val vecs = graft.ops.Ann.normedVecs(spark, sfDir)
    val probes = vecs.orderBy(md5(col("vec_id").cast("string")))
      .limit(graft.ops.Ann.QueryK)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val ex = vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score", graft.ops.Ann.simFromNorms(col("qv"), col("v"),
        col("qn"), col("nrm")))
      .select(col("qid"), col("vec_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val approx = q("n1_knn_brute").select("qid", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    val per = approx.map { case (qid, ns) =>
      val all = ex.collect { case ((q2, _), s) if q2 == qid => s }.toSeq
      val kth = all.sorted.reverse.apply(4)
      ns.count(n => ex((qid, n)) >= kth - 1e-3).toDouble / ns.size
    }
    assert(per.sum / per.size == 1.0, s"brute-force recall != 1.0")
  }

  test("LSH buckets catch every planted near-duplicate pair") {
    // 60 isotropic noise vectors + 5 clusters of 3 near-identical
    // vectors (cosine >= 0.99): the structure LSH exists to find.
    // Every planted pair must share at least one of the 8 table
    // signatures — that collision is the whole recall mechanism.
    import spark.implicits._
    val rnd = new Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(graft.ops.Ann.Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val noise = (0 until 60).map(i => (i.toLong, unit()))
    val planted = (0 until 5).flatMap { c =>
      val base = unit()
      (0 until 3).map { j =>
        val jit = base.map(_ + rnd.nextGaussian() * 0.02)
        val n = math.sqrt(jit.map(x => x * x).sum)
        (1000L + c * 10 + j, jit.map(_ / n))
      }
    }
    val df = (noise ++ planted).toDF("vec_id", "v")
    val sigs = df.select(col("vec_id"),
        explode(graft.ops.Ann.tableSigArray(col("v"))).as("s"))
      .select(col("vec_id"), col("s.t"), col("s.sig")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val plantedPairs = for {
      c <- 0 until 5; a <- 0 until 3; b <- (a + 1) until 3
    } yield (1000L + c * 10 + a, 1000L + c * 10 + b)
    val missed = plantedPairs.filterNot { case (a, b) =>
      sigs(a).intersect(sigs(b)).nonEmpty
    }
    assert(missed.isEmpty, s"planted pairs with no shared bucket: $missed")
  }

  test("SQ8 quantized distances rank-correlate >= 0.95 with exact L2") {
    val vecs = graft.ops.Ann.normedVecs(spark, sfDir)
    val probes = vecs.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("l2",
        graft.ops.Ann.dotCol(col("qv"), col("qv")) +
          graft.ops.Ann.dotCol(col("v"), col("v")) -
          lit(2.0) * graft.ops.Ann.dotCol(col("qv"), col("v")))
      .select(col("qid"), col("vec_id"), col("l2")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // quantized distances for ALL probe pairs through the library's
    // own quantizer — Spearman over only the reported top-5s would
    // suffer restriction of range (near-tied best distances reorder
    // under quantization noise; measured 0.83 on that sample alone)
    val codes = graft.ops.Ann.sq8Quantized(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val approx = exact.keys.toSeq.map { case (qid, nbr) =>
      val (a, b) = (codes(qid), codes(nbr))
      val qd = a.zip(b).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum
      ((qid, nbr), qd)
    }
    def ranks(xs: Seq[Double]): Seq[Double] = {
      val idx = xs.zipWithIndex.sortBy(_._1).map(_._2)
      val r = new Array[Double](xs.size)
      idx.zipWithIndex.foreach { case (orig, rk) => r(orig) = rk.toDouble }
      r.toSeq
    }
    val (qs, es) = approx.map { case (k, qd) => (qd, exact(k)) }.unzip
    val (rq, re) = (ranks(qs.toSeq), ranks(es.toSeq))
    val n = rq.size
    val (mq, me) = (rq.sum / n, re.sum / n)
    val cov = rq.zip(re).map { case (a, b) => (a - mq) * (b - me) }.sum
    val sd = math.sqrt(rq.map(a => (a - mq) * (a - mq)).sum *
      re.map(b => (b - me) * (b - me)).sum)
    val spearman = cov / sd
    assert(spearman >= 0.95, s"SQ8 rank correlation $spearman below 0.95")
  }

  test("n2/n3 reported similarities equal the exact rerank values") {
    val vecs = graft.ops.Ann.normedVecs(spark, sfDir)
    val probes = vecs.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val exact = vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(graft.ops.Ann.simFromNorms(col("qv"),
        col("v"), col("qn"), col("nrm")), 4))
      .select(col("qid"), col("vec_id"), col("sim")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (name <- Seq("n2_ann_lsh", "n3_ann_ivf")) {
      q(name).select("qid", "nbr", "sim").collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(exact(key) == r.getDouble(2),
          s"$name reported sim for $key diverges from exact rerank")
      }
    }
  }

  test("trained IVF (n7) beats seeded IVF recall on planted clusters") {
    // 240 noise vectors + 8 loose clusters of 8 (jitter wide enough
    // that members split across seed cells): Lloyd-trained centroids
    // converge to the cluster means, so the SAME 2-probe budget
    // co-locates cluster mates that the md5 seed index scatters.
    // Planted ids are multiples of 20, so every planted vector is a
    // probe of ivfTopK; recall@3 = fraction of a probe's top-3 that
    // are its 7 cluster mates.
    import spark.implicits._
    val rnd = new Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(graft.ops.Ann.Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val noise = (0 until 240).map(i => (i * 20L + 1, unit()))
    val clusterOf = scala.collection.mutable.Map.empty[Long, Int]
    val planted = (0 until 8).flatMap { c =>
      val base = unit()
      (0 until 8).map { j =>
        val jit = base.map(_ + rnd.nextGaussian() * 0.12)
        val n = math.sqrt(jit.map(x => x * x).sum)
        val id = 100000L + c * 200 + j * 20 // % 20 == 0 → probe
        clusterOf(id) = c
        (id, jit.map(_ / n))
      }
    }
    val vecs = (noise ++ planted).toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val seed = graft.ops.Ann.seedCentroids(vecs)
    val trained = graft.ops.Ann.lloydStep(vecs,
      graft.ops.Ann.lloydStep(vecs, seed))
    def recallAt3(cents: org.apache.spark.sql.DataFrame): Double = {
      val byQ = graft.ops.Ann.ivfTopK(vecs, cents)
        .select("qid", "nbr").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .filter(p => clusterOf.contains(p._1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val scores = clusterOf.keys.toSeq.map { id =>
        val mates = byQ.getOrElse(id, Set.empty)
          .count(n => clusterOf.get(n).contains(clusterOf(id)))
        mates / 3.0
      }
      scores.sum / scores.size
    }
    val (rSeed, rTrained) = (recallAt3(seed), recallAt3(trained))
    info(f"recall@3 seeded=$rSeed%.3f trained=$rTrained%.3f")
    assert(rTrained > rSeed,
      f"training did not improve recall: seeded=$rSeed%.3f trained=$rTrained%.3f")
    assert(rTrained >= 0.9,
      f"trained recall $rTrained%.3f below 0.9 on planted clusters")
  }

  test("n8 PQ ADC ranks cluster mates first on planted clusters") {
    // 8 tight clusters of 8: cluster mates share the full 8-sub-space
    // code tuple (jitter far below codeword spacing), so a query's ADC
    // distance to a mate equals its own quantization error — the
    // minimum possible — and every top-5 slot should be a mate.
    import spark.implicits._
    val rnd = new Random(13)
    def unit(): Array[Double] = {
      val v = Array.fill(graft.ops.Ann.Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val clusterOf = scala.collection.mutable.Map.empty[Long, Int]
    val planted = (0 until 8).flatMap { c =>
      val base = unit()
      (0 until 8).map { j =>
        val jit = base.map(_ + rnd.nextGaussian() * 0.02)
        val n = math.sqrt(jit.map(x => x * x).sum)
        val id = c * 100L + j
        clusterOf(id) = c
        (id, jit.map(_ / n))
      }
    }
    val vecs = planted.toDF("vec_id", "v")
      .select(col("vec_id"), col("v"),
        sqrt(graft.ops.Ann.dotCol(col("v"), col("v"))).as("nrm"))
    val top = graft.ops.Ann.pqTopK(vecs, 5)
      .select("qid", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty, "PQ returned no neighbors")
    val mateFrac = top.count { case (q2, n) =>
      clusterOf(q2) == clusterOf(n)
    }.toDouble / top.size
    assert(mateFrac >= 0.9,
      f"PQ top-5 mate fraction $mateFrac%.3f below 0.9")
  }

  test("powerIter: recovers a planted dominant direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dims = 16
    // anisotropic cloud: dimension 3 carries 10x the variance of the
    // rest — the dominant singular direction is (close to) e_3
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(dims)(j =>
        if (j == 3) rnd.nextGaussian() * 10.0
        else rnd.nextGaussian() * 1.0))
    }.toDF("vec_id", "v")
    val dir = graft.ops.Ann.powerIter(vecs, dims, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val domAbs = math.abs(dir(3L))
    assert(domAbs == 1000000L,
      s"planted dimension must be the max component: $dir")
    (0 until dims).filter(_ != 3).foreach { j =>
      assert(math.abs(dir(j.toLong)) < 400000L,
        s"off-direction dim $j too large: ${dir(j.toLong)}")
    }
  }

  test("n11 hard negatives: planted impostor is found and flagged, easy negatives are not") {
    import spark.implicits._
    // label 0 clusters near e_0; label 1 has ONE impostor near e_0
    // (the hard negative) and the rest near the orthogonal e_1 (easy).
    // Margin 0.05: the impostor sits within it, the orthogonals don't.
    def unit(main: Int, eps: Double, at: Int): Array[Double] = {
      val v = Array.fill(4)(0.0); v(main) = 1.0; v(at) = eps
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows =
      (0L until 6L).map(i => (i, unit(0, 0.05 * i, 2), 0)) ++   // label 0 cloud
      Seq((6L, unit(0, 0.10, 3), 1)) ++                          // impostor
      (7L until 12L).map(i => (i, unit(1, 0.05 * (i - 7), 2), 1)) // easy negs
    val out = graft.ops.Ann.hardNegatives(
      rows.toDF("vec_id", "v", "label"), queryK = 12, k = 3,
      marginMicro = 50000L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(5)))
    // for every label-0 query the top negative is the impostor, hard
    val label0 = (0L until 6L).toSet
    val top = out.groupBy(_._1).map { case (q2, vs) => q2 -> vs.head }
    label0.foreach { q2 =>
      assert(top(q2)._2 == 6L, s"query $q2 top negative: ${top(q2)}")
      assert(top(q2)._3, s"impostor must be hard for query $q2")
    }
    // orthogonal negatives are never hard for label-0 queries
    out.filter(o => label0(o._1) && o._2 != 6L)
      .foreach(o => assert(!o._3, s"easy negative flagged hard: $o"))
  }

  test("n12 stored-index probe == in-memory trained-IVF probe") {
    // the persisted-index contract: writing the trained centroids and
    // cell-assigned vectors to parquet and probing THE STORED FRAMES
    // yields row-identical results to n7's in-memory ivfTopK (doubles
    // roundtrip parquet bit-exactly; same rounding and tie-breaks).
    val vecs = graft.Caches.track(graft.ops.Ann.normedVecs(spark, sfDir))
    val trained = graft.ops.Ann.lloydStep(vecs,
      graft.ops.Ann.lloydStep(vecs, graft.ops.Ann.seedCentroids(vecs)))
    val inMem = graft.ops.Ann.ivfTopK(vecs, trained).collect().toSeq
    val stored = q("n12_stored_ivf").collect().toSeq
    assert(stored == inMem,
      s"stored probe diverges: ${stored.size} vs ${inMem.size} rows")
  }

  test("n12 artifacts survive the parquet roundtrip: centroids, cells, SQ8 codes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfidx_spec_").toString
    val vecs = graft.Caches.track(graft.ops.Ann.normedVecs(spark, sfDir))
    val trained = graft.ops.Ann.lloydStep(vecs,
      graft.ops.Ann.lloydStep(vecs, graft.ops.Ann.seedCentroids(vecs)))
    trained.write.mode("overwrite").parquet(s"$dir/centroids")
    val cents = spark.read.parquet(s"$dir/centroids")
    graft.ops.Ann.assignCells(vecs, cents)
      .join(graft.ops.Ann.sq8Quantized(spark, sfDir), Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"), col("q"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$dir/cells")
    // centroid frame: bit-identical after the roundtrip
    val want = trained.orderBy("cid").collect().toSeq
    val got = cents.orderBy("cid").collect().toSeq
    assert(got == want, "centroids changed across the parquet roundtrip")
    // cells: every corpus vector appears exactly once, and its stored
    // SQ8 code equals a fresh quantization (signature stability — the
    // d16 property the n-family index needs for cross-JVM probes)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == vecs.count(), "cells lost/duplicated vectors")
    val mismatch = cells.select(col("vec_id"), col("q").as("q_stored"))
      .join(graft.ops.Ann.sq8Quantized(spark, sfDir), Seq("vec_id"))
      .filter(col("q_stored") =!= col("q")).count()
    assert(mismatch == 0, s"$mismatch stored SQ8 codes drifted")
  }
}
