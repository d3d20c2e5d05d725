package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-layer specs (SURVEY.md §5.4): MinHashLSH join recall vs an
  * exact crossJoin+Jaccard oracle on a planted fixture; neighbor-list
  * clustering semantics; token rewrite; cluster ids. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 40 base docs + near-dup copies (one token changed) + exact dups. */
  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8")
    val base = (0L until 40L).map { i =>
      (i, IndexedSeq.fill(12)(vocab(rnd.nextInt(vocab.size))))
    }
    val nearDups = base.take(10).map { case (i, toks) =>
      (i + 100L, toks.updated(3, "zz"))
    }
    val exactDups = base.slice(10, 15).map { case (i, toks) => (i + 200L, toks) }
    (base ++ nearDups ++ exactDups)
      .map { case (i, toks) => (i, toks.distinct.toSeq) }
      .toDF("id", "toks")
  }

  test("minhashJoin recall >= 0.9 vs exact Jaccard oracle at dist <= 0.4") {
    val df = fixture.cache()
    val lsh = Similarity.minhashJoin(df, "id", "toks", 0.4)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = df.select(col("id").as("ida"), col("toks").as("ta"))
    val b = df.select(col("id").as("idb"), col("toks").as("tb"))
    val exact = a.crossJoin(b).filter(col("ida") < col("idb"))
      .filter(graft.functions.jaccardDist(col("ta"), col("tb")) <= 0.4)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must contain similar pairs")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missed ${exact -- lsh}")
    // approxSimilarityJoin reports exact distances on candidates: no
    // false positives beyond the threshold.
    assert((lsh -- exact).isEmpty, s"false positives ${lsh -- exact}")
  }

  test("minhashJoin is deterministic across runs (fixed seed)") {
    val df = fixture
    val r1 = Similarity.minhashJoin(df, "id", "toks", 0.4)
      .select("ida", "idb").collect().toSet
    val r2 = Similarity.minhashJoin(df, "id", "toks", 0.4)
      .select("ida", "idb").collect().toSet
    assert(r1 == r2)
  }

  test("neighborClusters: neighbor sets + singletons, canonical names") {
    import spark.implicits._
    val items = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
    val out = Similarity.neighborClusters(items, "id", pairs)
      .select("id", "cluster_name").as[(Long, String)].collect().toMap
    assert(out(1L) == "1+2")       // 1's neighbors: {2}
    assert(out(2L) == "1+2+3")     // 2's neighbors: {1,3}
    assert(out(3L) == "2+3")
    assert(out(4L) == "4")         // singleton via anti-join
    assert(out(5L) == "5")
  }

  test("clusterIds + rewriteTokens: base-26 ids, map rewrite, passthrough") {
    import spark.implicits._
    val clusters = Seq("beta", "alpha", "gamma").toDF("name")
    val ids = Similarity.clusterIds(clusters, "name")
      .as[(String, String)].collect().toMap
    assert(ids == Map("alpha" -> "A", "beta" -> "B", "gamma" -> "C"))
    val df = Seq((1L, Seq("alpha", "unknown", "beta"))).toDF("id", "toks")
    val dim = Similarity.clusterIds(clusters, "name")
    val out = Similarity.rewriteTokens(df, "toks", dim, "name", "cluster_id")
      .select("toks").as[Seq[String]].head()
    assert(out == Seq("A", "unknown", "B"))
  }
}
