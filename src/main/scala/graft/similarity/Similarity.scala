package graft.similarity

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity layer (SURVEY.md §2.10 M1–M4): HashingTF featurization,
  * seeded MinHash LSH approximate similarity self-join, neighbor-list
  * clustering with canonical names, and base-26 cluster-id assignment
  * with connection rewriting.
  *
  * Reference semantics: `Src/servers.py:96-216` (server clustering at
  * Jaccard-distance 0.05, cluster-level join at 0.6) and
  * `Src/processes.py:319-331` (process elements at 0.5). The reference
  * leaves MinHash seeds random; here they are fixed so results are
  * reproducible (SURVEY.md §7.4 risk 2).
  *
  * Scale posture: `approxSimilarityJoin` explodes hash tables and
  * equi-joins on (table, hash) — candidate-pair cost, never O(n²).
  * Neighbor clustering is one groupBy; the id map is a bounded dimension
  * joined with a broadcast hint, never collected to the driver (the
  * reference's broadcast-dict anti-pattern, `Src/servers.py:160-167`).
  */
object Similarity {

  /** M1+M2+J6: HashingTF over a token-array column, seeded MinHashLSH,
    * approximate similarity self-join. Returns (ida, idb, dist) with
    * exact Jaccard distance over the raw token sets, one row per
    * unordered pair (ida < idb), dist <= threshold.
    *
    * Candidate generation keeps the Spark ML surface (HashingTF +
    * seeded MinHashLSH signatures) and the exact bucket structure
    * `approxSimilarityJoin` uses internally — explode the hash tables,
    * collide on (table, hashValue) — but pairs are generated INSIDE
    * each bucket with higher-order functions (the d3 lshPairs shape)
    * and verified with codegen'd exact Jaccard over the raw token
    * arrays, instead of ML's interpreted per-pair `keyDistance` over
    * 2^20-dim sparse vectors. Same candidate set and recall, exact
    * distances (immune to feature-hash collisions, which previously
    * could perturb the hashed-vector Jaccard), measured ~8x cheaper —
    * `approxSimilarityJoin`'s UDF pair-verify was the single most
    * expensive line in the round-6 bench.
    */
  def minhashJoin(
      df: DataFrame,
      idCol: String,
      featCol: String,
      threshold: Double,
      numHashTables: Int = 8,
      seed: Long = 42L,
      numFeatures: Int = 1 << 20): DataFrame = {
    val tf = new HashingTF()
      .setInputCol("__sk").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    // HashingTF consumes the doc's 64-lane native MinHash sketch
    // (graft.plans.MinHash64, codegen'd — lane-tagged so values never
    // collide across lanes), NOT the raw token set: the TF transform is
    // a per-term Scala UDF, and at ~1000 raw tokens per document it was
    // the single most expensive stage of the round-6 bench (4.4 s of
    // m2's 5.9 s at sf0.1). A MinHash sketch is a set-determined
    // signature, so Jaccard structure survives: two docs at raw Jaccard
    // J agree on ~64·J lanes, giving sketch-set Jaccard J' = s/(128−s).
    // J' < J, so `numHashTables` defaults higher (8) than the raw-set
    // form needed (5) to keep bucket recall — candidates are still
    // verified EXACTLY against the raw arrays, so precision is always
    // 1 and recall is the only statistical quantity (SimilaritySpec
    // asserts ≥ 0.9 on adversarial fixtures; the similarity gap in the
    // harness corpora keeps it at 1.0 there).
    // Persisted (tracked): the sketch projection feeds the LSH fit,
    // the signature transform, and both exact-verify legs. The
    // empty-set guard (MinHash needs >= 1 non-zero entry) filters ON
    // TOP of the cache, NOT on the input: a filter below the
    // projection gets rewritten through it by PushDownPredicates,
    // inlining the caller's (expensive) featCol-defining expression
    // into the Filter and re-evaluating it per row — measured 3.2 s of
    // pure filter cost at sf0.1 when df is the shingle frame. The
    // InMemoryRelation is a pushdown barrier, so the guard costs one
    // cached-column size() probe instead.
    // hashed-long feature arrays (Dedup.shinglesOf's fingerprints) feed
    // minhash directly; string arrays hash per element first
    val featHashes = df.schema(featCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _) => col(featCol)
      case _ => graft.plans.NativeFunctions.arrayXxhash64(col(featCol))
    }
    // EAGER cut (round 13): the ML fit, the transform and both verify
    // joins all read base — as a lazy cache their concurrent stages
    // raced to first-touch it and re-ran the shingle+minhash subtree
    // (the d11/m23 pattern). A checkpoint is the same pushdown barrier
    // an InMemoryRelation was.
    val base =
      df.select(col(idCol), col(featCol),
        transform(
          graft.plans.NativeFunctions.minhash64(featHashes),
          (v, i) => concat_ws(":", i, v)).as("__sk"))
        .localCheckpoint(true)
    val featured = tf.transform(base.filter(size(col(featCol)) > 0))
    val mh = new MinHashLSH()
      .setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = mh.fit(featured)
    val cand = model.transform(featured)
      .select(col(idCol).as("__id"), posexplode(col("__hashes")))
      .select(col("__id"), col("pos"),
        org.apache.spark.ml.functions.vector_to_array(col("col"))
          .getItem(0).as("__h"))
      .groupBy(col("pos"), col("__h"))
      .agg(sort_array(collect_set(col("__id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"),
        x => transform(filter(col("ds"), y => y > x),
          y => struct(x.as("ida"), y.as("idb")))))).as("p"))
      .select(col("p.ida").as("ida"), col("p.idb").as("idb")).distinct()
    cand
      .join(base.select(col(idCol).as("ida"), col(featCol).as("__fa")),
        Seq("ida"))
      .join(base.select(col(idCol).as("idb"), col(featCol).as("__fb")),
        Seq("idb"))
      .withColumn("dist", graft.functions.jaccardDist(col("__fa"), col("__fb")))
      .filter(col("dist") <= threshold)
      .select(col("ida"), col("idb"), col("dist"))
  }

  /** M3: neighbor-list clustering. Each item's cluster is the sorted set
    * {itself} ∪ {its similar neighbors}; the canonical cluster name is
    * the '+'-joined member list (reference `Src/servers.py:121-147`:
    * NOT transitive closure — near-dup semantics, order-free). Items
    * with no pair become singleton clusters via anti-join + union.
    *
    * @param items distinct frame holding `idCol`
    * @param pairs (ida, idb) unordered similar pairs (ida < idb)
    * @return (idCol, members: array, cluster_name: string)
    */
  def neighborClusters(items: DataFrame, idCol: String, pairs: DataFrame)
      : DataFrame = {
    // `pairs` is typically an expensive LSH subtree and this plan
    // references it FOUR times (twice to symmetrize, and the
    // symmetrization feeds both the cluster and singleton branches) —
    // persist the pair OUTPUT itself, so the LSH stage runs exactly once
    // and every downstream branch reads the tiny cached (ida, idb) rows.
    // (Round 3 persisted only `sym`, which still evaluated the LSH
    // subtree twice to build the union's two legs.)
    val p = pairs.localCheckpoint(true) // eager — see minhashJoin's base
    val sym = p.select(col("ida").as("__id"), col("idb").as("__nbr"))
      .union(p.select(col("idb").as("__id"), col("ida").as("__nbr")))
    val clustered = sym.groupBy("__id")
      .agg(array_sort(array_union(collect_set(col("__nbr")),
        array(col("__id")))).as("members"))
    val singletons = items.select(col(idCol).as("__id"))
      .join(sym.select("__id").distinct(), Seq("__id"), "left_anti")
      .withColumn("members", array(col("__id")))
    clustered.unionByName(singletons)
      .select(col("__id").as(idCol), col("members"),
        array_join(transform(col("members"), _.cast("string")), "+")
          .as("cluster_name"))
  }

  /** M4/F10: contiguous base-26 ids (A, B, … AA, …) for a cluster-name
    * dimension — rank ascending by canonical name, assigned scale-safely
    * (range-sort + zipWithIndex, [[graft.functions.DenseIds]]) so no
    * single-task global window exists even when the dimension grows. */
  def clusterIds(clusters: DataFrame, nameCol: String): DataFrame =
    graft.functions.DenseIds.denseSortIds(clusters, nameCol, "__rank")
      .withColumn("cluster_id", graft.functions.base26Id(col("__rank")))
      .drop("__rank")

  /** M4: rewrite a token-array column through a (token → id) dimension
    * supplied as a one-row broadcast map — higher-order `transform`
    * replacing the reference's broadcast-dict UDFs
    * (`Src/servers.py:183-189`). Tokens absent from the map pass
    * through unchanged. */
  def rewriteTokens(df: DataFrame, tokArrCol: String, dim: DataFrame,
      keyCol: String, valCol: String): DataFrame = {
    val m = dim.agg(map_from_entries(collect_list(
      struct(col(keyCol), col(valCol)))).as("__m"))
    df.crossJoin(broadcast(m))
      .withColumn(tokArrCol,
        transform(col(tokArrCol),
          t => coalesce(element_at(col("__m"), t), t)))
      .drop("__m")
  }
}
