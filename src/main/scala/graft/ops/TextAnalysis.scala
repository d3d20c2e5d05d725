package graft.ops

import graft.{GQuery, QueryModule, Tables}
import graft.functions.{tokens, wordNgrams}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * word-list language/register identification, quality scoring
  * (length / stopword / punctuation ratios), token counting (whitespace +
  * BPE-ish regex), and a rolling-hash document fingerprint.
  *
  * Everything is pure Column expressions (codegen'd, no UDFs); the
  * fingerprint hash uses the first 8 hex chars of MD5 per token so the
  * DuckDB oracle computes the identical value.
  */
object TextAnalysis extends QueryModule {

  /** Boundary-aware BPE merge: apply merge rule (pa, pb) to a space-
    * separated symbol string `w`, merging only WHOLE-symbol-adjacent
    * occurrences (round-6 ADVICE: plain replace(w, pa||' '||pb, …)
    * matches across symbol boundaries once multi-char symbols exist —
    * applying ('h','e') to "th e" must NOT yield "the"). Every
    * separator expands to TWO spaces and the pattern ' pa  pb '
    * pins both edges to symbol boundaries; the double-space expansion
    * (vs a single-space sentinel pad) keeps ADJACENT occurrences
    * correct too — neighbouring matches never share a boundary space,
    * so "pa pb pa pb" merges both pairs exactly like reference BPE's
    * left-to-right non-overlapping scan. replace() is left-to-right
    * non-overlapping in both Spark and DuckDB, so the x25 oracle
    * replays this expression verbatim. */
  private[graft] def bpeMerge(w: Column, pa: Column, pb: Column): Column = {
    def rep(s: Column, find: Column, to: Column): Column =
      call_function("replace", s, find, to)
    val expanded = concat(lit(" "), rep(w, lit(" "), lit("  ")), lit(" "))
    val merged = rep(expanded,
      concat(lit(" "), pa, lit("  "), pb, lit(" ")),
      concat(lit(" "), pa, pb, lit(" ")))
    trim(rep(merged, lit("  "), lit(" ")))
  }

  /** Gopher-style repetition stats per document: duplicate-bigram and
    * top-bigram fractions. The per-doc gram histogram is computed
    * DISTRIBUTED (explode → two-level groupBy keyed on (doc_id, gram)),
    * not with an O(len²) per-row loop — corpus size scales out across
    * the shuffle and a single long document costs only its own
    * histogram. Expects columns (doc_id, text). */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // The >=2 guard is a FILTER between the token projection and the
    // gram projection, not a `when` inside it: Project-Filter-Project
    // blocks CollapseProject, so the lambda's `t` stays a materialized
    // attribute. With a when-guard the projections collapse and the
    // regex split re-evaluates per array element under the interpreted
    // HOF — measured 11.5 s vs 0.6 s at sf0.1 (same trap as
    // Dedup.shinglesOf, which this mirrors).
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(graft.plans.NativeFunctions
        .ngramHash64(col("t"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
      .select(col("doc_id"), col("n_grams"),
        round(lit(1.0) - col("n_distinct") * 1.0 / col("n_grams"), 4)
          .as("dup_frac"),
        round(col("top_c") * 1.0 / col("n_grams"), 4).as("top_frac"))
      .withColumn("flagged", col("dup_frac") > 0.2 || col("top_frac") > 0.1)
  }

  /** Benchmark decontamination: flag corpus documents whose 5-gram set
    * overlaps an evaluation ("benchmark") document set. The benchmark
    * gram set is DISTINCT + broadcast (eval suites are bounded — a few
    * hundred MB of n-grams at most), so the corpus side is one map-side
    * left join and a single shuffle keyed on doc_id; no corpus×bench
    * pair blowup is possible. Expects (doc_id, text); `isBench` selects
    * the benchmark rows. */
  def decontam(docs: org.apache.spark.sql.DataFrame, isBench: Column)
      : org.apache.spark.sql.DataFrame = {
    // same Project-Filter-Project shape as repetitionStats (see there)
    val grams = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(graft.plans.NativeFunctions
          .ngramHash64(col("t"), 5))).as("gram"))
    val bench = grams.filter(isBench)
      .select("gram").distinct().withColumn("inb", lit(1))
    grams.filter(!isBench)
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("inb")).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit") * 1.0 / col("n_grams"), 4).as("rate"))
      .withColumn("flagged", col("rate") >= 0.05)
  }

  /** (doc_id, lang, n_toks, quality) — the x2 quality score with the
    * grouping columns the downstream curation steps need; shared by x7
    * packing and the p0 end-to-end pipeline. */
  private[ops] def qualityScored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, d)
      .select("doc_id", "lang", "text")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_toks"),
        hits(toks, stopwords).as("n_stop"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
          (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
          .as("quality"))
  }

  /** DuckDB replay of [[qualityScored]] as a CTE named `q`. */
  private[ops] def qualitySqlCte: String =
    s"""q AS (SELECT doc_id, lang, n_toks,
       |        round(least(n_toks / 60.0, 1.0) * 0.5 +
       |              (1.0 - n_stop * 1.0 / n_toks) * 0.5, 4) AS quality
       |      FROM (SELECT doc_id, lang,
       |              len(string_split(trim(text), ' ')) AS n_toks,
       |              ${sqlHits(stopwords)} AS n_stop
       |            FROM documents))""".stripMargin

  /** Three word lists partitioning the corpus vocabulary — the scoring
    * skeleton of an n-gram language-ID heuristic (argmax of per-class
    * token hits with a deterministic tiebreak). */
  private val listA = Seq("the", "a", "fast", "slow", "big", "small")
  private val listB = Seq("table", "scan", "join", "merge", "hash", "filter", "sort")
  private val listC = Seq("spark", "stream", "batch", "vector", "agg", "group")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  private def sqlHits(words: Seq[String]): String =
    s"len(list_filter(string_split(trim(text), ' '), " +
      s"t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  private val stopwords = Seq("the", "a", "of", "and")

  /** documents scan spread across cores — the harness file is one
    * unsplittable row group, and the per-token scoring below is
    * compute-bound (no-op at real scale where files split). */
  /** Pairwise estimated Jaccard between SOURCES from per-source
    * MinHash sketches over doc fingerprints. Input: (source, text);
    * output: (sa, sb, est_jac) for sa < sb. Each source folds to
    * `lanes` lane-minima (map-side combined); only sketch rows cross
    * the comparison join. */
  private[graft] def corpusOverlap(docs: org.apache.spark.sql.DataFrame,
      lanes: Int = 64): org.apache.spark.sql.DataFrame = {
    val laneMin = docs
      .select(col("source"), md5(col("text")).as("fp"))
      .select(col("source"), explode(array((0 until lanes).map { i =>
        struct(lit(i).as("lane"),
          conv(substring(md5(concat_ws("#", lit(i.toString),
            col("fp"))), 1, 12), 16, 10).cast("long").as("h"))
      }: _*)).as("lh"))
      .groupBy(col("source"), col("lh.lane").as("lane"))
      .agg(min(col("lh.h")).as("mh"))
    laneMin.select(col("source").as("sa"), col("lane"), col("mh").as("ha"))
      .join(laneMin.select(col("source").as("sb"), col("lane"),
        col("mh").as("hb")), Seq("lane"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(round(sum(when(col("ha") === col("hb"), 1).otherwise(0)) /
        lit(lanes.toDouble), 4).as("est_jac"))
  }

  private def docsSpread(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.documents(s, d)
      // only (doc_id, text) ride the spread exchange — not lang/source/
      // n_chars (explicit rather than trusting pruning through Repartition)
      .select("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism)

  /** [[docsSpread]] + the source column (x27 partitions counts by it). */
  private def docsSpread2(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.documents(s, d)
      .select("doc_id", "source", "text")
      .repartition(s.sparkContext.defaultParallelism)

  /** x29 core over an arbitrary (doc_id, text) frame: train 3 BPE
    * merges on the corpus vocabulary (the x25 kernel — boundary-aware
    * [[bpeMerge]], (count desc, lexicographic) tie-break), then encode
    * the corpus by applying them. The scale-critical shape: merges run
    * over the Heaps-law-bounded TYPE vocabulary (each distinct word
    * encoded once, the frame persisted across its 7 consumers); per-doc
    * totals come from joining the token stream to the encoded
    * vocabulary — occurrences never pay string work. */
  private[graft] def bpeEncodeDocs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val v0 = graft.Caches.track(docs
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(col("tok"), array_join(filter(split(col("tok"), ""),
        x => length(x) > 0), " ").as("w"), col("c")))
    def topPair(w: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val sy = split(col("w"), " ")
      w.select(explode(zip_with(sy, slice(sy, lit(2), size(sy)),
          (a, b) => struct(a.as("pa"), b.as("pb")))).as("z"), col("c"))
        .filter(col("z.pb").isNotNull)
        .groupBy(col("z.pa").as("pa"), col("z.pb").as("pb"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb")).limit(1)
    }
    def merged(w: org.apache.spark.sql.DataFrame,
        top: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      graft.Caches.track(w.crossJoin(broadcast(top))
        .select(col("tok"),
          bpeMerge(col("w"), col("pa"), col("pb")).as("w"), col("c")))
    val v1 = merged(v0, topPair(v0))
    val v2 = merged(v1, topPair(v1))
    val v3 = merged(v2, topPair(v2))
    val enc = v3.select(col("tok"),
      size(split(col("w"), " ")).cast("long").as("n_sym"))
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .join(enc, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(length(col("tok"))).cast("long").as("n_chars"),
        sum(col("n_sym")).as("n_bpe"))
      .select(col("doc_id"), col("n_toks"), col("n_chars"), col("n_bpe"),
        round(col("n_bpe") * 1.0 / col("n_chars"), 4).as("ratio"))
      .orderBy("doc_id")
  }

  /** Iterate-until-exhausted BPE trainer — the unbounded library
    * variant of the x25/x29 fixed-3 kernel, given the same treatment
    * as the graph loops (fixed-depth oracle query + deep loop with
    * localCheckpoint lineage cuts). Trains up to `maxMerges` rules,
    * stopping EARLY when no adjacent symbol pair remains. Each round:
    * one keyed pair-count aggregation over the Heaps-bounded
    * vocabulary, one 1-row TakeOrdered collect (the bounded driver
    * action of the loop, same class as the convergence probes in
    * `Cluster.pagerankConverged`), one merge projection. The vocab
    * frame is localCheckpoint-ed eagerly per round, so plan depth
    * stays O(1) however deep the merge table gets — a real tokenizer
    * runs 30k+ merges and the corpus is read exactly once, at the
    * initial word count. Returns (merge table (step, pa, pb, n),
    * final symbolized vocab (w, c)). */
  private[graft] def bpeTrain(docs: org.apache.spark.sql.DataFrame,
      maxMerges: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import docs.sparkSession.implicits._
    var v = docs.select(explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(array_join(filter(split(col("tok"), ""),
        x => length(x) > 0), " ").as("w"), col("c"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (!done && merges.size < maxMerges) {
      val sy = split(col("w"), " ")
      val top = v.select(explode(zip_with(sy, slice(sy, lit(2), size(sy)),
          (a, b) => struct(a.as("pa"), b.as("pb")))).as("z"), col("c"))
        .filter(col("z.pb").isNotNull)
        .groupBy(col("z.pa").as("pa"), col("z.pb").as("pb"))
        .agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        merges += ((merges.size + 1L, r.getString(0), r.getString(1),
          r.getLong(2)))
        v = v.select(bpeMerge(col("w"), lit(r.getString(0)),
            lit(r.getString(1))).as("w"), col("c"))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq.toDF("step", "pa", "pb", "n"), v)
  }

  /** x30 core: overlapping token windows of `w` every `s` tokens over a
    * (doc_id, text) frame — map-only (explode + slice), no shuffle
    * before the presentation sort. */
  private[graft] def chunkOverlap(docs: org.apache.spark.sql.DataFrame,
      win: Int, stride: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("n") - 1, lit(stride.toLong)))
          .as("st"))
      .select(col("doc_id"), expr(s"st div $stride").as("chunk_idx"),
        slice(col("t"), (col("st") + 1).cast("int"), lit(win)).as("ch"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ch")).cast("long").as("n_chunk_toks"),
        md5(array_join(col("ch"), " ")).as("chunk_md5"),
        element_at(col("ch"), 1).as("first_tok"),
        element_at(col("ch"), -1).as("last_tok"))
      .orderBy("doc_id", "chunk_idx")

  /** x31 core: deterministic A-ES weighted top-k per source stratum
    * over a (doc_id, source, w) frame — smallest k values of the
    * micro-quantized -ln(u)/w key, u derived from md5(doc_id). */
  private[graft] def weightedSample(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("r"), col("doc_id"))
    docs
      .withColumn("h",
        expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 12)," +
          " 16, 10) as bigint)"))
      .withColumn("lm",
        expr("cast(round(-ln((h + 1) / 281474976710656.0) * 1e6)" +
          " as bigint)"))
      .withColumn("r", col("lm").cast("double") / col("w"))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk"), col("doc_id"), col("w"),
        col("lm"))
      .orderBy("source", "rk")
  }

  /** x27 core over an arbitrary (doc_id, source, text) frame: per-doc
    * mean hashed-unigram log-ratio against the `target` source. */
  private[graft] def dsirWeights(docs: org.apache.spark.sql.DataFrame,
      target: String): org.apache.spark.sql.DataFrame = {
    val tb = docs
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("tok")), 1, 12), 16, 10)
          .cast("long") % DsirB).as("b"))
    val bk = graft.Caches.track(
      tb.groupBy("b").agg(
        sum(when(col("source") === target, 1L).otherwise(0L))
          .as("tc"),
        count(lit(1)).as("rc")))
    val lr = bk.select(col("b"),
      round((log(col("tc") + 1.0) - log(col("rc") + 1.0)) * 1e6)
        .cast("long").as("lrm"))
    val shift = bk.agg(
      round((log(sum(col("rc")) + lit(DsirB.toDouble)) -
        log(sum(col("tc")) + lit(DsirB.toDouble))) * 1e6)
        .cast("long").as("shift"))
    tb.join(broadcast(lr), Seq("b"))
      .crossJoin(broadcast(shift))
      .groupBy("doc_id", "shift")
      .agg(count(lit(1)).as("n_toks"), sum(col("lrm")).as("sm"))
      .select(col("doc_id"), col("n_toks"),
        round((col("sm") + col("n_toks") * col("shift")) /
          (col("n_toks") * 1e6), 4).as("dsir_lr"))
  }

  /** x27 DSIR: hashed-feature bucket count and the target domain. */
  private val DsirB = 4096
  private val DsirTarget = "src0"

  /** Oracle CTEs shared by x12/x26: per-token unigram stats and the
    * per-doc `scores` frame (doc_id, n_toks, nll, rare_frac). */
  private val lmScoreSqlCtes: String =
    """t AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      |  FROM documents),
      |f AS (SELECT tok, count(*) AS cnt,
      |        CAST(round(ln(count(*)) * 1e6) AS BIGINT) AS lp_micro
      |      FROM t GROUP BY 1),
      |n AS (SELECT CAST(round(ln(sum(cnt)) * 1e6) AS BIGINT)
      |        AS ln_total_micro FROM f),
      |scores AS (
      |  SELECT t.doc_id AS doc_id, count(*) AS n_toks,
      |    round((n.ln_total_micro * count(*) - sum(f.lp_micro)) /
      |          (count(*) * 1e6), 3) AS nll,
      |    round(sum(CASE WHEN f.cnt <= 2 THEN 1 ELSE 0 END) * 1.0
      |          / count(*), 4) AS rare_frac
      |  FROM t JOIN f USING (tok) CROSS JOIN n
      |  GROUP BY t.doc_id, n.ln_total_micro)""".stripMargin

  /** x12 core — unigram-LM mean NLL per doc, shared with x26's CCNet
    * bucketing. `freq` is persisted (vocab-bounded): it feeds the
    * per-doc join AND the corpus total; the total rides the plan as a
    * 1-row broadcast (the x22 pattern) instead of a driver head() —
    * the head() form ran the corpus explode a THIRD time at plan-build,
    * outside any cache (measured 2.1 s vs 1.3 s). log() in-plan is
    * java.lang.Math.log, micro-quantized to long so every downstream
    * sum is exact integer arithmetic the oracle replays. */
  private def lmScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val toks = docsSpread(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = graft.Caches.track(
      toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .select(col("tok"), col("cnt"),
          round(log(col("cnt").cast("double")) * 1e6).cast("long")
            .as("lp_micro")))
    val total = freq.agg(
      round(log(sum(col("cnt")).cast("double")) * 1e6).cast("long")
        .as("ln_total_micro"))
    toks.join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id", "ln_total_micro")
      .agg(count(lit(1)).as("n_toks"),
        sum(col("lp_micro")).as("s_micro"),
        sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_toks"),
        round((col("ln_total_micro") * col("n_toks") - col("s_micro")) /
          (col("n_toks") * 1e6), 3).as("nll"),
        round(col("n_rare") * 1.0 / col("n_toks"), 4).as("rare_frac"))
  }

  override def queries: Seq[GQuery] = Seq(

    // Language-ID skeleton: per-class word-list scores + argmax.
    GQuery("x1_langid",
      (s, d) => {
        val toks = tokens(col("text"))
        docsSpread(s, d)
          .select(col("doc_id"),
            hits(toks, listA).as("s_a"),
            hits(toks, listB).as("s_b"),
            hits(toks, listC).as("s_c"))
          .withColumn("pred",
            when(col("s_a") >= col("s_b") && col("s_a") >= col("s_c"), "a")
              .when(col("s_b") >= col("s_c"), "b")
              .otherwise("c"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, s_a, s_b, s_c,
              |  CASE WHEN s_a >= s_b AND s_a >= s_c THEN 'a'
              |       WHEN s_b >= s_c THEN 'b' ELSE 'c' END AS pred
              |FROM (SELECT doc_id,
              |        ${sqlHits(listA)} AS s_a,
              |        ${sqlHits(listB)} AS s_b,
              |        ${sqlHits(listC)} AS s_c
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // Quality scoring: token count, mean token length, stopword ratio,
    // combined into one bounded score. Formula written identically on
    // both sides so the doubles match bit-for-bit.
    GQuery("x2_quality",
      (s, d) => {
        val toks = tokens(col("text"))
        docsSpread(s, d)
          .select(col("doc_id"), col("text"),
            size(toks).cast("long").as("n_toks"),
            hits(toks, stopwords).as("n_stop"),
            aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_chars"))
          .select(col("doc_id"), col("n_toks"),
            round(col("tok_chars") * 1.0 / col("n_toks"), 4).as("avg_tok_len"),
            round(col("n_stop") * 1.0 / col("n_toks"), 4).as("stop_ratio"),
            round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
              .as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_toks,
              |  round(tok_chars * 1.0 / n_toks, 4) AS avg_tok_len,
              |  round(n_stop * 1.0 / n_toks, 4) AS stop_ratio,
              |  round(least(n_toks / 60.0, 1.0) * 0.5 +
              |        (1.0 - n_stop * 1.0 / n_toks) * 0.5, 4) AS quality
              |FROM (SELECT doc_id,
              |        len(string_split(trim(text), ' ')) AS n_toks,
              |        ${sqlHits(stopwords)} AS n_stop,
              |        list_sum(list_transform(string_split(trim(text), ' '),
              |          t -> length(t)))::BIGINT AS tok_chars
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens vs a BPE-ish regex (word pieces +
    // single non-word non-space marks), plus chars-per-token.
    GQuery("x3_token_count",
      (s, d) => docsSpread(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_ws"),
          regexp_count(col("text"), lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"))
            .cast("long").as("n_bpe"),
          length(col("text")).cast("long").as("n_chars_m"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(trim(text), ' ')) AS n_ws,
             |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))
             |    AS n_bpe,
             |  length(text) AS n_chars_m
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Document fingerprint: polynomial rolling hash over per-token
    // portable hashes (first 8 hex chars of MD5), mod 2^31-1.
    GQuery("x4_fingerprint",
      (s, d) => {
        val toks = tokens(col("text"))
        val tokHashes = transform(toks,
          t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
        docsSpread(s, d)
          .select(col("doc_id"),
            aggregate(tokHashes, lit(0L),
              (acc, h) => (acc * 1000003L + h) % 2147483647L).as("fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  list_reduce([0::BIGINT] ||
             |    list_transform(string_split(trim(text), ' '),
             |      t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
             |    (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII scrubbing: redact email-shaped tokens and long digit runs —
    // the redaction pass every LLM training-data pipeline runs before
    // tokenization. Pure regexp_replace (codegen'd), global by default
    // on both engines; reports per-doc redaction counts alongside the
    // scrubbed text.
    GQuery("x5_pii_scrub",
      (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val digitRe = "[0-9]{6,}"
        docsSpread(s, d)
          .select(col("doc_id"),
            regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
              digitRe, "<NUM>").as("scrubbed"),
            size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
              .cast("long").as("n_email"),
            size(regexp_extract_all(col("text"), lit(digitRe), lit(0)))
              .cast("long").as("n_num"))
          .filter(col("doc_id") % 10 === 0)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |      '<EMAIL>', 'g'),
             |    '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
             |  len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             |  len(regexp_extract_all(text, '[0-9]{6,}')) AS n_num
             |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sampling — per-language rates applied via
    // a portable hash of the KEY (first 8 hex chars of md5, mod 100), so
    // the sample is reproducible run-to-run, engine-independent, and
    // join-stable (the same doc is always in or out). Scale posture: a
    // pure narrow filter over the scan — no shuffle, no state; rates
    // live in a CASE (a broadcast dim at real vocabulary sizes).
    GQuery("x6_strat_sample",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 100).as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", 25)
            .when(col("lang") === "zh", 50).otherwise(10))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, bucket FROM (
             |  SELECT doc_id, lang,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |      ::UBIGINT % 100 AS BIGINT) AS bucket
             |  FROM documents)
             |WHERE bucket < CASE WHEN lang = 'en' THEN 25
             |               WHEN lang = 'zh' THEN 50 ELSE 10 END
             |ORDER BY doc_id""".stripMargin)),

    // Token-budget packing — the curation step that fills a per-language
    // token quota with the highest-quality documents first: rank within
    // each language by the x2 quality score, keep documents while the
    // running token total stays under the budget. Scale posture: one
    // partitioned window (per-language), no global ordering anywhere.
    GQuery("x7_budget_pack",
      (s, d) => {
        val toks = tokens(col("text"))
        val scored = Tables.documents(s, d)
          .select("doc_id", "lang", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"),
            size(toks).cast("long").as("n_toks"),
            hits(toks, stopwords).as("n_stop"))
          .select(col("doc_id"), col("lang"), col("n_toks"),
            round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
              .as("quality"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("quality").desc, col("doc_id"))
        scored.withColumn("cum_toks", sum(col("n_toks")).over(w))
          .filter(col("cum_toks") <= 2000)
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, n_toks, quality, cum_toks FROM (
              |  SELECT doc_id, lang, n_toks, quality,
              |    CAST(sum(n_toks) OVER (PARTITION BY lang
              |      ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_toks
              |  FROM (SELECT doc_id, lang, n_toks,
              |          round(least(n_toks / 60.0, 1.0) * 0.5 +
              |                (1.0 - n_stop * 1.0 / n_toks) * 0.5, 4) AS quality
              |        FROM (SELECT doc_id, lang,
              |                len(string_split(trim(text), ' ')) AS n_toks,
              |                ${sqlHits(stopwords)} AS n_stop
              |              FROM documents)))
              |WHERE cum_toks <= 2000 ORDER BY doc_id""".stripMargin)),

    // Repetition filter (Gopher-style pretraining quality rule):
    // duplicate-bigram fraction and most-frequent-bigram fraction per
    // document, with a flag over both. See [[repetitionStats]] for the
    // distributed-histogram scale posture.
    GQuery("x8_repetition",
      (s, d) => repetitionStats(docsSpread(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
             |  round(1.0 - count(*) * 1.0 / sum(c), 4) AS dup_frac,
             |  round(max(c) * 1.0 / sum(c), 4) AS top_frac,
             |  (round(1.0 - count(*) * 1.0 / sum(c), 4) > 0.2 OR
             |   round(max(c) * 1.0 / sum(c), 4) > 0.1) AS flagged
             |FROM (SELECT doc_id, w1 || ' ' || w2 AS gram, count(*) AS c
             |      FROM (SELECT doc_id,
             |              unnest(list_slice(t, 1, len(t)-1)) AS w1,
             |              unnest(list_slice(t, 2, len(t))) AS w2
             |            FROM (SELECT doc_id,
             |                    string_split(trim(text), ' ') AS t
             |                  FROM documents)
             |            WHERE len(t) >= 2)
             |      GROUP BY 1, 2)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: 5-gram overlap of every corpus doc
    // against the benchmark subset (doc_id % 97 = 0 stands in for the
    // eval suite). See [[decontam]] for the broadcast-set scale posture.
    GQuery("x9_decontam",
      (s, d) => decontam(docsSpread(s, d), col("doc_id") % 97 === 0)
        .orderBy("doc_id"),
      Some("""WITH ex AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    list_transform(range(1, len(t)-3),
             |      i -> array_to_string(list_slice(t, i, i+4), ' ')))) AS gram
             |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t
             |        FROM documents)
             |  WHERE len(t) >= 5)
             |SELECT c.doc_id AS doc_id, count(*) AS n_grams,
             |  count(b.gram) AS n_hit,
             |  round(count(b.gram) * 1.0 / count(*), 4) AS rate,
             |  (round(count(b.gram) * 1.0 / count(*), 4) >= 0.05) AS flagged
             |FROM (SELECT doc_id, gram FROM ex WHERE doc_id % 97 <> 0) c
             |LEFT JOIN (SELECT DISTINCT gram FROM ex WHERE doc_id % 97 = 0) b
             |  USING (gram)
             |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin)),

    // KMV (k-minimum-values) distinct-count sketch: estimate distinct
    // tokens per source from only the k smallest distinct hash values —
    // the bounded-memory, mergeable cardinality path at 100 TB, where
    // an exact distinct over a token explosion is the cost center.
    // Estimator: (k-1) / kth_min_fraction. Portability: hashes are the
    // first 12 hex chars of md5 (48 bits — exactly representable in a
    // double, so the estimate divides bit-identically in DuckDB).
    // Scale posture: the only corpus-sized shuffle is the map-side-
    // combined distinct on (source, h); the min-k is the salted
    // two-phase top-k (a5 pattern) — every window task is bounded by
    // distinct/32 resp. 32·k rows, never by a source's full vocabulary.
    GQuery("x10_kmv_distinct",
      (s, d) => {
        val k = 256
        val hashes = Tables.documents(s, d)
          .select("source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .select(col("source"),
            conv(substring(md5(col("tok")), 1, 12), 16, 10).cast("long")
              .as("h"))
          .distinct()
        val wSalt = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("salt")).orderBy("h")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("h")
        hashes.withColumn("salt", col("h") % 32)
          .withColumn("rn", row_number().over(wSalt))
          .filter(col("rn") <= k).drop("rn", "salt")
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
          .select(col("source"), col("n_kept"), col("kth_hash"),
            round(when(col("n_kept") < k, col("n_kept").cast("double"))
              .otherwise((col("n_kept") - 1) * lit(281474976710656.0) /
                col("kth_hash")), 2).as("est_distinct"))
          .orderBy("source")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT source,
             |    ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h
             |  FROM (SELECT source,
             |          unnest(string_split(trim(text), ' ')) AS tok
             |        FROM documents)),
             |r AS (SELECT source, h,
             |        row_number() OVER (PARTITION BY source ORDER BY h)
             |          AS rn FROM h)
             |SELECT source, count(*) AS n_kept, max(h) AS kth_hash,
             |  round(CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
             |        ELSE (count(*) - 1) * 281474976710656.0 / max(h)
             |        END, 2) AS est_distinct
             |FROM r WHERE rn <= 256
             |GROUP BY source ORDER BY source""".stripMargin)),

    // KMV as a typed Aggregator/UDAF (one-pass form of x10): the sketch
    // folds per-row under map-side combine — each task ships ≤ k longs
    // per source, no distinct pre-pass, no window, no per-group row
    // shuffle. Same hash domain + estimator as x10, so the SAME oracle
    // verifies both paths agree with DuckDB (and hence each other).
    GQuery("x13_kmv_agg",
      (s, d) => {
        val k = 256
        Tables.documents(s, d)
          .select("source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .select(col("source"),
            conv(substring(md5(col("tok")), 1, 12), 16, 10).cast("long")
              .as("h"))
          .groupBy("source")
          .agg(graft.functions.NamedAggregators.kmv(col("h"), k).as("kmv"))
          .select(col("source"),
            col("kmv.n_kept").cast("long").as("n_kept"),
            col("kmv.kth_hash").as("kth_hash"),
            round(col("kmv.est_distinct"), 2).as("est_distinct"))
          .orderBy("source")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT source,
             |    ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h
             |  FROM (SELECT source,
             |          unnest(string_split(trim(text), ' ')) AS tok
             |        FROM documents)),
             |r AS (SELECT source, h,
             |        row_number() OVER (PARTITION BY source ORDER BY h)
             |          AS rn FROM h)
             |SELECT source, count(*) AS n_kept, max(h) AS kth_hash,
             |  round(CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
             |        ELSE (count(*) - 1) * 281474976710656.0 / max(h)
             |        END, 2) AS est_distinct
             |FROM r WHERE rn <= 256
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Inter-document boilerplate detection (CCNet-flavored): per doc,
    // the fraction of its DISTINCT trigrams whose document frequency
    // exceeds 2% of the corpus — headers/footers/navigation chrome that
    // repeats across documents rather than within one. The threshold is
    // corpus-RELATIVE so the operator means the same thing at sf0.01
    // and at 100 TB. Shape: one inverted-index build (gram → doc
    // frequency, map-side combined) and one keyed equi-join back — the
    // same two-shuffle skeleton as d2's inverted index; the hot-gram
    // side is filtered before the join so the join build side carries
    // only actual boilerplate grams.
    GQuery("x11_boilerplate",
      (s, d) => {
        val grams = docsSpread(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(graft.plans.NativeFunctions
              .ngramHash64(col("t"), 3))).as("gram"))
        // corpus size folded into the plan as a 1-row broadcast (a
        // driver-side .count() here was a whole extra scan + action)
        val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val hot = grams.groupBy("gram").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("df") > col("n_docs") * 0.02)
          .select("gram", "df")
        grams.join(hot, Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"), count(col("df")).as("n_boiler"))
          .select(col("doc_id"), col("n_grams"), col("n_boiler"),
            round(col("n_boiler") * 1.0 / col("n_grams"), 4)
              .as("boiler_frac"))
          .withColumn("flagged", col("boiler_frac") >= 0.5)
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    list_transform(range(1, len(t)-1),
             |      i -> array_to_string(list_slice(t, i, i+2), ' ')))) AS gram
             |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t
             |        FROM documents)
             |  WHERE len(t) >= 3),
             |df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT g.doc_id AS doc_id, count(*) AS n_grams,
             |  count(CASE WHEN df.df > n.n_docs * 0.02 THEN 1 END)
             |    AS n_boiler,
             |  round(count(CASE WHEN df.df > n.n_docs * 0.02 THEN 1 END)
             |    * 1.0 / count(*), 4) AS boiler_frac,
             |  (round(count(CASE WHEN df.df > n.n_docs * 0.02 THEN 1 END)
             |    * 1.0 / count(*), 4) >= 0.5) AS flagged
             |FROM g JOIN df USING (gram) CROSS JOIN n
             |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin)),

    // Unigram-LM scoring (perplexity proxy): per-doc mean negative
    // log-likelihood under the corpus's OWN unigram distribution, plus
    // the rare-token fraction — the distributable analog of CCNet's LM
    // quality filter (no external model; the corpus is the model).
    // High nll ≈ gibberish/OCR noise, very low ≈ templated chrome.
    // Portability: per-token log-probs are quantized to integer
    // micro-nats AT THE VOCABULARY LEVEL (one round(ln(cnt)·1e6) per
    // distinct token), so every per-doc sum is exact long arithmetic —
    // no float-summation order dependence between engines or partitions.
    // Scale posture: the vocabulary frame (token, cnt, lp_micro) is the
    // only broadcast (Heaps-law bounded; at open-web scale swap the
    // hint for the co-partitioned shuffle join + x6-style hot-token
    // salting); the corpus-sized work is one map-side-combined groupBy
    // and one keyed join.
    GQuery("x12_lm_score",
      (s, d) => lmScores(s, d).orderBy("doc_id"),
      Some(s"""WITH $lmScoreSqlCtes
             |SELECT doc_id, n_toks, nll, rare_frac FROM scores
             |ORDER BY doc_id""".stripMargin)),

    // CCNet-style quality bucketing (Wenzek et al. 2020): per LANGUAGE,
    // rank docs by LM score and cut into head/middle/tail tertiles —
    // the standard crawl-curation triage (keep head, maybe-keep middle,
    // drop tail), language-local so low-resource languages aren't
    // crushed by the dominant language's score scale. Reuses x12's
    // scores; the only additions are a broadcast lang join and ONE
    // window per language partition (at 100 TB the partition key is
    // (lang, shard) and the tertile boundary comes from a quantile
    // sketch instead of a full sort — a18's machinery).
    GQuery("x26_ppl_buckets",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("nll"), col("doc_id"))
        lmScores(s, d)
          .join(broadcast(Tables.documents(s, d)
            .select("doc_id", "lang")), Seq("doc_id"))
          .withColumn("t3", ntile(3).over(w))
          .select(col("doc_id"), col("lang"), col("nll"),
            when(col("t3") === 1, "head").when(col("t3") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $lmScoreSqlCtes,
             |lb AS (SELECT s.doc_id, d.lang, s.nll,
             |         ntile(3) OVER (PARTITION BY d.lang
             |           ORDER BY s.nll, s.doc_id) AS t3
             |       FROM scores s JOIN documents d ON s.doc_id = d.doc_id)
             |SELECT doc_id, lang, nll,
             |  CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM lb ORDER BY doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): score every raw doc by
    // how target-like its hashed n-gram feature distribution is —
    // weight = mean over tokens of log(p_target(bucket)/p_raw(bucket))
    // with add-1 smoothing over B hashed buckets. The target here is
    // the src0 domain; raw is the whole corpus. All log-ratios are
    // micro-quantized to long at the BUCKET level (|vocab|-bounded), so
    // the per-doc sums are exact integer arithmetic in both engines.
    // Scale posture: two bounded frames ride the plan — the B-row
    // bucket table (broadcast join) and the 1-row normalization shift
    // (x22's broadcast-total pattern); the corpus is scanned once for
    // counts and once for scoring, both linear, shuffles keyed on the
    // 4096-value bucket id.
    GQuery("x27_dsir",
      (s, d) => dsirWeights(docsSpread2(s, d), DsirTarget)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
             |  SELECT doc_id, source,
             |    unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents WHERE trim(text) <> ''),
             |tb AS (SELECT doc_id,  source,
             |         ('0x' || substr(md5(tok), 1, 12))::BIGINT % $DsirB
             |           AS b
             |       FROM t),
             |bk AS (SELECT b,
             |         CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1
             |                       ELSE 0 END) AS BIGINT) AS tc,
             |         count(*) AS rc
             |       FROM tb GROUP BY 1),
             |lr AS (SELECT b, CAST(round((ln(tc + 1.0) - ln(rc + 1.0))
             |         * 1e6) AS BIGINT) AS lrm
             |       FROM bk),
             |sh AS (SELECT CAST(round((ln(CAST(sum(rc) AS BIGINT)
             |           + $DsirB.0) - ln(CAST(sum(tc) AS BIGINT)
             |           + $DsirB.0)) * 1e6) AS BIGINT) AS shift
             |       FROM bk),
             |per AS (SELECT tb.doc_id, count(*) AS n_toks,
             |          CAST(sum(lr.lrm) AS BIGINT) AS sm
             |        FROM tb JOIN lr USING (b) GROUP BY 1)
             |SELECT doc_id, n_toks,
             |  round((sm + n_toks * sh.shift) / (n_toks * 1e6), 4)
             |    AS dsir_lr
             |FROM per CROSS JOIN sh ORDER BY doc_id""".stripMargin)),

    // Gopher-style rule filter (Rae et al. 2021): the hard heuristic
    // gate crawl pipelines apply BEFORE any model-based scoring — word
    // count in [50, 100k], mean word length in [3, 10], ≥80% alphabetic
    // words, ≥2 stopword occurrences. Each rule is a separate flag (the
    // curation dashboard wants per-rule attrition, not just the AND).
    // Every comparison is INTEGER (length bounds via cross-
    // multiplication: 3n ≤ chars ≤ 10n), so the verdict columns carry
    // zero float risk; the one float column (mean_wlen) is output-only.
    // The line-shape rules (bullet/ellipsis ratios) are omitted: the
    // harness corpus is single-line by construction.
    GQuery("x28_gopher_rules",
      (s, d) => {
        val toks = tokens(col("text"))
        docsSpread(s, d)
          .select(col("doc_id"),
            size(toks).cast("long").as("n_words"),
            aggregate(toks, lit(0L), (acc, t) => acc + length(t))
              .as("chars"),
            size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
              .as("n_alpha"),
            hits(toks, stopwords).as("n_stop"))
          .select(col("doc_id"), col("n_words"),
            when(col("n_words") === 0, 0.0).otherwise(
              round(col("chars") * 1.0 / col("n_words"), 4))
              .as("mean_wlen"),
            (col("n_words") >= 50 && col("n_words") <= 100000).as("r_wc"),
            (col("n_words") > 0 && col("chars") >= col("n_words") * 3 &&
              col("chars") <= col("n_words") * 10).as("r_wlen"),
            (col("n_words") > 0 &&
              col("n_alpha") * 10 >= col("n_words") * 8).as("r_alpha"),
            (col("n_stop") >= 2).as("r_stop"))
          .withColumn("keep",
            col("r_wc") && col("r_wlen") && col("r_alpha") && col("r_stop"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dt AS (
             |  SELECT doc_id,
             |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             |         ELSE string_split(trim(text), ' ') END AS t
             |  FROM documents),
             |s1 AS (SELECT doc_id,
             |  CAST(len(t) AS BIGINT) AS n_words,
             |  CAST(coalesce(list_sum(list_transform(t, w -> len(w))), 0)
             |    AS BIGINT) AS chars,
             |  CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
             |    AS BIGINT) AS n_alpha,
             |  CAST(len(list_filter(t,
             |    w -> w IN (${stopwords.map(w => s"'$w'").mkString(",")})))
             |    AS BIGINT) AS n_stop
             |  FROM dt)
             |SELECT doc_id, n_words,
             |  CASE WHEN n_words = 0 THEN 0.0
             |       ELSE round(chars * 1.0 / n_words, 4) END AS mean_wlen,
             |  (n_words >= 50 AND n_words <= 100000) AS r_wc,
             |  (n_words > 0 AND chars >= n_words * 3
             |    AND chars <= n_words * 10) AS r_wlen,
             |  (n_words > 0 AND n_alpha * 10 >= n_words * 8) AS r_alpha,
             |  (n_stop >= 2) AS r_stop,
             |  (n_words >= 50 AND n_words <= 100000
             |    AND chars >= n_words * 3 AND chars <= n_words * 10
             |    AND n_alpha * 10 >= n_words * 8 AND n_stop >= 2) AS keep
             |FROM s1 ORDER BY doc_id""".stripMargin)),

    // Domain-level curation rollup — crawl pipelines filter by DOMAIN
    // (spam domains, boilerplate farms), not by document: per-domain
    // doc counts, mean quality, and short-doc fraction drive the
    // allow/block decision. The synthetic domain derives from source
    // (f12's URL scheme); the mean is computed over per-doc quality
    // QUANTIZED to integer 1e-4 units, so the per-domain sums are
    // exact long arithmetic (float means are partial-agg-order
    // dependent and would never hash-match across engines).
    GQuery("x23_domain_rollup",
      (s, d) => {
        val toks = tokens(col("text"))
        Tables.documents(s, d)
          .select("doc_id", "source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("source"),
            size(toks).cast("long").as("n_toks"),
            hits(toks, stopwords).as("n_stop"))
          .select(col("source"), col("n_toks"),
            round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
              .as("quality"))
          .withColumn("domain", concat(col("source"), lit(".example.com")))
          .withColumn("q_micro", round(col("quality") * 10000).cast("long"))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("q_micro")) / (count(lit(1)) * 10000.0), 4)
              .as("mean_quality"),
            round(sum(when(col("n_toks") < 20, 1L).otherwise(0L)) * 1.0 /
              count(lit(1)), 4).as("short_frac"))
          .orderBy("domain")
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, source,
              |    len(string_split(trim(text), ' ')) AS n_toks,
              |    round(least(len(string_split(trim(text), ' ')) / 60.0,
              |          1.0) * 0.5 +
              |      (1.0 - ${sqlHits(stopwords)} * 1.0 /
              |       len(string_split(trim(text), ' '))) * 0.5, 4)
              |      AS quality
              |  FROM documents)
              |SELECT source || '.example.com' AS domain,
              |  count(*) AS n_docs,
              |  round(sum(CAST(round(quality * 10000) AS BIGINT)) /
              |        (count(*) * 10000.0), 4) AS mean_quality,
              |  round(sum(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) * 1.0
              |        / count(*), 4) AS short_frac
              |FROM q GROUP BY 1 ORDER BY domain""".stripMargin)),

    // X25: BPE merge training — the tokenizer-building kernel: start
    // from the character-symbolized weighted vocabulary, and per
    // iteration (a) count adjacent symbol pairs weighted by word
    // frequency, (b) take the top pair (count desc, then lexicographic
    // — fully deterministic), (c) merge it corpus-wide. Output: the
    // ordered merge table, i.e. the first 3 rules of the tokenizer.
    // Engine-exactness: `replace` is left-to-right non-overlapping in
    // both engines, so merge application agrees even on self-adjacent
    // pairs ('a a' in 'a a a' → 'aa a' in both). Scale posture: all
    // iteration state is the VOCABULARY frame (Heaps-law bounded, here
    // persisted once), the pair count is a map-side-combined keyed agg,
    // and each winning pair is a 1-row TakeOrdered broadcast — the
    // corpus itself is read once, at the initial word count.
    GQuery("x25_bpe_merges",
      (s, d) => {
        val w0 = graft.Caches.track(docsSpread(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .select(array_join(filter(split(col("tok"), ""),
            x => length(x) > 0), " ").as("w"), col("c")))
        def topPair(w: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          val sy = split(col("w"), " ")
          w.select(explode(zip_with(sy, slice(sy, lit(2), size(sy)),
              (a, b) => struct(a.as("pa"), b.as("pb")))).as("z"), col("c"))
            .filter(col("z.pb").isNotNull)
            .groupBy(col("z.pa").as("pa"), col("z.pb").as("pb"))
            .agg(sum(col("c")).as("n"))
            .orderBy(col("n").desc, col("pa"), col("pb")).limit(1)
        }
        // boundary-aware whole-symbol merge — see [[bpeMerge]]
        def merged(w: org.apache.spark.sql.DataFrame, top: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          w.crossJoin(broadcast(top))
            .select(bpeMerge(col("w"), col("pa"), col("pb")).as("w"),
              col("c"))
        val t1 = topPair(w0)
        val w1 = merged(w0, t1)
        val t2 = topPair(w1)
        val t3 = topPair(merged(w1, t2))
        t1.withColumn("step", lit(1L))
          .unionByName(t2.withColumn("step", lit(2L)))
          .unionByName(t3.withColumn("step", lit(3L)))
          .select(col("step"),
            concat(col("pa"), lit("+"), col("pb")).as("pair"), col("n"))
          .orderBy("step")
      },
      Some("""WITH v AS (
             |  SELECT tok, count(*) AS c FROM (
             |    SELECT unnest(string_split(trim(text), ' ')) AS tok
             |    FROM documents)
             |  WHERE tok <> '' GROUP BY 1),
             |w0 AS (SELECT array_to_string(list_filter(
             |         string_split_regex(tok, ''), x -> len(x) > 0), ' ')
             |         AS w, c FROM v),
             |p1 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w0)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t1 AS (SELECT pa, pb, n FROM p1
             |       ORDER BY n DESC, pa, pb LIMIT 1),
             |w1 AS (SELECT trim(replace(replace(
             |         ' ' || replace(w, ' ', '  ') || ' ',
             |         ' ' || pa || '  ' || pb || ' ',
             |         ' ' || pa || pb || ' '), '  ', ' ')) AS w, c
             |       FROM w0 CROSS JOIN t1),
             |p2 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w1)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t2 AS (SELECT pa, pb, n FROM p2
             |       ORDER BY n DESC, pa, pb LIMIT 1),
             |w2 AS (SELECT trim(replace(replace(
             |         ' ' || replace(w, ' ', '  ') || ' ',
             |         ' ' || pa || '  ' || pb || ' ',
             |         ' ' || pa || pb || ' '), '  ', ' ')) AS w, c
             |       FROM w1 CROSS JOIN t2),
             |p3 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w2)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t3 AS (SELECT pa, pb, n FROM p3
             |       ORDER BY n DESC, pa, pb LIMIT 1)
             |SELECT step, pa || '+' || pb AS pair, n FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, pa, pb, n FROM t1
             |  UNION ALL
             |  SELECT CAST(2 AS BIGINT), pa, pb, n FROM t2
             |  UNION ALL
             |  SELECT CAST(3 AS BIGINT), pa, pb, n FROM t3)
             |ORDER BY step""".stripMargin)),

    // X24: sequence packing — the physical layout step between curation
    // and the trainer: concatenate each source's token stream in doc_id
    // order and chunk it into fixed 512-token training sequences. Each
    // doc gets its sequence id, its offset inside that sequence, and a
    // boundary flag (docs that straddle a chunk cut — what attention
    // masking / best-fit packers care about). Distinct from x7 (which
    // SELECTS under a budget): this assigns every doc a physical slot.
    // Pure integer window arithmetic (exclusive running sum, div, mod)
    // — engine-exact. Scale posture: one window per SOURCE partition
    // (the packing unit), never a global funnel; at 100 TB sources
    // shard further by date/bucket and the window key gains that column.
    GQuery("x24_seq_pack",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        Tables.documents(s, d)
          .select("doc_id", "source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_toks"))
          .withColumn("cb", coalesce(sum(col("n_toks")).over(w), lit(0L)))
          .select(col("doc_id"), col("source"), col("n_toks"),
            expr("cb div 512").as("seq_id"),
            (col("cb") % 512).as("seq_offset"),
            (expr("(cb + n_toks - 1) div 512") > expr("cb div 512"))
              .as("crosses"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    CASE WHEN trim(text) = '' THEN 0
             |         ELSE CAST(len(string_split(trim(text), ' ')) AS BIGINT)
             |    END AS n_toks
             |  FROM documents),
             |w AS (SELECT doc_id, source, n_toks,
             |        CAST(coalesce(sum(n_toks) OVER (
             |          PARTITION BY source ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS BIGINT) AS cb
             |      FROM d)
             |SELECT doc_id, source, n_toks,
             |  cb // 512 AS seq_id,
             |  cb % 512 AS seq_offset,
             |  ((cb + n_toks - 1) // 512 > cb // 512) AS crosses
             |FROM w ORDER BY doc_id""".stripMargin)),

    // Mixture weighting — the planning step BEFORE x6's stratified
    // sampling: given per-source token masses and a uniform target
    // share, compute each source's sampling rate (capped at 1 — you
    // cannot sample more than exists) and the resulting expected
    // token count. The static form of mixture rebalancing (DoReMi et
    // al. learn the target; the pipeline mechanics are the same). One
    // corpus pass + arithmetic on a |sources|-row frame.
    GQuery("x22_mixture_weights",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .select("source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("source"), size(tokens(col("text"))).cast("long")
            .as("n_toks"))
          .groupBy("source").agg(sum("n_toks").as("toks"))
        val tot = bySrc.agg(sum("toks").as("total"),
          count(lit(1)).as("n_sources"))
        bySrc.crossJoin(broadcast(tot))
          .select(col("source"), col("toks"),
            round(col("toks") * 1.0 / col("total"), 4).as("share"),
            round(least(lit(1.0),
              (col("total") * 1.0 / col("n_sources")) / col("toks")), 4)
              .as("rate"))
          .withColumn("exp_toks",
            round(col("toks") * col("rate")).cast("long"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT source,
             |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
             |      AS toks
             |  FROM documents GROUP BY 1),
             |t AS (SELECT sum(toks) AS total, count(*) AS n_sources
             |      FROM b)
             |SELECT source, toks,
             |  round(toks * 1.0 / total, 4) AS share,
             |  round(least(1.0, (total * 1.0 / n_sources) / toks), 4)
             |    AS rate,
             |  CAST(round(toks * round(least(1.0,
             |    (total * 1.0 / n_sources) / toks), 4)) AS BIGINT)
             |    AS exp_toks
             |FROM b CROSS JOIN t ORDER BY source""".stripMargin)),

    // Corpus-overlap estimation between SOURCES from MinHash sketches
    // — the dataset-level question ("how much of source A is already
    // in source B?") a team answers before paying for a merge +
    // full dedup run. Each source folds to 64 lane-minima over doc
    // fingerprints (map-side combined, 64·|sources| rows total);
    // estimated Jaccard between two sources = fraction of agreeing
    // lanes. Sketches, not documents, cross the final join — at
    // 100 TB the comparison costs the scan, nothing pairwise.
    GQuery("x21_corpus_overlap",
      (s, d) => corpusOverlap(
        Tables.documents(s, d).select("source", "text")).orderBy("sa", "sb"),
      Some("""WITH d AS (SELECT source, md5(text) AS fp FROM documents),
             |l AS (SELECT unnest(range(64)) AS lane),
             |h AS (SELECT source, lane,
             |        min(('0x' || substr(md5(lane::VARCHAR || '#' || fp),
             |          1, 12))::BIGINT) AS mh
             |      FROM d CROSS JOIN l GROUP BY 1, 2)
             |SELECT a.source AS sa, b.source AS sb,
             |  round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
             |        / 64.0, 4) AS est_jac
             |FROM h a JOIN h b ON a.lane = b.lane AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY sa, sb""".stripMargin)),

    // Bigram-LM scoring — the context-sensitive upgrade of x12's
    // unigram NLL (the direction CCNet's 5-gram KenLM filter takes):
    // per-doc mean −ln p(w2 | w1) with p = c(w1 w2) / c(w1·). Both
    // log terms are quantized to integer micro-nats AT THE VOCABULARY
    // LEVEL and summed separately per doc, so every per-doc value is
    // exact long arithmetic. The context count is derived FROM the
    // bigram vocabulary (one vocab-level aggregation), not a second
    // corpus pass; the corpus-sized work is one map-side-combined
    // groupBy and one keyed join.
    GQuery("x20_bigram_lm",
      (s, d) => {
        val bg = docsSpread(s, d)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(wordNgrams(col("t"), 2)).as("bg"))
        // persisted (bigram-vocab-bounded): bgFreq feeds firstFreq AND
        // the vocab join — unpersisted, each consumer re-ran the
        // corpus bigram explode (3 evaluations total)
        val bgFreq = graft.Caches.track(
          bg.groupBy("bg").agg(count(lit(1)).as("c_ab")))
        val firstFreq = bgFreq
          .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
          .agg(sum("c_ab").as("c_a"))
        val vocab = bgFreq
          .withColumn("w1", substring_index(col("bg"), " ", 1))
          .join(firstFreq, Seq("w1"))
          .select(col("bg"),
            round(log(col("c_ab").cast("double")) * 1e6).cast("long")
              .as("lp_ab"),
            round(log(col("c_a").cast("double")) * 1e6).cast("long")
              .as("lp_a"))
        bg.join(broadcast(vocab), Seq("bg"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("lp_a") - col("lp_ab")).as("s_micro"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("s_micro") / (col("n_bigrams") * 1e6), 3).as("nll"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(trim(text), ' ')
             |             AS tk FROM documents),
             |b AS (SELECT doc_id,
             |        unnest([tk[i] || ' ' || tk[i+1]
             |                for i in range(1, len(tk))]) AS bg
             |      FROM t WHERE len(tk) >= 2),
             |f AS (SELECT bg, count(*) AS c_ab FROM b GROUP BY 1),
             |ff AS (SELECT string_split(bg, ' ')[1] AS w1,
             |         sum(c_ab) AS c_a FROM f GROUP BY 1),
             |v AS (SELECT bg,
             |        CAST(round(ln(c_ab) * 1e6) AS BIGINT) AS lp_ab,
             |        CAST(round(ln(c_a) * 1e6) AS BIGINT) AS lp_a
             |      FROM f JOIN ff ON string_split(f.bg, ' ')[1] = ff.w1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(sum(lp_a - lp_ab) * 1.0 / (count(*) * 1e6), 3)
             |    AS nll
             |FROM b JOIN v USING (bg)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Character-entropy gibberish scoring: per-doc Shannon entropy
    // H = ln(n) − (Σ c·ln c)/n over the character distribution — the
    // Gopher/CCNet-family signal orthogonal to x2's ratios: random
    // byte noise scores HIGH, repeated-character runs score LOW, and
    // both tails are cut. ln(c) is a deterministic function of the
    // INTEGER count, quantized to micro-nats per (doc, char) row
    // (x12's trick one level down), so the per-doc sum is exact long
    // arithmetic. One explode + two keyed aggregations, all map-side
    // combined.
    GQuery("x17_char_entropy",
      (s, d) => docsSpread(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
        .withColumn("lnc_micro",
          round(log(col("c").cast("double")) * 1e6).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_chars"),
          count(lit(1)).as("n_distinct_chars"),
          sum(col("c") * col("lnc_micro")).as("s_micro"))
        .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
          round((round(log(col("n_chars").cast("double")) * 1e6) -
            col("s_micro") / col("n_chars")) / 1e6, 4).as("entropy"))
        .orderBy("doc_id"),
      Some("""WITH ch AS (
             |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
             |  FROM documents WHERE doc_id % 10 = 0),
             |cc AS (SELECT doc_id, ch, count(*) AS c
             |       FROM ch WHERE len(ch) > 0 GROUP BY 1, 2),
             |q AS (SELECT doc_id, c,
             |        CAST(round(ln(c) * 1e6) AS BIGINT) AS lnc_micro
             |      FROM cc)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
             |  count(*) AS n_distinct_chars,
             |  round((round(ln(sum(c)) * 1e6) -
             |    sum(c * lnc_micro) * 1.0 / sum(c)) / 1e6, 4) AS entropy
             |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf · ln(N/df). The idf is quantized to integer micro-nats AT THE
    // VOCABULARY LEVEL (x12's trick) so every per-doc score is exact
    // long arithmetic — order-independent across partitions and
    // engines. Shape: one map-side-combined (doc, tok) count, one
    // vocabulary aggregate (Heaps-law bounded, broadcast — at open-web
    // scale swap for the co-partitioned join), one per-doc top-k
    // window on the (doc, tok) frame — partitioned by doc_id, so no
    // global funnel.
    GQuery("x16_tfidf",
      (s, d) => {
        val tf = docsSpread(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        // corpus size folded into the plan as a 1-row broadcast (a
        // driver-side .count() here was a whole extra scan + action)
        val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val idf = tf.groupBy("tok").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .select(col("tok"),
            round(log(col("n_docs").cast("double") / col("df")) * 1e6)
              .cast("long").as("idf_micro"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("score_micro").desc, col("tok"))
        tf.join(broadcast(idf), Seq("tok"))
          .select(col("doc_id"), col("tok"),
            (col("tf") * col("idf_micro")).as("score_micro"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3 && col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("rk").cast("long").as("rk"),
            col("tok"), col("score_micro"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |idf AS (SELECT tok,
             |          CAST(round(ln(n_docs / count(*)) * 1e6) AS BIGINT)
             |            AS idf_micro
             |        FROM tf CROSS JOIN n
             |        GROUP BY tok, n_docs),
             |scored AS (
             |  SELECT doc_id, tok, tf * idf_micro AS score_micro,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf * idf_micro DESC, tok) AS rk
             |  FROM tf JOIN idf USING (tok))
             |SELECT doc_id, rk, tok, score_micro
             |FROM scored WHERE rk <= 3 AND doc_id % 10 = 0
             |ORDER BY doc_id, rk""".stripMargin)),

    // Data-quality expectation report (deequ-style): one pass over the
    // fact computes row count, key uniqueness, range violations,
    // domain-membership violations, and (via one left join) foreign-key
    // orphans — the gate a 100 TB ingest runs BEFORE data enters the
    // lake. Everything folds into a single aggregation (map-side
    // combined, one row out); the referential check is the only
    // shuffle and it is the join a validator cannot avoid.
    GQuery("x15_expectations",
      (s, d) => graft.ops.Relational.expectationsOf(
        Tables.orders(s, d), Tables.customer(s, d)),
      Some("""SELECT count(*) AS n_rows,
             |  count(*) - count(DISTINCT o_orderkey) AS n_dup_keys,
             |  CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_price_range_viol,
             |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_null_date,
             |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
             |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_orphan_custkey
             |FROM orders LEFT JOIN customer
             |  ON o_custkey = c_custkey""".stripMargin)),

    // Count-min sketch heavy hitters: a (d=4 × w=512) counter matrix
    // over the token stream, probed with the exact top-20 tokens so the
    // sketch's one-sided overestimate sits next to ground truth in the
    // output. The matrix is a plain keyed groupBy whose OUTPUT is
    // bounded at d·w rows regardless of corpus size — the mergeable
    // frequency sketch that answers "how often does token X occur"
    // over 100 TB without materializing the vocabulary. Probe lookups
    // ride a broadcast of 20·d cells; the top-k itself is
    // TakeOrderedAndProject, never a global sort. Hashes are the
    // portable 48-bit md5 prefix (x10's trick) so DuckDB rebuilds the
    // identical matrix bit-for-bit.
    GQuery("x14_countmin",
      (s, d) => {
        val dRows = 4; val w = 512
        def cellsOf(tok: Column): Column =
          graft.functions.cmsCells(tok, dRows, w)
        val toks = docsSpread(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
        val counters = toks
          .select(explode(cellsOf(col("tok"))).as("cell"))
          .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
          .agg(count(lit(1)).as("cnt"))
        val probes = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
        val probeCells = probes
          .select(col("tok"), col("exact_cnt"),
            explode(cellsOf(col("tok"))).as("cell"))
          .select(col("tok"), col("exact_cnt"),
            col("cell.r").as("r"), col("cell.c").as("c"))
        counters.join(broadcast(probeCells), Seq("r", "c"))
          .groupBy("tok")
          .agg(max(col("exact_cnt")).as("exact_cnt"),
            min(col("cnt")).as("cms_est"))
          .orderBy(col("exact_cnt").desc, col("tok"))
      },
      Some("""WITH t AS (
             |  SELECT unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents),
             |i AS (SELECT unnest([0, 1, 2, 3]) AS r),
             |cells AS (
             |  SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' ||
             |    tok), 1, 12))::BIGINT % 512 AS c, count(*) AS cnt
             |  FROM t CROSS JOIN i GROUP BY 1, 2),
             |probes AS (
             |  SELECT tok, count(*) AS exact_cnt FROM t GROUP BY 1
             |  ORDER BY exact_cnt DESC, tok LIMIT 20),
             |pc AS (
             |  SELECT tok, exact_cnt, r,
             |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '#' ||
             |      tok), 1, 12))::BIGINT % 512 AS c
             |  FROM probes CROSS JOIN i)
             |SELECT pc.tok AS tok, max(pc.exact_cnt) AS exact_cnt,
             |  min(cells.cnt) AS cms_est
             |FROM pc JOIN cells USING (r, c)
             |GROUP BY pc.tok
             |ORDER BY exact_cnt DESC, tok""".stripMargin)),

    // X29: BPE ENCODING — the application half of x25's training: run
    // the learned 3-rule merge table over the corpus and report each
    // doc's token-count compression. The scale-critical design point:
    // encode TYPES, not tokens — the merge rules are applied to the
    // Heaps-law-bounded VOCABULARY frame (each distinct word encoded
    // once), and per-doc totals come from joining the corpus token
    // stream to that encoded vocabulary. A 100 TB corpus has billions
    // of token OCCURRENCES but a ~10^7-type vocabulary; re-running the
    // merge replace per occurrence would be 10^4× the string work.
    // Training state and application both replay exactly in the
    // oracle (same CTE chain as x25, keeping the tok key).
    GQuery("x29_bpe_encode",
      (s, d) => bpeEncodeDocs(docsSpread(s, d)),
      Some("""WITH v AS (
             |  SELECT tok, count(*) AS c FROM (
             |    SELECT unnest(string_split(trim(text), ' ')) AS tok
             |    FROM documents)
             |  WHERE tok <> '' GROUP BY 1),
             |w0 AS (SELECT tok, array_to_string(list_filter(
             |         string_split_regex(tok, ''), x -> len(x) > 0), ' ')
             |         AS w, c FROM v),
             |p1 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w0)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t1 AS (SELECT pa, pb FROM p1
             |       ORDER BY n DESC, pa, pb LIMIT 1),
             |w1 AS (SELECT tok, trim(replace(replace(
             |         ' ' || replace(w, ' ', '  ') || ' ',
             |         ' ' || pa || '  ' || pb || ' ',
             |         ' ' || pa || pb || ' '), '  ', ' ')) AS w, c
             |       FROM w0 CROSS JOIN t1),
             |p2 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w1)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t2 AS (SELECT pa, pb FROM p2
             |       ORDER BY n DESC, pa, pb LIMIT 1),
             |w2 AS (SELECT tok, trim(replace(replace(
             |         ' ' || replace(w, ' ', '  ') || ' ',
             |         ' ' || pa || '  ' || pb || ' ',
             |         ' ' || pa || pb || ' '), '  ', ' ')) AS w, c
             |       FROM w1 CROSS JOIN t2),
             |p3 AS (SELECT z[1] AS pa, z[2] AS pb,
             |         CAST(sum(c) AS BIGINT) AS n
             |       FROM (SELECT unnest(list_zip(string_split(w, ' '),
             |               string_split(w, ' ')[2:])) AS z, c FROM w2)
             |       WHERE z[2] IS NOT NULL GROUP BY 1, 2),
             |t3 AS (SELECT pa, pb FROM p3
             |       ORDER BY n DESC, pa, pb LIMIT 1),
             |w3 AS (SELECT tok, trim(replace(replace(
             |         ' ' || replace(w, ' ', '  ') || ' ',
             |         ' ' || pa || '  ' || pb || ' ',
             |         ' ' || pa || pb || ' '), '  ', ' ')) AS w, c
             |       FROM w2 CROSS JOIN t3),
             |enc AS (SELECT tok, CAST(len(string_split(w, ' ')) AS BIGINT)
             |          AS n_sym FROM w3),
             |tk AS (SELECT doc_id, tok FROM (
             |         SELECT doc_id,
             |           unnest(string_split(trim(text), ' ')) AS tok
             |         FROM documents)
             |       WHERE tok <> '')
             |SELECT doc_id, count(*) AS n_toks,
             |  CAST(sum(len(tok)) AS BIGINT) AS n_chars,
             |  CAST(sum(n_sym) AS BIGINT) AS n_bpe,
             |  round(sum(n_sym) * 1.0 / sum(len(tok)), 4) AS ratio
             |FROM tk JOIN enc USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // X30: overlapping-window chunking — the RAG / long-context
    // preprocessing step: cut each doc's token stream into fixed
    // 64-token windows every 48 tokens (16-token overlap, so no
    // retrieval-relevant span is ever split across a hard boundary
    // without also appearing whole in a neighbor). Distinct from x24
    // (which packs DISJOINT trainer sequences across docs): chunks here
    // are per-doc, overlap by design, and carry a content fingerprint.
    // Pure array arithmetic — sequence/slice are codegen'd, one explode
    // per doc, no shuffle at all until the final presentation sort; at
    // 100 TB this is an embarrassingly parallel map stage whose output
    // feeds the embedding UDF batch-wise. Chunk identity = md5 of the
    // joined window (engine-exact), so downstream exact-dedup of
    // chunks (d1 shape) composes directly.
    GQuery("x30_chunk_overlap",
      (s, d) => chunkOverlap(docsSpread(s, d), 64, 48),
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(trim(text), ' ') AS t
             |  FROM documents WHERE trim(text) <> ''),
             |c AS (SELECT doc_id, st // 48 AS chunk_idx,
             |        t[st + 1 : st + 64] AS ch
             |      FROM (SELECT doc_id, t,
             |              unnest(generate_series(0, len(t) - 1, 48))
             |                AS st
             |            FROM d))
             |SELECT doc_id, chunk_idx,
             |  CAST(len(ch) AS BIGINT) AS n_chunk_toks,
             |  md5(array_to_string(ch, ' ')) AS chunk_md5,
             |  ch[1] AS first_tok, ch[len(ch)] AS last_tok
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // X31: deterministic weighted sampling (Efraimidis–Spirakis A-ES):
    // keep the k=5 docs per source with the smallest -ln(u)/w, where w
    // is the doc's token count and u is a uniform derived from
    // md5(doc_id) — i.e. a reproducible weighted-without-replacement
    // sample whose inclusion probability is proportional to token
    // mass. This is the mechanism behind "sample 1% of the corpus,
    // token-weighted" that x22's mixture planning assumes. Engine
    // exactness: u comes from the first 48 md5 bits (the x27 hash
    // bridge), -ln(u) is micro-quantized to an integer BEFORE the
    // division (the x27 ln-rounding pattern), and the sort key
    // lm/w is an exact-integer IEEE division — identical doubles in
    // both engines, ties impossible in 48 bits. Scale posture: one
    // window per SOURCE stratum (same sharding story as x24); the
    // heap-based per-partition top-k refinement is what
    // TakeOrderedAndProject already does under the window's rank
    // filter.
    GQuery("x31_weighted_sample",
      (s, d) => weightedSample(
        docsSpread2(s, d)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("w"))
          .filter(col("w") > 0), 5),
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS w
             |  FROM documents WHERE trim(text) <> ''),
             |h AS (SELECT doc_id, source, w,
             |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             |          ::BIGINT AS h
             |      FROM d),
             |k AS (SELECT doc_id, source, w,
             |        CAST(round(-ln((h + 1) / 281474976710656.0) * 1e6)
             |          AS BIGINT) AS lm
             |      FROM h),
             |r AS (SELECT doc_id, source, w, lm,
             |        row_number() OVER (PARTITION BY source
             |          ORDER BY CAST(lm AS DOUBLE) / w, doc_id) AS rk
             |      FROM k)
             |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, w, lm
             |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin)),

    // X32: Unicode NFC normalization — the zeroth step of web-scale text
    // curation (crawled text arrives with decomposed accent sequences;
    // every downstream exact-hash dedup / token count silently fragments
    // unless the corpus is canonicalized first). The harness corpus is
    // ASCII, so the query PLANTS decomposed sequences deterministically
    // in both engines (every 'e' gains U+0301 combining acute), then
    // normalizes with the native codegen'd NfcNormalizeExpr (JDK UAX #15)
    // vs DuckDB's nfc_normalize. n_composed = codepoints removed by
    // composition = planted accent count — both engines count length in
    // codepoints. Scale posture: map-only over the scan (zero shuffles
    // before the output sort); the isNormalized fast path makes the
    // already-clean common case a read-only scan of the UTF-8 bytes.
    GQuery("x32_nfc_normalize",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("dirty",
          expr("replace(text, 'e', 'e\u0301')"))
        .withColumn("norm",
          graft.plans.NativeFunctions.nfcNormalize(col("dirty")))
        .select(col("doc_id"), col("norm"),
          (length(col("dirty")) - length(col("norm")))
            .cast("long").as("n_composed"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    replace(text, 'e', 'e' || chr(769)) AS dirty
             |  FROM documents)
             |SELECT doc_id, nfc_normalize(dirty) AS norm,
             |  CAST(length(dirty) - length(nfc_normalize(dirty)) AS BIGINT)
             |    AS n_composed
             |FROM d ORDER BY doc_id""".stripMargin)),

    // X33: supervised quality probe — TRAIN a linear document filter
    // distributively, the missing member of the curation family (x26
    // scores by LM perplexity buckets, x27 reweights by DSIR, x28 gates
    // by Gopher rules; production pipelines ALSO train a cheap hashed
    // linear classifier on weak labels and score the corpus with it,
    // fastText-style). Features are a 64-cell hashed bag-of-words
    // computed with engine-portable integer arithmetic
    // ((len·31 + first-char-code) mod 64 — same expression in DuckDB),
    // the weak label is lang='en', and training is two batch PERCEPTRON
    // steps with unit learning rate: w ← w + Σ_docs (y − ŷ)·x, kept
    // INTEGER-exact end to end so the oracle replays it bit-for-bit
    // (no sigmoid floats whose rounding differs between engines; the
    // perceptron update is the integer-exact member of the GLM family).
    // Scale shape: the feature frame is built once and persisted (the
    // only corpus-sized intermediate); each training step is the
    // weight frame (64 rows — broadcast, never shuffled) joined into
    // the feature frame plus ONE map-side-combined keyed sum. Adding
    // iterations or widening to 2^20 cells changes constant factors,
    // not the plan: gradient aggregation is exactly the shape AllReduce
    // does on a parameter server, expressed as a Spark agg.
    GQuery("x33_linear_probe",
      (s, d) => probeWeights(probeFeats(s, d)).orderBy("f"),
      Some(ProbeCtes +
        """
          |SELECT fs.f,
          |  coalesce(w1.w1, 0) AS w1,
          |  coalesce(w1.w1, 0) + coalesce(d2.dw, 0) AS w2
          |FROM (SELECT DISTINCT f FROM feats) fs
          |LEFT JOIN w1 ON fs.f = w1.f
          |LEFT JOIN d2 ON fs.f = d2.f
          |ORDER BY fs.f""".stripMargin)),

    // X34: the EVALUATE half of x33 — score every document under the
    // trained w2 weights and emit the integer-exact confusion matrix
    // (y, yhat, n) plus per-cell corpus share in basis points. The
    // train→evaluate loop is what a curation pipeline actually ships:
    // x33's weights gate the corpus, x34's matrix is the quality
    // report that decides whether they may. One extra consumer of the
    // persisted feature frame: the 64-row weight frame broadcasts into
    // one keyed scoring agg, then the 4-cell matrix is a second tiny
    // agg — no new corpus-sized state anywhere.
    GQuery("x34_probe_eval",
      (s, d) => {
        val feats = probeFeats(s, d)
        val wt = probeWeights(feats).select("f", "w2")
        val scored = feats
          .join(broadcast(wt), Seq("f"), "left")
          .groupBy("doc_id", "y")
          .agg(sum(col("c") * coalesce(col("w2"), lit(0L))).as("score"))
          .select(col("y"),
            when(col("score") > 0, 1L).otherwise(0L).as("yhat"))
        val total = scored.agg(count(lit(1)).as("total"))
        scored.groupBy("y", "yhat").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(total))
          .select(col("y"), col("yhat"), col("n"),
            expr("(n * 10000) div total").as("share_bp"))
          .orderBy("y", "yhat")
      },
      Some(ProbeCtes +
        """,
          |wt AS (SELECT fs.f,
          |         coalesce(w1.w1, 0) + coalesce(d2.dw, 0) AS w2
          |       FROM (SELECT DISTINCT f FROM feats) fs
          |       LEFT JOIN w1 ON fs.f = w1.f
          |       LEFT JOIN d2 ON fs.f = d2.f),
          |ev AS (SELECT fe.doc_id, fe.y,
          |         CASE WHEN coalesce(sum(fe.c * wt.w2), 0) > 0
          |              THEN 1 ELSE 0 END AS yhat
          |       FROM feats fe LEFT JOIN wt ON fe.f = wt.f
          |       GROUP BY 1, 2),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ev)
          |SELECT CAST(y AS BIGINT) AS y, CAST(yhat AS BIGINT) AS yhat,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST((count(*) * 10000) // tot.total AS BIGINT) AS share_bp
          |FROM ev, tot
          |GROUP BY y, yhat, tot.total
          |ORDER BY y, yhat""".stripMargin)),

    // X35: deterministic global shuffle + token-balanced shard
    // assignment — the pretraining shard-writer step (cf. Dolma /
    // RedPajama): order the corpus by a seeded hash (reproducible
    // "random" order, no RNG state), then greedily pack docs
    // doc-atomically into ~4096-token shards in that order. The
    // scale-critical piece is the GLOBAL cumulative token count
    // without a global single-task window: a distributed prefix sum —
    // (1) per-doc cumsum windows partitioned by the 4096-way
    // order-preserving hash-prefix bucket (parallel), (2) bucket
    // totals windowed on a frame PROVABLY bounded at 4096 rows
    // (groupBy output, not data-sized), (3) offsets broadcast back.
    // Same exactness story as x31: 48-bit md5 keys are tie-free and
    // integer arithmetic end-to-end. Output is the per-shard manifest
    // (doc/token counts + hash-key range) — what a writer would fan
    // out to per-shard tasks.
    GQuery("x35_shard_shuffle",
      (s, d) => shardShuffle(docsSpread(s, d), 4096L),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS w,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             |      ::BIGINT AS h
             |  FROM documents WHERE trim(text) <> ''),
             |c AS (SELECT doc_id, w, h,
             |        CAST(coalesce(sum(w) OVER (ORDER BY h
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0) AS BIGINT) AS cb
             |      FROM d),
             |s AS (SELECT h, w, cb // 4096 AS shard FROM c)
             |SELECT CAST(shard AS BIGINT) AS shard,
             |  count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_toks,
             |  CAST(min(h) AS BIGINT) AS h_lo,
             |  CAST(max(h) AS BIGINT) AS h_hi
             |FROM s GROUP BY shard ORDER BY shard""".stripMargin)),

    // X36: BM25 top-k retrieval — the LEXICAL retrieval baseline next
    // to the n-block's ANN (and n9's late-interaction re-rank): score =
    // Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), k1=1.2,
    // b=0.75, idf = ln((N−df+½)/(df+½)+1) (Robertson/Sparck Jones,
    // always-positive form). The query is itself derived
    // deterministically from the corpus (df-ranks 10–14 — frequent
    // enough to hit many docs, below the stopword saturation zone).
    // Engine exactness: idf micro-quantized at the vocabulary level
    // (x16's trick) and the length normalization folded into an
    // integer denominator — per-term scores are exact BIGINT div
    // arithmetic, identical across engines. Scale posture: tf/dl are
    // keyed aggregates; the df-rank window runs on the Heaps-law-
    // bounded vocabulary (x16's broadcast justification); the 5-term
    // query frame broadcasts; top-10 is TakeOrderedAndProject, never a
    // global sort.
    GQuery("x36_bm25",
      (s, d) => bm25TopK(docsSpread(s, d), 10, 14, 10),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents WHERE trim(text) <> ''),
             |tf AS (SELECT doc_id, tok, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |         CAST(round(avg(dl) * 1e3) AS BIGINT) AS avgdl_milli
             |       FROM dl),
             |q AS (SELECT tok, avgdl_milli,
             |        CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |          * 1e6) AS BIGINT) AS idf_micro
             |      FROM (SELECT tok, count(*) AS df,
             |              row_number() OVER (ORDER BY count(*) DESC, tok)
             |                AS qrk
             |            FROM tf GROUP BY tok) v CROSS JOIN st
             |      WHERE qrk BETWEEN 10 AND 14),
             |sc AS (SELECT tf.doc_id,
             |         (q.idf_micro * tf.tf * 2200000) //
             |           (tf.tf * 1000000 + 300000 +
             |            CAST(round(9e8 * dl.dl / q.avgdl_milli) AS BIGINT))
             |           AS term_micro
             |       FROM tf JOIN q USING (tok) JOIN dl USING (doc_id))
             |SELECT doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro,
             |  count(*) AS n_terms_hit
             |FROM sc GROUP BY doc_id
             |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin)),

    // X37: Bradley-Terry preference aggregation — the pairwise-
    // preference op of an RLHF data pipeline: comparisons (here:
    // adjacent-doc quality duels between different sources) aggregate
    // to per-entity strengths via 3 unrolled MM iterations
    // p_i ← W_i / Σ_j n_ij/(p_i+p_j) (Hunter 2004). Engine exactness:
    // strengths live in integer micro-units and every iteration step
    // is BIGINT `div` arithmetic — no float drift across 3 rounds.
    // Scale posture: the comparison derivation is one data-sized keyed
    // join; everything after (pair counts, win totals, iterations)
    // runs on |entities|²-bounded frames that broadcast — the standard
    // shape when entities ≪ comparisons (RLHF: models/policies vs
    // millions of human judgments).
    GQuery("x37_bt_rank",
      (s, d) => btRank(s, d, iters = 3),
      Some(s"""WITH q AS (
              |  SELECT doc_id, source,
              |    CAST(round(round(least(len(string_split(trim(text), ' '))
              |        / 60.0, 1.0) * 0.5 +
              |      (1.0 - ${sqlHits(stopwords)} * 1.0 /
              |       len(string_split(trim(text), ' '))) * 0.5, 4)
              |      * 10000) AS BIGINT) AS qm
              |  FROM documents),
              |comp AS (
              |  SELECT a.source AS sa, b.source AS sb,
              |    CASE WHEN a.qm > b.qm THEN a.source
              |         WHEN b.qm > a.qm THEN b.source
              |         ELSE least(a.source, b.source) END AS win
              |  FROM q a JOIN q b ON b.doc_id = a.doc_id + 1
              |  WHERE a.source <> b.source),
              |pair AS (SELECT least(sa, sb) AS u, greatest(sa, sb) AS v,
              |           CAST(count(*) AS BIGINT) AS n
              |         FROM comp GROUP BY 1, 2),
              |edges AS (SELECT u AS i, v AS j, n FROM pair
              |          UNION ALL SELECT v, u, n FROM pair),
              |wins AS (SELECT win AS i, CAST(count(*) AS BIGINT) AS w
              |         FROM comp GROUP BY 1),
              |p0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS pm
              |       FROM edges),
              |s1 AS (SELECT e.i, CAST(sum((e.n * 1000000000000)
              |           // (pi.pm + pj.pm)) AS BIGINT) AS sm
              |       FROM edges e JOIN p0 pi ON pi.i = e.i
              |         JOIN p0 pj ON pj.i = e.j GROUP BY 1),
              |p1 AS (SELECT s1.i,
              |         (coalesce(w.w, 0) * 1000000000000) // sm AS pm
              |       FROM s1 LEFT JOIN wins w ON w.i = s1.i),
              |s2 AS (SELECT e.i, CAST(sum((e.n * 1000000000000)
              |           // (pi.pm + pj.pm)) AS BIGINT) AS sm
              |       FROM edges e JOIN p1 pi ON pi.i = e.i
              |         JOIN p1 pj ON pj.i = e.j GROUP BY 1),
              |p2 AS (SELECT s2.i,
              |         (coalesce(w.w, 0) * 1000000000000) // sm AS pm
              |       FROM s2 LEFT JOIN wins w ON w.i = s2.i),
              |s3 AS (SELECT e.i, CAST(sum((e.n * 1000000000000)
              |           // (pi.pm + pj.pm)) AS BIGINT) AS sm
              |       FROM edges e JOIN p2 pi ON pi.i = e.i
              |         JOIN p2 pj ON pj.i = e.j GROUP BY 1),
              |p3 AS (SELECT s3.i,
              |         (coalesce(w.w, 0) * 1000000000000) // sm AS pm
              |       FROM s3 LEFT JOIN wins w ON w.i = s3.i)
              |SELECT p3.i AS source,
              |  CAST(coalesce(w.w, 0) AS BIGINT) AS wins,
              |  CAST(p3.pm AS BIGINT) AS strength_micro,
              |  CAST(row_number() OVER (ORDER BY p3.pm DESC, p3.i)
              |    AS BIGINT) AS rnk
              |FROM p3 LEFT JOIN wins w ON w.i = p3.i
              |ORDER BY rnk""".stripMargin)),

    // X38: majority-vote label aggregation — the labeled-data twin of
    // x37's pairwise preferences: N noisy annotations per item reduce
    // to a consensus label plus inter-annotator agreement statistics
    // (the quality gate every human-labeled training set passes
    // through before a classifier sees it). Annotators are synthetic
    // but deterministic (md5-derived, 80% true-label fidelity), so the
    // oracle replays the identical noise. Scale posture: one explode
    // (×5) + two keyed aggregates; the per-doc vote window partitions
    // by doc_id — nothing global, nothing annotator-unbounded.
    GQuery("x38_label_vote",
      (s, d) => voteFromAnnotations(annotations(s, d)),
      Some("""WITH ann AS (
             |  SELECT d.doc_id, d.lang, d.source,
             |    CASE WHEN ('0x' || substr(md5('ann_' || r.range || '_'
             |           || d.doc_id), 1, 8))::BIGINT % 10 < 8
             |         THEN d.lang ELSE 'xx' END AS lbl
             |  FROM documents d JOIN range(5) r ON true),
             |maj AS (
             |  SELECT doc_id, lang, source, lbl, cnt FROM (
             |    SELECT doc_id, lang, source, lbl,
             |      CAST(count(*) AS BIGINT) AS cnt,
             |      row_number() OVER (PARTITION BY doc_id
             |        ORDER BY count(*) DESC, lbl) AS rn
             |    FROM ann GROUP BY 1, 2, 3, 4)
             |  WHERE rn = 1)
             |SELECT source, count(*) AS n_docs,
             |  round(sum(cnt) / (5.0 * count(*)), 4) AS agreement,
             |  round(sum(CASE WHEN cnt = 5 THEN 1 ELSE 0 END) * 1.0
             |        / count(*), 4) AS pct_unanimous,
             |  round(sum(CASE WHEN lbl = lang THEN 1 ELSE 0 END) * 1.0
             |        / count(*), 4) AS maj_acc
             |FROM maj GROUP BY source ORDER BY source""".stripMargin)),

    // X39: k-anonymity audit + one generalization pass — the privacy
    // release gate next to x5's PII scrub: rows grouped by their
    // quasi-identifier tuple (lang, source, length bucket) form
    // equivalence classes; classes of size < k are re-identification
    // risks and get ONE attribute generalization (4x coarser length
    // bucket), after which they either clear k or stay flagged for
    // suppression. Scale posture: two keyed aggregates — the level-1
    // regroup runs on the CLASS frame (already aggregated), never
    // re-touching rows; the class frame is tracked across its two
    // consumers.
    GQuery("x39_kanon",
      (s, d) => {
        val cls0 = graft.Caches.track(
          graft.Tables.documents(s, d)
            .select("lang", "source", "n_chars")
            .repartition(s.sparkContext.defaultParallelism)
            .withColumn("b0", expr("n_chars div 100"))
            .groupBy("lang", "source", "b0")
            .agg(count(lit(1)).as("n")))
        val ok = cls0.filter(col("n") >= 5)
          .select(col("lang"), col("source"), lit(0L).as("lvl"),
            col("b0").as("bucket"), col("n"), lit(true).as("k_ok"))
        val gen = cls0.filter(col("n") < 5)
          .withColumn("b1", expr("b0 div 4"))
          .groupBy("lang", "source", "b1")
          .agg(sum(col("n")).as("n"))
          .select(col("lang"), col("source"), lit(1L).as("lvl"),
            col("b1").as("bucket"), col("n"),
            (col("n") >= 5).as("k_ok"))
        ok.union(gen).orderBy("lang", "source", "lvl", "bucket")
      },
      Some("""WITH cls0 AS (
             |  SELECT lang, source, n_chars // 100 AS b0,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2, 3),
             |ok AS (SELECT lang, source, CAST(0 AS BIGINT) AS lvl,
             |         CAST(b0 AS BIGINT) AS bucket, n, true AS k_ok
             |       FROM cls0 WHERE n >= 5),
             |gen AS (SELECT lang, source, CAST(1 AS BIGINT) AS lvl,
             |          CAST(b0 // 4 AS BIGINT) AS bucket,
             |          CAST(sum(n) AS BIGINT) AS n
             |        FROM cls0 WHERE n < 5 GROUP BY 1, 2, 4)
             |SELECT * FROM (
             |  SELECT lang, source, lvl, bucket, n, k_ok FROM ok
             |  UNION ALL
             |  SELECT lang, source, lvl, bucket, n, n >= 5 AS k_ok
             |  FROM gen)
             |ORDER BY lang, source, lvl, bucket""".stripMargin)),

    // X40: hybrid-retrieval fusion — the RAG serving shape: x36's
    // lexical BM25 list and an embedding-cosine semantic list
    // (harness embeddings are doc-aligned: vec_id = doc_id) merge by
    // reciprocal-rank fusion score Σ 1/(60+rank) (Cormack et al.'s
    // RRF constant), in integer micro-units via BIGINT div so the
    // fusion is engine-exact. Scale posture: each list is a partial
    // top-k (TakeOrderedAndProject — never a global sort of scores);
    // rank windows run on the ≤50-row result frames; the fusion join
    // is 50x50-bounded; final top-10 is again ordered-limit.
    GQuery("x40_rrf_fusion",
      (s, d) => {
        val wl = org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))
        val lex = bm25TopK(docsSpread(s, d), 10, 14, 50)
          // ≤50-row frame — the global rank window is bounded
          .withColumn("lr", row_number().over(wl).cast("long"))
          .select(col("doc_id"), col("lr"))
        val vecs = Ann.normedVecs(s, d)
        val q1 = vecs.orderBy(md5(col("vec_id").cast("string"))).limit(1)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"))
        val ws = org.apache.spark.sql.expressions.Window
          .orderBy(col("simm").desc, col("vec_id"))
        val sem = vecs.join(broadcast(q1), col("vec_id") =!= col("qid"))
          .select(col("vec_id"),
            round(Ann.simFromNorms(col("qv"), col("v"), col("qn"),
              col("nrm")) * 1e6).cast("long").as("simm"))
          .orderBy(col("simm").desc, col("vec_id")).limit(50)
          .withColumn("sr", row_number().over(ws).cast("long"))
          .select(col("vec_id").as("doc_id"), col("sr"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf_micro",
            coalesce(expr("1000000 div (60 + lr)"), lit(0L)) +
              coalesce(expr("1000000 div (60 + sr)"), lit(0L)))
          .orderBy(col("rrf_micro").desc, col("doc_id"))
          .limit(10)
          .select(col("doc_id"), col("lr").as("lex_rank"),
            col("sr").as("sem_rank"), col("rrf_micro"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
             |  FROM documents WHERE trim(text) <> ''),
             |tf AS (SELECT doc_id, tok, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |         CAST(round(avg(dl) * 1e3) AS BIGINT) AS avgdl_milli
             |       FROM dl),
             |qt AS (SELECT tok, avgdl_milli,
             |        CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |          * 1e6) AS BIGINT) AS idf_micro
             |      FROM (SELECT tok, count(*) AS df,
             |              row_number() OVER (ORDER BY count(*) DESC, tok)
             |                AS qrk
             |            FROM tf GROUP BY tok) vv CROSS JOIN st
             |      WHERE qrk BETWEEN 10 AND 14),
             |sc AS (SELECT tf.doc_id,
             |         (qt.idf_micro * tf.tf * 2200000) //
             |           (tf.tf * 1000000 + 300000 +
             |            CAST(round(9e8 * dl.dl / qt.avgdl_milli) AS BIGINT))
             |           AS term_micro
             |       FROM tf JOIN qt USING (tok) JOIN dl USING (doc_id)),
             |lex AS (SELECT doc_id,
             |          CAST(row_number() OVER (ORDER BY score_micro DESC,
             |            doc_id) AS BIGINT) AS lr
             |        FROM (SELECT doc_id,
             |                CAST(sum(term_micro) AS BIGINT) AS score_micro
             |              FROM sc GROUP BY doc_id
             |              ORDER BY score_micro DESC, doc_id LIMIT 50)),
             |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE)
             |        AS v FROM embeddings),
             |q1 AS (SELECT vec_id AS qid, v AS qv FROM v
             |       ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 1),
             |sems AS (SELECT v.vec_id,
             |           CAST(round(
             |             CASE WHEN sqrt(list_sum(list_transform(q1.qv,
             |                    x -> x*x))) = 0
             |                    OR sqrt(list_sum(list_transform(v.v,
             |                    x -> x*x))) = 0 THEN 0.0
             |                  ELSE list_sum(list_transform(
             |                         list_zip(q1.qv, v.v), x -> x[1]*x[2]))
             |                    / (sqrt(list_sum(list_transform(q1.qv,
             |                         x -> x*x)))
             |                       * sqrt(list_sum(list_transform(v.v,
             |                         x -> x*x))))
             |             END * 1e6) AS BIGINT) AS simm
             |         FROM v JOIN q1 ON v.vec_id <> q1.qid),
             |sem AS (SELECT vec_id AS doc_id,
             |          CAST(row_number() OVER (ORDER BY simm DESC, vec_id)
             |            AS BIGINT) AS sr
             |        FROM (SELECT vec_id, simm FROM sems
             |              ORDER BY simm DESC, vec_id LIMIT 50))
             |SELECT doc_id, lex.lr AS lex_rank, sem.sr AS sem_rank,
             |  CAST(coalesce(1000000 // (60 + lex.lr), 0) +
             |       coalesce(1000000 // (60 + sem.sr), 0) AS BIGINT)
             |    AS rrf_micro
             |FROM lex FULL OUTER JOIN sem USING (doc_id)
             |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin)),

    // X41: DPO pair construction — the preference-dataset builder
    // downstream of x37/x38: within each group (source = the
    // "prompt"), the highest- and lowest-reward samples become the
    // (chosen, rejected) pair, kept only when the reward margin
    // clears a floor (degenerate near-tie pairs teach a DPO loss
    // nothing). Reward = the x2 quality score in micro-units; ties
    // break on doc_id so the pair is unique. Scale posture: ONE
    // group-keyed window ranks both extremes (min = max of the
    // reversed order) — no per-group sort materialization, no
    // self-join of the sample table.
    GQuery("x41_dpo_pairs",
      (s, d) => {
        val toks = tokens(col("text"))
        val scored = graft.Tables.documents(s, d)
          .select("doc_id", "source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("source"),
            size(toks).cast("long").as("n_toks"),
            hits(toks, stopwords).as("n_stop"))
          .select(col("doc_id"), col("source"),
            round(round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
              * 10000).cast("long").as("rm"))
        val wUp = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("rm").desc, col("doc_id"))
        val wDn = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("rm").asc, col("doc_id").desc)
        scored
          .withColumn("rb", row_number().over(wUp))
          .withColumn("rw", row_number().over(wDn))
          .filter(col("rb") === 1 || col("rw") === 1)
          .groupBy("source")
          .agg(max(when(col("rb") === 1, col("doc_id"))).as("chosen"),
            max(when(col("rb") === 1, col("rm"))).as("r_chosen"),
            max(when(col("rw") === 1, col("doc_id"))).as("rejected"),
            max(when(col("rw") === 1, col("rm"))).as("r_rejected"))
          .withColumn("margin", col("r_chosen") - col("r_rejected"))
          .filter(col("margin") >= 500)
          .select("source", "chosen", "rejected", "r_chosen",
            "r_rejected", "margin")
          .orderBy("source")
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, source,
              |    CAST(round(round(least(len(string_split(trim(text), ' '))
              |        / 60.0, 1.0) * 0.5 +
              |      (1.0 - ${sqlHits(stopwords)} * 1.0 /
              |       len(string_split(trim(text), ' '))) * 0.5, 4)
              |      * 10000) AS BIGINT) AS rm
              |  FROM documents),
              |r AS (SELECT doc_id, source, rm,
              |        row_number() OVER (PARTITION BY source
              |          ORDER BY rm DESC, doc_id) AS rb,
              |        row_number() OVER (PARTITION BY source
              |          ORDER BY rm ASC, doc_id DESC) AS rw
              |      FROM q),
              |p AS (SELECT source,
              |        CAST(max(CASE WHEN rb = 1 THEN doc_id END)
              |          AS BIGINT) AS chosen,
              |        CAST(max(CASE WHEN rb = 1 THEN rm END)
              |          AS BIGINT) AS r_chosen,
              |        CAST(max(CASE WHEN rw = 1 THEN doc_id END)
              |          AS BIGINT) AS rejected,
              |        CAST(max(CASE WHEN rw = 1 THEN rm END)
              |          AS BIGINT) AS r_rejected
              |      FROM r WHERE rb = 1 OR rw = 1 GROUP BY source)
              |SELECT source, chosen, rejected, r_chosen, r_rejected,
              |  r_chosen - r_rejected AS margin
              |FROM p WHERE r_chosen - r_rejected >= 500
              |ORDER BY source""".stripMargin)),

    // X42: group-relative advantage normalization — the GRPO/RLOO
    // reward-shaping op: within each group the raw reward becomes
    // (r − mean) / std, computed from the group's THREE integer
    // sufficient statistics (n, Σr, Σr²) so both engines derive the
    // identical doubles — one keyed aggregate broadcast back, never
    // a second pass over samples. Zero-variance groups emit 0 (every
    // sample at the baseline). Output is per-sample — the shape the
    // RL trainer consumes.
    GQuery("x42_group_advantage",
      (s, d) => {
        val toks = tokens(col("text"))
        val scored = graft.Caches.track(graft.Tables.documents(s, d)
          .select("doc_id", "source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("source"),
            size(toks).cast("long").as("n_toks"),
            hits(toks, stopwords).as("n_stop"))
          .select(col("doc_id"), col("source"),
            round(round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
              (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
              * 10000).cast("long").as("rm")))
        val stats = scored.groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("rm")).as("sr"),
            sum(col("rm") * col("rm")).as("srr"))
        scored.join(broadcast(stats), Seq("source"))
          .withColumn("mean", col("sr") / col("n"))
          .withColumn("varr",
            (col("srr") - col("sr") * col("sr") / col("n")) / col("n"))
          .withColumn("adv_micro",
            when(col("varr") <= 0, lit(0L)).otherwise(
              round((col("rm") - col("mean")) / sqrt(col("varr")) * 1e6)
                .cast("long")))
          .select(col("doc_id"), col("source"), col("rm").as("reward_micro"),
            col("adv_micro"))
          .orderBy("doc_id")
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, source,
              |    CAST(round(round(least(len(string_split(trim(text), ' '))
              |        / 60.0, 1.0) * 0.5 +
              |      (1.0 - ${sqlHits(stopwords)} * 1.0 /
              |       len(string_split(trim(text), ' '))) * 0.5, 4)
              |      * 10000) AS BIGINT) AS rm
              |  FROM documents),
              |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              |         CAST(sum(rm) AS BIGINT) AS sr,
              |         CAST(sum(rm * rm) AS BIGINT) AS srr
              |       FROM q GROUP BY 1)
              |SELECT q.doc_id, q.source, q.rm AS reward_micro,
              |  CASE WHEN (srr - sr * sr / n) / n <= 0 THEN 0
              |       ELSE CAST(round((q.rm - sr / n) /
              |              sqrt((srr - sr * sr / n) / n) * 1e6)
              |            AS BIGINT) END AS adv_micro
              |FROM q JOIN st ON st.source = q.source
              |ORDER BY q.doc_id""".stripMargin)),

    // X43: temperature-scaled mixture sampling — the UPWEIGHTING
    // counterpart of x22's uniform-target capping: sampling
    // probability p_i ∝ n_i^α flattens the source distribution
    // (mT5/XLM-R's low-resource boost). α = 1/2 deliberately: n^0.5
    // is IEEE-sqrt, correctly rounded in BOTH engines (a libm pow at
    // fractional α is not), and each weight is milli-quantized BEFORE
    // the normalizing sum so the total and every probability are pure
    // BIGINT arithmetic — order-independent across partitions and
    // engines. One corpus pass; everything after runs on the
    // |sources|-row frame.
    GQuery("x43_temperature_mix",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .select("source", "text")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("source"), size(tokens(col("text"))).cast("long")
            .as("n_toks"))
          .groupBy("source").agg(sum("n_toks").as("toks"))
          .withColumn("w_milli", round(sqrt(col("toks")) * 1e3)
            .cast("long"))
        val tot = bySrc.agg(sum(col("toks")).as("total"),
          sum(col("w_milli")).as("wtot"))
        bySrc.crossJoin(broadcast(tot))
          .select(col("source"), col("toks"),
            round(col("toks") * 1.0 / col("total"), 4).as("nat_share"),
            expr("(w_milli * 1000000) div wtot").as("p_micro"),
            expr("(((w_milli * 1000000) div wtot) * total) div toks")
              .as("boost_micro"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT source,
             |    CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
             |      AS toks
             |  FROM documents GROUP BY 1),
             |w AS (SELECT source, toks,
             |        CAST(round(sqrt(toks) * 1e3) AS BIGINT) AS w_milli
             |      FROM b),
             |t AS (SELECT CAST(sum(toks) AS BIGINT) AS total,
             |        CAST(sum(w_milli) AS BIGINT) AS wtot FROM w)
             |SELECT source, toks,
             |  round(toks * 1.0 / total, 4) AS nat_share,
             |  (w_milli * 1000000) // wtot AS p_micro,
             |  (((w_milli * 1000000) // wtot) * total) // toks
             |    AS boost_micro
             |FROM w CROSS JOIN t ORDER BY source""".stripMargin)),

    // X44: probe calibration table — the reliability diagram behind
    // x34's confusion matrix: raw integer margin scores under the
    // trained w2 weights bucket into 10 equi-width bins; per bin the
    // positive fraction vs the mean score says WHERE the classifier
    // is over/under-confident (the decision basis for thresholding a
    // quality gate, not just its aggregate accuracy). Integer bin
    // math from a broadcast (min, max) row; third consumer of the
    // persisted feature frame — no new corpus-sized state.
    GQuery("x44_calibration",
      (s, d) => {
        val feats = probeFeats(s, d)
        val wt = probeWeights(feats).select("f", "w2")
        // eager cut — the extent probe and the binning read scored
        // concurrently (see probeFeats)
        val scored = feats
          .join(broadcast(wt), Seq("f"), "left")
          .groupBy("doc_id", "y")
          .agg(sum(col("c") * coalesce(col("w2"), lit(0L)))
            .as("score"))
          .localCheckpoint(true)
        val ext = scored.agg(min(col("score")).as("mn"),
          max(col("score")).as("mx"))
        scored.crossJoin(broadcast(ext))
          .withColumn("bin",
            expr("((score - mn) * 10) div (mx - mn + 1)"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(sum(col("y")) * 1.0 / count(lit(1)), 4)
              .as("frac_pos"),
            round(sum(col("score")) * 1.0 / count(lit(1)), 4)
              .as("mean_score"))
          .orderBy("bin")
      },
      Some(ProbeCtes +
        """,
          |wt AS (SELECT fs.f,
          |         coalesce(w1.w1, 0) + coalesce(d2.dw, 0) AS w2
          |       FROM (SELECT DISTINCT f FROM feats) fs
          |       LEFT JOIN w1 ON fs.f = w1.f
          |       LEFT JOIN d2 ON fs.f = d2.f),
          |sc2 AS (SELECT fe.doc_id, fe.y,
          |          CAST(coalesce(sum(fe.c * wt.w2), 0) AS BIGINT)
          |            AS score
          |        FROM feats fe LEFT JOIN wt ON fe.f = wt.f
          |        GROUP BY 1, 2),
          |ext AS (SELECT CAST(min(score) AS BIGINT) AS mn,
          |          CAST(max(score) AS BIGINT) AS mx FROM sc2)
          |SELECT ((score - mn) * 10) // (mx - mn + 1) AS bin,
          |  count(*) AS n,
          |  round(sum(y) * 1.0 / count(*), 4) AS frac_pos,
          |  round(sum(score) * 1.0 / count(*), 4) AS mean_score
          |FROM sc2 CROSS JOIN ext
          |GROUP BY 1 ORDER BY bin""".stripMargin)),

    // X45: n-gram overlap eval scoring — the generation-eval op
    // (ROUGE-N recall / clipped BLEU-ish precision) run corpus-wide:
    // each candidate doc scores against a deterministic reference
    // partner (doc_id XOR 1 — adjacency pairing; every doc has exactly
    // one cand and one ref role; docs whose partner id is absent drop
    // out in both engines). Round 9 replaced the original
    // (doc_id + N/2) % N half-rotation: it assumed a DENSE 0..N-1 id
    // domain and silently degenerated to ZERO pairs on the sparse
    // replica-shifted sf1 ids — a vacuous both-engines-agree-on-empty
    // pass. XOR pairing exists at every scale because ids ship in
    // contiguous even-sized blocks. Clipped multiset
    // intersection Σ_g min(c_cand, c_ref) per n-gram order, in
    // integer micro-units. Scale posture: gram frames are keyed
    // aggregates; the cand↔ref match is an equi-join on (ref, gram)
    // — never doc×doc; N rides a 1-row broadcast.
    GQuery("x45_ngram_eval",
      (s, d) => {
        val docs = docsSpread(s, d)
        // grams as 64-bit ngramHash64 fingerprints, not strings: g is
        // only ever a groupBy/join key (the outputs are clipped COUNTS
        // in micro-units), the interpreted wordNgrams HOF chain builds
        // strings just to be aggregated away, and the (doc_id, g)
        // shuffles move 8-byte longs instead of n-token strings. The
        // oracle keeps string grams — counts match absent 64-bit
        // collisions (same trade as the dedup family; hash-green at
        // sf0.01 and sf1).
        def grams(n: Int) = docs
          .select(col("doc_id"),
            explode(graft.plans.NativeFunctions.ngramHash64(
              tokens(col("text")), n)).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        // Round-13 shape (guide §2.4, remove shuffles outright): the
        // reference partner id rid = cid XOR 1 is a PURE FUNCTION of
        // the doc id, so the old standalone `pairs` frame — a third
        // documents scan joined 4× per order (onto the cand gram
        // frame, the intersection, and both total legs) — carried no
        // information a projection can't. rid is now attached as an
        // expression on the gram/total frames directly; the only joins
        // left are the ones the algebra requires: the (rid, g)
        // candidate↔reference match and the per-pair total attach.
        // Membership semantics are unchanged: every gram/total row's
        // doc_id IS a document id, so the old inner joins against
        // `pairs` filtered nothing, and pairs whose partner lacks
        // grams at this order still drop out in the inner tr-join.
        def overlap(n: Int, tag: String) = {
          // eager — tot and both intersection legs read gr (round 13)
          val gr = grams(n).localCheckpoint(true)
          val tot = gr.groupBy("doc_id").agg(sum(col("c")).as("t"))
          val inter = gr
            .select(col("doc_id").as("cid"),
              expr("doc_id ^ 1").as("rid"), col("g"), col("c").as("cc"))
            .join(gr.select(col("doc_id").as("rid"), col("g"),
              col("c").as("cr")), Seq("rid", "g"))
            .groupBy("cid", "rid")
            .agg(sum(least(col("cc"), col("cr"))).as("inter"))
          tot
            .select(col("doc_id").as("cid"),
              expr("doc_id ^ 1").as("rid"), col("t").as("tc"))
            .join(tot.select(col("doc_id").as("rid"),
              col("t").as("tr")), Seq("rid"))
            .join(inter, Seq("cid", "rid"), "left")
            .select(col("cid"), col("rid"),
              expr("(coalesce(inter, 0) * 1000000) div tr")
                .as(s"r$tag"),
              expr("(coalesce(inter, 0) * 1000000) div tc")
                .as(s"p$tag"))
        }
        overlap(1, "1_micro")
          .join(overlap(2, "2_micro"), Seq("cid", "rid"))
          .orderBy("cid")
      },
      // Round-9 oracle reformulation (VERDICT #5): the cand-side gram
      // frame is staged (AS MATERIALIZED, DuckDB-only syntax) with rid
      // attached BEFORE the ref-side join, so the only remaining join
      // is on the composite (doc_id, gram) key — the previous three-way
      // form let DuckDB's optimizer pick a gram-only hash join across
      // the pair frame (common tokens × common tokens), which spilled
      // ~80 GB and aborted at sf1. Same semantics, keyed replay.
      Some("""WITH pr AS (SELECT doc_id AS cid,
             |         xor(doc_id, 1) AS rid
             |       FROM documents),
             |tk AS (SELECT doc_id, string_split(trim(text), ' ') AS ts
             |       FROM documents),
             |g1 AS (SELECT doc_id, unnest(ts) AS g FROM tk),
             |c1 AS MATERIALIZED (
             |       SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
             |       FROM g1 GROUP BY 1, 2),
             |t1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t
             |       FROM c1 GROUP BY 1),
             |a1 AS MATERIALIZED (
             |       SELECT pr.cid, pr.rid, c.g, c.c
             |       FROM pr JOIN c1 c ON c.doc_id = pr.cid),
             |i1 AS (SELECT a1.cid, a1.rid,
             |         CAST(sum(least(a1.c, b.c)) AS BIGINT) AS inter
             |       FROM a1 JOIN c1 b
             |         ON b.doc_id = a1.rid AND b.g = a1.g
             |       GROUP BY 1, 2),
             |g2 AS (SELECT doc_id,
             |         ts[x] || ' ' || ts[x + 1] AS g
             |       FROM tk JOIN LATERAL (
             |         SELECT unnest(range(1, len(ts))) AS x) r ON true
             |       WHERE len(ts) >= 2),
             |c2 AS MATERIALIZED (
             |       SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
             |       FROM g2 GROUP BY 1, 2),
             |t2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t
             |       FROM c2 GROUP BY 1),
             |a2 AS MATERIALIZED (
             |       SELECT pr.cid, pr.rid, c.g, c.c
             |       FROM pr JOIN c2 c ON c.doc_id = pr.cid),
             |i2 AS (SELECT a2.cid, a2.rid,
             |         CAST(sum(least(a2.c, b.c)) AS BIGINT) AS inter
             |       FROM a2 JOIN c2 b
             |         ON b.doc_id = a2.rid AND b.g = a2.g
             |       GROUP BY 1, 2)
             |SELECT pr.cid, pr.rid,
             |  (coalesce(i1.inter, 0) * 1000000) // ra.t AS r1_micro,
             |  (coalesce(i1.inter, 0) * 1000000) // ca.t AS p1_micro,
             |  (coalesce(i2.inter, 0) * 1000000) // rb.t AS r2_micro,
             |  (coalesce(i2.inter, 0) * 1000000) // cb.t AS p2_micro
             |FROM pr
             |LEFT JOIN i1 ON i1.cid = pr.cid AND i1.rid = pr.rid
             |LEFT JOIN i2 ON i2.cid = pr.cid AND i2.rid = pr.rid
             |JOIN t1 ca ON ca.doc_id = pr.cid
             |JOIN t1 ra ON ra.doc_id = pr.rid
             |JOIN t2 cb ON cb.doc_id = pr.cid
             |JOIN t2 rb ON rb.doc_id = pr.rid
             |ORDER BY pr.cid""".stripMargin)),

    // X46: pass@k aggregation — the post-training EVAL reduction
    // (unbiased estimator of Chen et al. 2021, HumanEval): each task
    // draws n samples, c of which pass; pass@k = 1 − C(n−c,k)/C(n,k).
    // Tasks here are users, samples their events capped at exactly
    // n=20 by deterministic md5 rank (real harnesses fix n the same
    // way), pass flags md5-derived at ~30%. Engine exactness: the
    // binomial ratio is a falling-factorial BIGINT product (exact —
    // when failures < k the factor chain crosses 0 and the product
    // vanishes, giving pass@k = 1 exactly as the estimator demands)
    // with ONE double division, micro-quantized per task; cohort
    // means are BIGINT-sum / count with one final rounding. Scale
    // posture: the sample cap is a user-keyed window (never global),
    // then two keyed aggregates — eval corpora of any size scale out
    // on the task key.
    GQuery("x46_passk",
      (s, d) => {
        def fall(k: Int, c: String) =
          (0 until k).map(i => s"(${20 - i} - $c)").mkString(" * ")
        def den(k: Int) =
          (0 until k).map(i => (20 - i).toLong).product
        def passk(k: Int) =
          s"cast(round(1e6 * (1.0 - (${fall(k, "c")}) / ${den(k)}.0)) " +
            "as bigint)"
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("hr"), col("event_id"))
        val per = graft.Tables.events(s, d)
          .select("event_id", "user_id")
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("hr", conv(substring(md5(concat(lit("smp_"),
            col("event_id").cast("string"))), 1, 8), 16, 10)
            .cast("long"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .withColumn("ok",
            (conv(substring(md5(concat(lit("pass_"),
              col("event_id").cast("string"))), 1, 8), 16, 10)
              .cast("long") % 10 < 3).cast("long"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum("ok").as("c"))
          .filter(col("n") === 20)
          .select(col("user_id"), col("c"),
            expr(passk(1)).as("p1"), expr(passk(5)).as("p5"),
            expr(passk(10)).as("p10"))
        per.groupBy((col("user_id") % 4).as("cohort"))
          .agg(count(lit(1)).as("n_tasks"),
            expr("cast(round(sum(p1) * 1.0 / count(1)) as bigint)")
              .as("pass1_micro"),
            expr("cast(round(sum(p5) * 1.0 / count(1)) as bigint)")
              .as("pass5_micro"),
            expr("cast(round(sum(p10) * 1.0 / count(1)) as bigint)")
              .as("pass10_micro"))
          .orderBy("cohort")
      },
      Some("""WITH r AS (
             |  SELECT event_id, user_id,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ('0x' || substr(md5('smp_' || event_id), 1, 8))
             |        ::BIGINT, event_id) AS rn
             |  FROM events),
             |k AS (SELECT user_id,
             |        CASE WHEN ('0x' || substr(md5('pass_' || event_id),
             |          1, 8))::BIGINT % 10 < 3 THEN 1 ELSE 0 END AS ok
             |      FROM r WHERE rn <= 20),
             |t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(ok) AS BIGINT) AS c
             |      FROM k GROUP BY 1),
             |p AS (SELECT user_id,
             |        CAST(round(1e6 * (1.0 - ((20 - c)) / 20.0))
             |          AS BIGINT) AS p1,
             |        CAST(round(1e6 * (1.0 -
             |          ((20 - c) * (19 - c) * (18 - c) * (17 - c) *
             |           (16 - c)) / 1860480.0)) AS BIGINT) AS p5,
             |        CAST(round(1e6 * (1.0 -
             |          ((20 - c) * (19 - c) * (18 - c) * (17 - c) *
             |           (16 - c) * (15 - c) * (14 - c) * (13 - c) *
             |           (12 - c) * (11 - c)) / 670442572800.0))
             |          AS BIGINT) AS p10
             |      FROM t WHERE n = 20)
             |SELECT user_id % 4 AS cohort, count(*) AS n_tasks,
             |  CAST(round(sum(p1) * 1.0 / count(*)) AS BIGINT)
             |    AS pass1_micro,
             |  CAST(round(sum(p5) * 1.0 / count(*)) AS BIGINT)
             |    AS pass5_micro,
             |  CAST(round(sum(p10) * 1.0 / count(*)) AS BIGINT)
             |    AS pass10_micro
             |FROM p GROUP BY 1 ORDER BY cohort""".stripMargin)),

    // X47: Fleiss' kappa — chance-corrected inter-annotator agreement
    // over x38's 5-annotator matrix, the standard quality gate on a
    // human-labeled corpus BEFORE majority votes become training
    // labels (x38 reports raw agreement; kappa subtracts what chance
    // would produce from the label marginals). Engine exactness: with
    // N docs × n=5 raters, P̄ = (Σ n_ij² − 5N)/(20N) and
    // P_e = Σ c_j²/(25N²) reduce to κ = (5N(S−5N) − 4C)/(100N² − 4C)
    // — all-BIGINT sums with ONE double division per output column.
    // Scale posture: two keyed aggregates per statistic (doc-keyed
    // then source-keyed); the label-marginal frame is
    // |sources|×|labels|-bounded. The regime switching (exact form →
    // pbar/pe decomposition → loud guard) lives in
    // [[fleissKappaCaseSql]], identical in both engines.
    GQuery("x47_fleiss_kappa",
      (s, d) => {
        val cnt = graft.Caches.track(annotations(s, d)
          .groupBy("source", "doc_id", "lbl")
          .agg(count(lit(1)).as("nij")))
        val perSrc = cnt
          .groupBy("source", "doc_id")
          .agg(sum(col("nij") * col("nij")).as("s_i"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("s_i").as("s_sum"))
        val marg = cnt
          .groupBy("source", "lbl").agg(sum("nij").as("cj"))
          .groupBy("source").agg(sum(col("cj") * col("cj")).as("c_sq"))
        fleissKappaReport(perSrc.join(marg, Seq("source")))
          .orderBy("source")
      },
      Some("""WITH ann AS (
             |  SELECT d.doc_id, d.source,
             |    CASE WHEN ('0x' || substr(md5('ann_' || r.range || '_'
             |           || d.doc_id), 1, 8))::BIGINT % 10 < 8
             |         THEN d.lang ELSE 'xx' END AS lbl
             |  FROM documents d JOIN range(5) r ON true),
             |cnt AS (SELECT source, doc_id, lbl,
             |          CAST(count(*) AS BIGINT) AS nij
             |        FROM ann GROUP BY 1, 2, 3),
             |src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |          CAST(sum(s_i) AS BIGINT) AS s_sum
             |        FROM (SELECT source, doc_id,
             |                CAST(sum(nij * nij) AS BIGINT) AS s_i
             |              FROM cnt GROUP BY 1, 2)
             |        GROUP BY 1),
             |mrg AS (SELECT source, CAST(sum(cj * cj) AS BIGINT) AS c_sq
             |        FROM (SELECT source, lbl,
             |                CAST(sum(nij) AS BIGINT) AS cj
             |              FROM cnt GROUP BY 1, 2)
             |        GROUP BY 1)
             |SELECT source, n_docs,
             |  CAST(round(1e6 * (s_sum - 5 * n_docs) / (20.0 * n_docs))
             |    AS BIGINT) AS pbar_micro,
             |  CAST(round(1e6 * c_sq / (25.0 * n_docs * n_docs))
             |    AS BIGINT) AS pe_micro,
             |  """.stripMargin + fleissKappaDuckSql + """ AS kappa_micro
             |FROM src JOIN mrg USING (source)
             |ORDER BY source""".stripMargin)),

    // X48: per-user contribution bounding + value clipping — the
    // deterministic half of differentially-private aggregation (the
    // DP-SGD / DP-analytics prep step: bound each user to M=10
    // contributions, clip each to [0, $50], THEN aggregate; the noise
    // addition that follows at serving time is out of scope for a
    // correctness gate precisely because it is random). Engine
    // exactness: cents-quantized BIGINT sums; the M-cap is a
    // deterministic md5-ranked keep. Scale posture: one user-keyed
    // window (never global) + one keyed aggregate — sensitivity
    // bounding at corpus scale is exactly this shape.
    GQuery("x48_contribution_cap",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(conv(substring(md5(col("event_id").cast("string")),
            1, 8), 16, 10).cast("long"), col("event_id"))
        graft.Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value")
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .withColumn("cents", expr("cast(round(value * 100) as bigint)"))
          .withColumn("clipped",
            expr("least(greatest(cast(round(value * 100) as bigint), " +
              "0L), 5000L)"))
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"),
            count(lit(1)).as("n_events"),
            sum("cents").as("raw_cents"),
            sum("clipped").as("clipped_cents"))
          .orderBy("event_type")
      },
      Some("""WITH r AS (
             |  SELECT event_id, user_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
             |        1, 8))::BIGINT, event_id) AS rn
             |  FROM events),
             |k AS (SELECT event_type, user_id,
             |        CAST(round(value * 100) AS BIGINT) AS cents,
             |        least(greatest(CAST(round(value * 100) AS BIGINT),
             |          0), 5000) AS clipped
             |      FROM r WHERE rn <= 10)
             |SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  count(*) AS n_events,
             |  CAST(sum(cents) AS BIGINT) AS raw_cents,
             |  CAST(sum(clipped) AS BIGINT) AS clipped_cents
             |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin))
  )

  /** x38 annotation derivation: 5 synthetic annotators per doc, each
    * reading the md5 of (annotator, doc) — 80% report the doc's true
    * lang, 20% the noise label "xx". Deterministic, so the DuckDB
    * oracle replays the identical annotator behavior. */
  /** x47 regime boundary below which the all-BIGINT kappa form runs:
    * its numerator term 5N(S−5N) ≤ 100N² stays BIGINT-exact to
    * N ≈ 3.03e8; 2e8 leaves a 1.5× margin. */
  private[graft] val FleissExactBelow = 200000000L
  /** Hard x47 bound past which even c_sq = Σ c_j² (≤ 25N²) can wrap in
    * the upstream BIGINT sum — no formula rearrangement downstream can
    * recover exactness, so the query fails LOUDLY here instead of
    * silently diverging from the (raising) oracle. */
  private[graft] val FleissCsqBound = 600000000L

  /** x47 kappa expression over (n_docs, s_sum, c_sq), shared by the
    * registered query and its oracle so the engines can never drift.
    * Three regimes per source row (CASE branches are lazily evaluated
    * in both engines, so the overflow-prone arithmetic never runs
    * outside its safe regime):
    *  - n_docs < `exactBelow`: single-division all-BIGINT form
    *    κ = (5N(S−5N) − 4C) / (100N² − 4C);
    *  - `exactBelow` ≤ n_docs < [[FleissCsqBound]]: the P̄/P_e
    *    decomposition κ = (P̄ − P_e)/(1 − P_e) with P̄ = (S−5N)/(20N),
    *    P_e = C/(25N²) — every factor double-safe at any N whose
    *    BIGINT inputs are still exact;
    *  - n_docs ≥ [[FleissCsqBound]]: `guard` (Spark assert_true /
    *    DuckDB error) fails the query loudly (round-7 ADVICE: Spark
    *    non-ANSI wrapped silently while DuckDB raised).
    * Perfect agreement (4C = 100N², i.e. P_e = 1) yields NULL via an
    * explicit branch in BOTH engines — preempting Spark's
    * divide-by-zero NULL vs DuckDB's non-NULL double division
    * (round-7 ADVICE). The decomposed regime guards on the COMPUTED
    * denominator `1 − c_sq/(25N²) = 0` rather than the algebraic
    * `25N² = c_sq` (round-8 ADVICE): past 2^53 a c_sq one
    * representable double under 25N² can miss the algebraic equality
    * while the P_e division still rounds to exactly 1.0 — guarding on
    * the denominator itself means the NULL branch and the division can
    * never disagree. */
  private[graft] def fleissKappaCaseSql(guard: String,
      exactBelow: Long = FleissExactBelow): String =
    s"""case
       | when n_docs >= $FleissCsqBound then cast($guard as bigint)
       | when n_docs < $exactBelow then
       |   case when 100 * n_docs * n_docs = 4 * c_sq
       |        then cast(null as bigint)
       |        else cast(round(1e6 * (5 * n_docs * (s_sum - 5 * n_docs)
       |            - 4 * c_sq) / (100.0 * n_docs * n_docs - 4 * c_sq))
       |          as bigint) end
       | else
       |   case when 1.0 - c_sq / (25.0 * n_docs * n_docs) = 0.0
       |        then cast(null as bigint)
       |        else cast(round(1e6 *
       |            ((s_sum - 5 * n_docs) / (20.0 * n_docs)
       |              - c_sq / (25.0 * n_docs * n_docs))
       |            / (1.0 - c_sq / (25.0 * n_docs * n_docs)))
       |          as bigint) end
       | end""".stripMargin

  private[graft] def fleissKappaDuckSql: String = fleissKappaCaseSql(
    "error('x47: n_docs beyond BIGINT-exact c_sq range')")

  /** x47 report columns over a (source, n_docs, s_sum, c_sq) stats
    * frame — separated so specs can plant adversarial stats rows
    * (regime boundary, perfect agreement, would-wrap N). */
  private[graft] def fleissKappaReport(
      stats: org.apache.spark.sql.DataFrame,
      exactBelow: Long = FleissExactBelow)
      : org.apache.spark.sql.DataFrame =
    stats.select(col("source"), col("n_docs"),
      expr("cast(round(1e6 * (s_sum - 5 * n_docs) / " +
        "(20.0 * n_docs)) as bigint)").as("pbar_micro"),
      expr("cast(round(1e6 * c_sq / (25.0 * n_docs * n_docs)) " +
        "as bigint)").as("pe_micro"),
      expr(fleissKappaCaseSql(
        s"assert_true(n_docs < $FleissCsqBound, " +
          "'x47: n_docs beyond BIGINT-exact c_sq range')",
        exactBelow)).as("kappa_micro"))

  private def annotations(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.Tables.documents(s, d)
      .select("doc_id", "lang", "source")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array((0 until 5).map(lit): _*)).as("k"))
      .withColumn("h", conv(substring(md5(concat(lit("ann_"),
        col("k").cast("string"), lit("_"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"))
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("h") % 10 < 8, col("lang")).otherwise(lit("xx"))
          .as("lbl"))

  /** x38 vote kernel over an (doc_id, lang, source, lbl) annotation
    * frame: per-doc majority label ((count desc, label asc) tie-break
    * — with 5 annotators and 2 candidate labels ties cannot occur, the
    * ordering just pins determinism), then per-source agreement
    * rollup. Both stages are keyed aggregates; nothing is bounded by
    * the annotator count except the explode factor. */
  private[graft] def voteFromAnnotations(
      ann: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("cnt").desc, col("lbl"))
    val maj = ann
      .groupBy("doc_id", "lang", "source", "lbl")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
    maj.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("cnt")) / (count(lit(1)) * 5.0), 4)
          .as("agreement"),
        round(sum(when(col("cnt") === 5, 1L).otherwise(0L)) * 1.0 /
          count(lit(1)), 4).as("pct_unanimous"),
        round(sum(when(col("lbl") === col("lang"), 1L).otherwise(0L))
          * 1.0 / count(lit(1)), 4).as("maj_acc"))
      .orderBy("source")
  }

  /** x37 core: derive pairwise quality duels (doc d vs d+1, different
    * sources only; winner = higher x2-quality micro score, source-name
    * tie-break), then run `iters` Bradley-Terry MM rounds in integer
    * micro-unit arithmetic. The duel derivation is the only data-sized
    * stage; pair counts, win totals and every iteration live on
    * |sources|-bounded broadcast frames. */
  private[graft] def btRank(s: org.apache.spark.sql.SparkSession,
      d: String, iters: Int): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col("text"))
    val q = graft.Tables.documents(s, d)
      .select("doc_id", "source", "text")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_toks"),
        hits(toks, stopwords).as("n_stop"))
      .select(col("doc_id"), col("source"),
        round(round(least(col("n_toks") / 60.0, lit(1.0)) * 0.5 +
          (lit(1.0) - col("n_stop") * 1.0 / col("n_toks")) * 0.5, 4)
          * 10000).cast("long").as("qm"))
    val comp = graft.Caches.track(q
      .select(col("doc_id").as("ida"), col("source").as("sa"),
        col("qm").as("qa"))
      .join(q.select((col("doc_id") - 1).as("ida"),
        col("source").as("sb"), col("qm").as("qb")), Seq("ida"))
      .filter(col("sa") =!= col("sb"))
      .select(col("sa"), col("sb"),
        when(col("qa") > col("qb"), col("sa"))
          .when(col("qb") > col("qa"), col("sb"))
          .otherwise(least(col("sa"), col("sb"))).as("win")))
    btFromComparisons(comp, iters)
  }

  /** x37 shared: (edges, wins) frames from a (sa, sb, win) comparison
    * frame — symmetric pair counts and per-entity win totals, both
    * tracked (they feed every MM round). */
  private def btFrames(comp: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val pair = comp
      .groupBy(least(col("sa"), col("sb")).as("u"),
        greatest(col("sa"), col("sb")).as("v"))
      .agg(count(lit(1)).as("n"))
    val edges = graft.Caches.track(
      pair.select(col("u").as("i"), col("v").as("j"), col("n"))
        .union(pair.select(col("v").as("i"), col("u").as("j"), col("n"))))
    val wins = comp.groupBy(col("win").as("i"))
      .agg(count(lit(1)).as("w"))
      .transform(graft.Caches.track)
    (edges, wins)
  }

  /** One MM round p_i ← W_i / Σ_j n_ij/(p_i+p_j) in micro-unit BIGINT
    * arithmetic over a (i, pm) strength frame. */
  private def btStep(edges: org.apache.spark.sql.DataFrame,
      wins: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sm = edges
      .join(broadcast(p), Seq("i"))
      .join(broadcast(p.select(col("i").as("j"), col("pm").as("pmj"))),
        Seq("j"))
      .withColumn("term", expr("(n * 1000000000000) div (pm + pmj)"))
      .groupBy("i").agg(sum(col("term")).as("sm"))
    sm.join(broadcast(wins), Seq("i"), "left")
      .select(col("i"),
        expr("(coalesce(w, 0) * 1000000000000) div sm").as("pm"))
  }

  /** x37 MM core over an arbitrary (sa, sb, win) comparison frame —
    * separated so specs can drive it with planted duel fixtures. */
  private[graft] def btFromComparisons(
      comp: org.apache.spark.sql.DataFrame, iters: Int)
      : org.apache.spark.sql.DataFrame = {
    val (edges, wins) = btFrames(comp)
    // per-round EAGER localCheckpoint (round 13): p is broadcast TWICE
    // inside each MM step, so an unmaterialized p duplicated the whole
    // previous-round subtree 2x per round — 2^iters copies, 61 jobs
    // with per-job wall rising 0.1 -> 0.7 s as the rounds nested
    // (measured at sf0.1 under the AQE-on protocol). p is
    // |sources|-bounded (the strength frame, ~20 rows here), so the
    // per-round cut is a trivial job and every broadcast reads the
    // materialized frame. Same integer arithmetic, same rows.
    var p = edges.select("i").distinct().withColumn("pm", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 1 to iters) p = btStep(edges, wins, p).localCheckpoint(true)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("strength_micro").desc, col("source"))
    p.join(broadcast(wins), Seq("i"), "left")
      .select(col("i").as("source"),
        coalesce(col("w"), lit(0L)).as("wins"),
        col("pm").as("strength_micro"))
      // |sources|-bounded frame — the global rank window is fine
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .orderBy("rnk")
  }

  /** DIRECTIONAL-edge-row cap for [[btConverged]]'s edge collect —
    * m8's `Dbscan.DriverCcMaxEdges` pattern. btFrames emits every
    * distinct unordered pair in both directions (i→j and j→i), so
    * this bounds directional rows: the collect path engages up to
    * ~1M distinct pairs (round-8 ADVICE: the doc previously implied
    * 2M distinct pairs). Under the cap the whole MM loop runs on
    * collected arrays (milliseconds); past it the pair frame stays
    * in Spark and only the ENTITY-sized strength vector round-trips
    * the driver per round. */
  private[graft] val BtMaxCollectedPairs = 2000000L

  /** [[btStep]] with the driver loop's exact divide-by-zero guards
    * (`greatest(·, 1)` twins `math.max(·, 1L)`), so the past-cap Spark
    * loop reproduces the driver loop's integer sequence bit-for-bit —
    * ConvergenceSpec asserts the two paths agree on one fixture. Kept
    * separate from [[btStep]]: x37's oracle replays the UNguarded
    * arithmetic and must not drift. */
  private def btStepGuarded(edges: org.apache.spark.sql.DataFrame,
      wins: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sm = edges
      .join(broadcast(p), Seq("i"))
      .join(broadcast(p.select(col("i").as("j"), col("pm").as("pmj"))),
        Seq("j"))
      .withColumn("term",
        expr("(n * 1000000000000) div greatest(pm + pmj, 1)"))
      .groupBy("i").agg(sum(col("term")).as("sm"))
    sm.join(broadcast(wins), Seq("i"), "left")
      .select(col("i"),
        expr("(coalesce(w, 0) * 1000000000000) div greatest(sm, 1)")
          .as("pm"))
  }

  /** Iterate-until-converged Bradley-Terry: the MM step looped until
    * max |Δp| ≤ `tolMicro` (exact integer test) or `maxIters`, with
    * per-round MAX-normalization — the unnormalized MM map is
    * scale-invariant, so only RATIOS converge; without renormalizing,
    * the overall scale oscillates and the delta never falls (measured:
    * delta pinned at ~0.75e6 for 25+ rounds on a 4-entity fixture).
    *
    * The loop is a DRIVER-side iteration either way — BT's contract is
    * entities ≪ comparisons, so the strength vector is broadcast-class
    * — but WHAT is collected is size-guarded (round-7 VERDICT): under
    * [[BtMaxCollectedPairs]] directional edge rows (= half that many
    * distinct unordered pairs), the pair frame itself is
    * collected and the whole loop runs on arrays (no per-round
    * scheduling at all); past the cap only the entity-sized strengths
    * collect per round, and each MM step is one Spark pass over the
    * cached pair frame ([[btStepGuarded]]) re-seeded from a literal
    * frame — O(1) plan depth with no checkpoint lineage. The
    * all-DataFrame alternative (strengths never touching the driver)
    * was measured and REJECTED: a localCheckpoint-per-round loop whose
    * checkpointed frame is consumed twice via broadcast hit
    * exponential per-round recompute (0.3 s/round through round ~15,
    * then ×3/round: 22 s at round 23, 192 s at round 25 — checkpoint
    * blocks evicted and re-derived through the whole history) even
    * though the post-checkpoint plan stayed at one node. Pure integer
    * arithmetic throughout keeps both paths deterministic and
    * identical. Returns ((i, pm) strengths, iterations). */
  private[graft] def btConverged(comp: org.apache.spark.sql.DataFrame,
      tolMicro: Long, maxIters: Int = 200,
      maxCollectedPairs: Long = BtMaxCollectedPairs)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val (edgesDf, winsDf) = btFrames(comp)
    val sess = comp.sparkSession
    import sess.implicits._
    // normalization + exact delta, shared verbatim by both paths
    def advance(p: Map[String, Long], next0: Map[String, Long])
        : (Map[String, Long], Long) = {
      val mx = math.max(next0.values.max, 1L)
      val next =
        if (mx >= 1000000L) next0.map { case (i, v) =>
          i -> v / (mx / 1000000L) }
        else next0.map { case (i, v) => i -> v * 1000000L / mx }
      (next, next.map { case (i, v) => math.abs(v - p(i)) }.max)
    }
    var it = 0
    var delta = Long.MaxValue
    // btFrames tracks (persists) edges, so the count probe is one
    // bounded job over cached blocks, not a recompute
    if (edgesDf.count() <= maxCollectedPairs) {
      val edges = edgesDf.select("i", "j", "n")
        .as[(String, String, Long)].collect().sorted
      val wins = winsDf.select("i", "w").as[(String, Long)].collect().toMap
      val byI = edges.groupBy(_._1)
      var p: Map[String, Long] =
        edges.map(_._1).distinct.sorted.map(_ -> 1000000L).toMap
      while (delta > tolMicro && it < maxIters) {
        val next0 = byI.map { case (i, es) =>
          val s = es.map { case (_, j, n) =>
            n * 1000000000000L / math.max(p(i) + p(j), 1L)
          }.sum
          i -> wins.getOrElse(i, 0L) * 1000000000000L / math.max(s, 1L)
        }
        val (np, dl) = advance(p, next0)
        p = np; delta = dl; it += 1
      }
      (p.toSeq.sortBy(_._1).toDF("i", "pm"), it)
    } else {
      val edges = edgesDf.select("i", "j", "n")
      var p: Map[String, Long] = edges.select("i").distinct()
        .as[String].collect().map(_ -> 1000000L).toMap
      while (delta > tolMicro && it < maxIters) {
        val pDf = p.toSeq.toDF("i", "pm")
        val next0 = btStepGuarded(edges, winsDf, pDf)
          .as[(String, Long)].collect().toMap
        val (np, dl) = advance(p, next0)
        p = np; delta = dl; it += 1
      }
      (p.toSeq.sortBy(_._1).toDF("i", "pm"), it)
    }
  }

  /** x36 core over an arbitrary (doc_id, text) frame — see the x36
    * registry comment for the scoring formula and exactness story.
    * Query = the tokens at df-ranks [qrkLo, qrkHi]. */
  private[graft] def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      qrkLo: Int, qrkHi: Int, k: Int): org.apache.spark.sql.DataFrame = {
    // cache-tracked on purpose: dropping the persist in favor of
    // exchange reuse across the three consumers (dl, q, score join)
    // was measured SLOWER at sf0.1 (x36 1.33 s → 1.63 s, x40 1.64 s →
    // 2.10 s) — the reuse doesn't cover all three consumers once the
    // df-rank window sits between them
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // eager (round 13) — the df-rank query and the score join race a
      // lazy cache under the AQE-on protocol (see probeFeats)
      .localCheckpoint(true)
    // dl straight from the doc token arrays: sum(tf) per doc IS the
    // non-empty token count, so the per-doc length needs neither a
    // rescan of the (much larger) tf frame nor a doc_id shuffle of it;
    // token-free docs drop exactly as the tf-derived form dropped them
    // (they produce no tf rows)
    val dl = docs
      .select(col("doc_id"),
        size(filter(tokens(col("text")), t => t =!= ""))
          .cast("long").as("dl"))
      .filter(col("dl") > 0)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      round(avg(col("dl")) * 1e3).cast("long").as("avgdl_milli"))
    // partial top-k (TakeOrderedAndProject) bounds the df-rank sort to
    // qrkHi rows BEFORE the global window runs — the window itself then
    // ranks a ≤qrkHi-row frame instead of single-partition-sorting the
    // whole vocabulary (same total order, so ranks are identical)
    val wdf = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("tok"))
    val q = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(qrkHi)
      .withColumn("qrk", row_number().over(wdf))
      .filter(col("qrk").between(qrkLo, qrkHi))
      .crossJoin(broadcast(stats))
      .select(col("tok"), col("avgdl_milli"),
        round(log((col("n_docs") - col("df") + 0.5) /
          (col("df") + 0.5) + 1.0) * 1e6).cast("long")
          .as("idf_micro"))
    tf.join(broadcast(q), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .withColumn("denom_micro",
        col("tf") * 1000000L + 300000L +
          round(lit(9e8) * col("dl") / col("avgdl_milli"))
            .cast("long"))
      .withColumn("term_micro",
        expr("(idf_micro * tf * 2200000) div denom_micro"))
      .groupBy("doc_id")
      .agg(sum(col("term_micro")).as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** x35 core over an arbitrary (doc_id, text) frame: order docs by
    * the 48-bit md5 of doc_id (deterministic shuffle), pack
    * doc-atomically into ~`b`-token shards in that order, return the
    * per-shard manifest. The global token prefix-sum never runs as a
    * single-task window over the data: per-doc cumsums partition by
    * the 4096-way order-preserving hash-prefix bucket, only the
    * ≤4096-row bucket-total frame windows globally, and the resulting
    * offsets broadcast back. */
  private[graft] def shardShuffle(docs: org.apache.spark.sql.DataFrame,
      b: Long): org.apache.spark.sql.DataFrame = {
    val keyed = docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 12),
          16, 10).cast("long"))
      .withColumn("b", expr("h div 68719476736")) // 2^36 → 4096 buckets
    val inb = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("h")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wb = org.apache.spark.sql.expressions.Window
      .orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offs = keyed.groupBy("b").agg(sum(col("w")).as("bw"))
      .withColumn("off", coalesce(sum(col("bw")).over(wb), lit(0L)))
      .select("b", "off")
    keyed
      .withColumn("cb_in", coalesce(sum(col("w")).over(inb), lit(0L)))
      .join(broadcast(offs), Seq("b"))
      .withColumn("shard", expr(s"(off + cb_in) div $b"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_toks"),
        min(col("h")).as("h_lo"), max(col("h")).as("h_hi"))
      .orderBy("shard")
  }

  /** x33/x34 shared DuckDB CTE chain: hashed features + the two
    * perceptron steps (w1, then d2 = the step-2 update). Kept as one
    * constant so the train and evaluate oracles can never drift. */
  private val ProbeCtes: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    unnest(string_split(trim(text), ' ')) AS tok
      |  FROM documents WHERE trim(text) <> ''),
      |feats AS (
      |  SELECT doc_id, y,
      |    CAST((len(tok) * 31 + ascii(tok)) % 64 AS BIGINT) AS f,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2, 3),
      |w1 AS (SELECT f, CAST(sum(c) AS BIGINT) AS w1
      |       FROM feats WHERE y = 1 GROUP BY f),
      |sc AS (SELECT fe.doc_id, fe.y,
      |         CAST(coalesce(sum(fe.c * w1.w1), 0) AS BIGINT)
      |           AS score
      |       FROM feats fe LEFT JOIN w1 ON fe.f = w1.f
      |       GROUP BY 1, 2),
      |dl AS (SELECT doc_id,
      |         y - (CASE WHEN score > 0 THEN 1 ELSE 0 END) AS delta
      |       FROM sc
      |       WHERE y - (CASE WHEN score > 0 THEN 1 ELSE 0 END) <> 0),
      |d2 AS (SELECT fe.f, CAST(sum(dl.delta * fe.c) AS BIGINT) AS dw
      |       FROM feats fe JOIN dl ON fe.doc_id = dl.doc_id
      |       GROUP BY fe.f)""".stripMargin

  /** x33/x34 shared: the persisted (doc_id, y, f, c) hashed
    * bag-of-words frame (y = weak lang='en' label). */
  private def probeFeats(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .select("doc_id", "lang", "text")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        (col("lang") === "en").cast("long").as("y"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("y"),
        ((length(col("tok")) * 31 + ascii(col("tok"))) % 64)
          .cast("long").as("f"))
      .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("c"))
      // EAGER cut (round 13): probeWeights references this frame four
      // times (w1, the scored step, dw, the distinct-f spine) and
      // x33/x34/x40/x44 each add consumers — lazily persisted, those
      // concurrent broadcast-subquery stages race to first-touch the
      // unbuilt cache and re-run the tokenize+featurize subtree (the
      // m23/d11 pattern).
      .localCheckpoint(true)

  /** x33/x34 shared: (f, w1, w2) after the two perceptron steps over
    * a [[probeFeats]]-shaped frame. */
  private[graft] def probeWeights(feats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // step 1 from w=0: every score is 0 → ŷ=0 → Δw_f = Σ_{y=1} c
    val w1 = feats.filter(col("y") === 1)
      .groupBy("f").agg(sum("c").as("w1"))
    // step 2: score docs under w1, misclassified docs push ±counts
    val scored = feats
      .join(broadcast(w1), Seq("f"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(col("c") * coalesce(col("w1"), lit(0L))).as("score"))
      .select(col("doc_id"),
        (col("y") - when(col("score") > 0, 1L).otherwise(0L))
          .as("delta"))
      .filter(col("delta") =!= 0)
    val dw = feats.join(broadcast(scored), Seq("doc_id"))
      .groupBy("f").agg(sum(col("delta") * col("c")).as("dw"))
    feats.select("f").distinct()
      .join(broadcast(w1), Seq("f"), "left")
      .join(broadcast(dw), Seq("f"), "left")
      .select(col("f"),
        coalesce(col("w1"), lit(0L)).as("w1"),
        (coalesce(col("w1"), lit(0L)) + coalesce(col("dw"), lit(0L)))
          .as("w2"))
  }
}
