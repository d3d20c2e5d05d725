package graft.ops

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition a user
  * of this engine actually runs, wired from the same operator layers
  * the standalone queries expose:
  *
  *   quality scoring (x2) → near-dup removal (d3/d6 LSH keepers) →
  *   per-language token-budget packing (x7)
  *
  * Scale posture is inherited from the parts: the LSH pair graph is
  * candidate-bounded (never all-pairs), the keeper set arrives through
  * one semi join keyed on doc_id, and the packing window partitions by
  * language — no global single-partition step anywhere. The DuckDB
  * oracle replays the whole chain (recursive-CTE closure for the dup
  * groups, the x2 formula, the same running-sum window), so the
  * composed pipeline is hash-checked end to end, not just per stage.
  */
object Pipeline extends QueryModule {

  override def queries: Seq[GQuery] = Seq(

    GQuery("p0_pipeline",
      (s, d) => {
        val scored = TextAnalysis.qualityScored(s, d)
        val pairs = Dedup.lshPairs(s, d, 0.5)
          .select(col("da").as("l1"), col("db").as("l2"))
        val verts = Tables.documents(s, d).select(col("doc_id").as("v"))
        val keepers = graft.cluster.Dbscan.connectedComponents(s, verts, pairs)
          .filter(col("v") === col("component"))
          .select(col("v").as("doc_id"))
        val kept = scored
          .join(keepers, Seq("doc_id"), "semi")
          .filter(col("quality") >= 0.95)
        val w = Window.partitionBy("lang")
          .orderBy(col("quality").desc, col("doc_id"))
        kept.withColumn("cum_toks", sum(col("n_toks")).over(w))
          .filter(col("cum_toks") <= 4000)
          .orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + Dedup.shingleSqlCte.stripPrefix("WITH ") +
        s""",
           |p AS (SELECT a.doc_id AS da, b.doc_id AS db
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id
           |      WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
           |            len(list_distinct(a.sh || b.sh)) >= 0.5),
           |sym AS (SELECT da AS s0, db AS t0 FROM p
           |        UNION SELECT db AS s0, da AS t0 FROM p),
           |verts AS (SELECT doc_id AS vx FROM documents),
           |reach AS (SELECT vx, vx AS u FROM verts
           |          UNION
           |          SELECT r.vx, sym.t0 AS u
           |          FROM reach r JOIN sym ON r.u = sym.s0),
           |keep AS (SELECT vx AS doc_id FROM reach
           |         GROUP BY vx HAVING vx = min(u)),
           |${TextAnalysis.qualitySqlCte},
           |sel AS (SELECT q.doc_id, q.lang, q.n_toks, q.quality
           |        FROM q JOIN keep USING (doc_id)
           |        WHERE q.quality >= 0.95)
           |SELECT doc_id, lang, n_toks, quality, cum_toks FROM (
           |  SELECT doc_id, lang, n_toks, quality,
           |    CAST(sum(n_toks) OVER (PARTITION BY lang
           |      ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_toks
           |  FROM sel)
           |WHERE cum_toks <= 4000 ORDER BY doc_id""".stripMargin))
  )
}
