package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale rehearsal for the preference block: 1M deterministic duels
  * over 500 entities — the RLHF shape (judgments ≫ entities). The
  * data-sized stage must stay a keyed aggregation (no entity-frame
  * explosion), the MM iterations must run on entity-bounded state
  * regardless of duel count, and the learned strengths must recover
  * the planted ordering bias. */
class PreferenceStressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x37 core at 1M duels / 500 entities: planted bias recovered, bounded time") {
    val nDuels = 1000000L
    val nEnt = 500
    // deterministic duels: (a, b) from independent md5 lanes; the
    // HIGHER-id entity wins 3 of 4 duels — true strength increases
    // with id, so learned ranks must track id order
    val comp = spark.range(nDuels)
      .select(col("id"),
        conv(substring(md5(concat(lit("a_"), col("id"))), 1, 8), 16, 10)
          .cast("long").as("ha"),
        conv(substring(md5(concat(lit("b_"), col("id"))), 1, 8), 16, 10)
          .cast("long").as("hb"),
        conv(substring(md5(concat(lit("w_"), col("id"))), 1, 8), 16, 10)
          .cast("long").as("hw"))
      .select((col("ha") % nEnt).as("ea"),
        (col("hb") % nEnt).as("eb"), col("hw"))
      .filter(col("ea") =!= col("eb"))
      .select(concat(lit("e"), format_string("%03d", col("ea"))).as("sa"),
        concat(lit("e"), format_string("%03d", col("eb"))).as("sb"),
        when(col("hw") % 4 < 3,
          when(col("ea") > col("eb"),
            concat(lit("e"), format_string("%03d", col("ea"))))
            .otherwise(concat(lit("e"), format_string("%03d", col("eb")))))
          .otherwise(
            when(col("ea") > col("eb"),
              concat(lit("e"), format_string("%03d", col("eb"))))
              .otherwise(concat(lit("e"), format_string("%03d", col("ea")))))
          .as("win"))
    val t0 = System.nanoTime()
    val fixed = ops.TextAnalysis.btFromComparisons(comp, 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(fixed.size == nEnt, s"expected $nEnt entities, got ${fixed.size}")
    // planted ordering: mean learned rank of the top-50 true entities
    // must be far above the bottom-50's (3:1 duel bias ⇒ clear margin)
    def meanRank(ids: Range) =
      ids.map(i => fixed(f"e$i%03d")).sum.toDouble / ids.size
    val top = meanRank(450 until 500)
    val bottom = meanRank(0 until 50)
    assert(top < 150 && bottom > 350,
      s"planted bias not recovered: top-50 mean rank $top, bottom-50 $bottom")
    assert(secs < 120, s"BT fixed-3 took $secs s at 1M duels")

    // converged form on the same duels: driver-side MM over the
    // SAME entity-bounded frames — duel count must not change the
    // per-round cost class
    val t1 = System.nanoTime()
    val (p, iters) = ops.TextAnalysis.btConverged(comp, tolMicro = 1000L)
    val secs2 = (System.nanoTime() - t1) / 1e9
    assert(iters > 3 && iters <= 200, s"iters $iters")
    val strengths = p.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // strengths agree with the fixed-3 ranking at the extremes
    val convTop = strengths.toSeq.sortBy(-_._2).take(50).map(_._1).toSet
    assert((450 until 500).count(i => convTop(f"e$i%03d")) >= 40,
      s"converged top-50 disagrees with planted truth")
    assert(secs2 < 120, s"btConverged took $secs2 s at 1M duels")
    Caches.drain()
  }
}
