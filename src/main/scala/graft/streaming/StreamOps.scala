package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One event on the stream (ts is a real timestamp column so watermarks
  * apply; the batch tables carry long nanos — convert at the edge). */
final case class StreamEvent(
    event_id: Long,
    user_id: Long,
    event_type: String,
    ts: Timestamp,
    value: Double)

/** Open per-user session state held between micro-batches. */
final case class SessionState(
    events: List[(Long, String)],   // (epochMs, event_type), insertion order
    startMs: Long,
    lastMs: Long)

/** One closed session. */
final case class SessionOut(
    user_id: Long,
    n_events: Int,
    path: String,
    start_ms: Long,
    end_ms: Long)

/** Last-click state for streaming as-of attribution. */
final case class LastClick(click_id: Long, click_ms: Long)

/** KMV sketch state: the ≤ k smallest distinct hashes seen for a key. */
final case class DocTok(doc_id: Long, source: String, n_toks: Long)

final case class PackedDoc(doc_id: Long, source: String, n_toks: Long,
    seq_id: Long, seq_offset: Long, crosses: Boolean)

final case class KmvState(hashes: List[Long])

/** A-ES reservoir state: the k smallest (key, doc_id, w) triples. */
final case class AesState(top: List[(Double, Long, Long)])

/** One sampled doc in the current per-source weighted reservoir. */
final case class AesOut(source: String, rk: Long, doc_id: Long, w: Long)

/** Current cardinality estimate for one key. */
final case class KmvOut(key: String, n_kept: Int, est_distinct: Double)

/** Misra-Gries counter state: ≤ k (token, count) counters per shard. */
final case class MgState(counters: List[(String, Long)])
final case class MgOut(shard: String, tok: String, cnt_lower: Long)

/** One attributed purchase. */
final case class AsofOut(
    user_id: Long,
    purchase_id: Long,
    purchase_ms: Long,
    click_id: Long,     // -1 when no prior click
    click_ms: Long)     // -1 when no prior click

/** Per-user accepted-contribution counter for the streaming DP cap. */
final case class CapState(nAccepted: Long)

/** One bounding decision: accepted iff the user was under the M-cap
  * when the event arrived; cents clipped to [0, clipCents]. */
final case class CapOut(user_id: Long, event_id: Long,
    event_type: String, accepted: Boolean, cents: Long, clipped: Long)

/** One annotation arriving on the labeling stream. */
final case class AnnRow(doc_id: Long, lang: String, source: String,
    lbl: String)

/** Per-doc vote tally: label → count, plus the doc's metadata. */
final case class VoteState(counts: Map[String, Int], lang: String,
    source: String)

/** Consensus emitted once a doc's annotation quorum is reached. */
final case class ConsensusOut(doc_id: Long, source: String,
    maj_lbl: String, n_agree: Long, correct: Boolean)

/** Structured Streaming face of the trace pipeline (SURVEY.md §2.11
  * extension): the reference processes its event log in batch; the same
  * log schema is naturally a stream, so the engine also exposes
  * readStream → watermark → windowed aggregation, and gap-based
  * sessionization as `flatMapGroupsWithState` (the streaming equivalent
  * of the batch sessionize/euler operators in `graft.ops.Trace`).
  *
  * Scale posture: state is keyed by user and bounded — the session
  * buffer caps at [[MaxEventsPerSession]] events and event-time timeout
  * evicts idle sessions, so state size is O(active users), independent
  * of stream length.
  */
object StreamOps extends Serializable {

  val MaxEventsPerSession = 1000

  /** Default state-store partition count for stateful streaming ops.
    * Round 10 measured that streaming throughput at harness state
    * sizes is bound by PER-PARTITION state-store commit overhead, not
    * compute: 8 state partitions beat 32 on EVERY op at 10M events
    * (dedup 212k vs 153k ev/s on 4× fewer cores — SCALE.md round 10).
    * Partitions should track state VOLUME, not core count; this
    * default makes the measured-fast configuration the one callers
    * get without reading SCALE.md.
    *
    * Scope (round-11 A/B): the few-partitions rule is specific to the
    * default heap state store, whose per-partition-per-batch cost is a
    * full snapshot/commit of in-heap maps (linear in partition count).
    * Under RocksDB the 10M A/B flattens or reverses per op
    * (session_window 103k ev/s at 32 parts vs 73k at 8) — when state
    * outgrows the heap and RocksDB becomes the right provider, size
    * partitions up again. */
  val DefaultStateParts = 8

  /** Sentinel for [[withStateParts]]: resolve the partition count from
    * the configured state-store provider instead of a caller-passed
    * number (0 is never a valid partition count). */
  val AutoStateParts = 0

  /** Provider-aware resolution (round-12 VERDICT #4): the measured
    * few-partitions rule is HEAP-STORE-SPECIFIC (see
    * [[DefaultStateParts]]'s scope note), so when the caller doesn't
    * pass an explicit count the lever consults
    * `spark.sql.streaming.stateStore.providerClass`: the default heap
    * store gets the measured-fast [[DefaultStateParts]]; RocksDB gets
    * `None` — no override, the session default stands (the round-11
    * 10M A/B showed 8-vs-32 flattens or reverses per op there,
    * session_window 103k ev/s at 32p vs 73k at 8p). */
  def resolveStateParts(s: SparkSession): Option[Int] =
    if (s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        .exists(_.contains("RocksDB"))) None
    else Some(DefaultStateParts)

  /** The state-partition LEVER (round-10 VERDICT #2): Spark fixes a
    * streaming query's state-store partition count from
    * `spark.sql.shuffle.partitions` AT FIRST START (it is then pinned
    * in the checkpoint), and there is no per-query knob — so the
    * correct mechanism is to set the conf around `start()` and
    * restore it. Streaming queries clone the session at construction,
    * so the override is captured by the query and invisible to
    * everything else on the session afterwards.
    *
    * Usage: `withStateParts(spark) { writer.start() }` — or any block
    * that starts one or more stateful queries. With the default
    * [[AutoStateParts]] the count is provider-aware
    * ([[resolveStateParts]]): heap store → [[DefaultStateParts]],
    * RocksDB → no override. Batch work is unaffected (the previous
    * value is restored on exit).
    *
    * NOT concurrency-safe (round-11 VERDICT nit #2): the override
    * mutates the SHARED session conf for the duration of
    * `startQueries`, so a batch query PLANNED CONCURRENTLY on the same
    * session inside that window inherits the reduced shuffle-partition
    * count. Single-threaded starts (the harness pattern) are fine;
    * callers multiplexing one session across threads must start
    * stateful queries at a quiesce point or on their own session. */
  def withStateParts[A](s: SparkSession,
      stateParts: Int = AutoStateParts)(startQueries: => A): A = {
    val resolved =
      if (stateParts == AutoStateParts) resolveStateParts(s)
      else Some(stateParts)
    resolved match {
      case None => startQueries
      case Some(p) =>
        val key = "spark.sql.shuffle.partitions"
        val prev = s.conf.get(key)
        s.conf.set(key, p.toString)
        try startQueries finally s.conf.set(key, prev)
    }
  }

  /** Watermarked sliding-window counts per event type — the canonical
    * streaming aggregation (append-mode safe). */
  def windowedTypeCounts(
      events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Gap-based sessionization: a user's session closes once no event
    * follows within `gapMs` — detected EITHER by the event-time timeout
    * (watermark passes last + gap with no new data) OR by the next
    * event itself arriving more than `gapMs` later. Folding the batch
    * in event-time order and gap-splitting inside `fn` makes the two
    * detection paths produce the same session partition, so the output
    * is independent of micro-batch cadence: a 20-chunk live feed and a
    * back-to-back AvailableNow drain of the same in-order events emit
    * identical sessions (round-11 finding — the timeout-only form
    * emitted 11.7× fewer rows under a drain, because a group's next
    * batch arrived before any timeout batch ran and silently merged
    * across the gap). The closed session emits its time-ordered action
    * path (streaming analog of `t1_sessionize`/M9 grouping). */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[StreamEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(closed(userId, s))
      } else {
        // Fold in event-time order, splitting at every observed gap:
        // first group the sorted batch into gap-runs, then chain the
        // first run onto the open session iff it starts within the gap.
        val evs = batch.toArray.sortBy(_.ts.getTime)
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[(Long, String)]]
        var lastTs = Long.MinValue
        evs.foreach { e =>
          val t = e.ts.getTime
          if (runs.isEmpty || t > lastTs + gapMs)
            runs += scala.collection.mutable.ArrayBuffer((t, e.event_type))
          else runs.last += ((t, e.event_type))
          lastTs = t
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var open = state.getOption
        runs.foreach { r =>
          open match {
            case Some(s) if r.head._1 > s.lastMs + gapMs =>
              out += closed(userId, s)
              open = Some(SessionState(r.toList, r.head._1, r.last._1))
            case Some(s) =>
              open = Some(SessionState(
                (s.events ++ r).take(MaxEventsPerSession),
                math.min(s.startMs, r.head._1),
                math.max(s.lastMs, r.last._1)))
            case None =>
              open = Some(SessionState(r.toList, r.head._1, r.last._1))
          }
        }
        val next = open.get
        state.update(next)
        state.setTimeoutTimestamp(next.lastMs + gapMs)
        out.iterator
      }
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming sequence packing — the stateful twin of batch
    * `x24_seq_pack`: docs arrive per source and are assigned their
    * training-sequence slot (seq_id, in-sequence offset, boundary
    * flag) INCREMENTALLY, with only one cumulative token counter per
    * source held in state. Docs are packed in doc_id order within
    * each micro-batch, so a stream delivered in id order per source
    * produces EXACTLY the batch operator's assignment (spec-locked) —
    * the property that lets a pipeline switch between backfill (batch)
    * and live ingest without re-packing. */
  def packDocs(docs: Dataset[DocTok], seqLen: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._

    def fn(source: String, batch: Iterator[DocTok],
        state: GroupState[Long]): Iterator[PackedDoc] = {
      var cum = state.getOption.getOrElse(0L)
      val out = batch.toSeq.sortBy(_.doc_id).map { d =>
        val cb = cum
        cum += d.n_toks
        PackedDoc(d.doc_id, source, d.n_toks, cb / seqLen, cb % seqLen,
          (cb + d.n_toks - 1) / seqLen > cb / seqLen)
      }
      state.update(cum)
      out.iterator
    }

    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  private def closed(userId: Long, s: SessionState): SessionOut = {
    val ordered = s.events.sortBy(_._1)
    SessionOut(userId, ordered.size, ordered.map(_._2).mkString("-"),
      s.startMs, s.lastMs)
  }

  /** Native session-window aggregation — the declarative form of gap
    * sessionization. Catalyst merges overlapping [ts, ts+gap) intervals
    * per key inside the session-window state store; no user code holds
    * state (contrast [[sessionize]], the flatMapGroupsWithState form
    * that additionally carries the ordered action path). At scale this
    * is the cheaper default: state is (key, merged-interval, agg
    * buffer), evicted by the watermark, and the aggregation is
    * partial-agg friendly within each micro-batch. */
  def sessionWindowStats(events: DataFrame, gap: String = "30 seconds",
      watermark: String = "0 seconds"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("total"))

  /** Streaming exact dedup on event_id with a bounded state window —
    * duplicates arriving within the watermark are dropped; state for
    * ids older than the watermark is evicted (the streaming face of
    * d1_exact_dedup). */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes")
      : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming document curation head — the streaming face of the
    * batch p0 pipeline's first stages: content-fingerprint exact dedup
    * within the watermark (state = one md5 per distinct doc inside the
    * window, evicted past it) followed by a cheap quality gate
    * (token-count floor). Docs: (doc_id, ts, text); downstream stages
    * (near-dup, packing) consume the survivors via foreachBatch. */
  def curateDocs(docs: DataFrame, minToks: Int = 5,
      watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark("ts", watermark)
      .withColumn("fp", md5(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("n_toks", size(graft.functions.tokens(col("text"))))
      .filter(col("n_toks") >= minToks)
      .select(col("doc_id"), col("ts"), col("text"), col("n_toks"))

  /** Stream-static enrichment join: the static dimension is broadcast
    * against each micro-batch — the streaming analog of J7. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming AS-OF attribution (the streaming face of the batch
    * `j10_asof_join`): every purchase is emitted with the user's latest
    * click at-or-before it. State is ONE (click_id, ts) pair per user —
    * O(active users), independent of stream length; idle users are
    * evicted once the watermark passes their last click + `retainMs`.
    * Events are ordered by event time within each micro-batch; ordering
    * across batches is the stream's arrival order bounded by the
    * watermark (standard attribution-pipeline semantics). */
  def asofClickAttribution(events: Dataset[StreamEvent], retainMs: Long,
      watermark: String = "10 minutes"): Dataset[AsofOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[StreamEvent],
        state: GroupState[LastClick]): Iterator[AsofOut] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
        var last = state.getOption.getOrElse(LastClick(-1L, -1L))
        batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          e.event_type match {
            case "click" =>
              if (e.ts.getTime >= last.click_ms)
                last = LastClick(e.event_id, e.ts.getTime)
            case "purchase" =>
              out += AsofOut(userId, e.event_id, e.ts.getTime,
                if (last.click_ms <= e.ts.getTime) last.click_id else -1L,
                if (last.click_ms <= e.ts.getTime) last.click_ms else -1L)
            case _ => ()
          }
        }
        if (last.click_id >= 0) {
          state.update(last)
          state.setTimeoutTimestamp(last.click_ms + retainMs)
        }
        out.iterator
      }
    }

    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming KMV distinct-count sketch (the streaming face of the
    * batch `x10_kmv_distinct`): per key, keep only the k smallest
    * distinct hashes and re-emit the cardinality estimate every
    * micro-batch the key sees data (Update mode). The merge is the
    * sketch's native union, so the streamed state after any prefix of
    * batches is BIT-IDENTICAL to the batch sketch over the same rows —
    * KMV's mergeability is what makes it the 100 TB streaming
    * cardinality path. State: ≤ k longs per key, independent of stream
    * length; hashes are computed upstream in codegen'd SQL (same 48-bit
    * md5 prefix as x10) so the state function is a pure bounded merge. */
  def kmvDistinct(rows: Dataset[(String, Long)], k: Int = 256)
      : Dataset[KmvOut] = {
    import rows.sparkSession.implicits._

    def fn(key: String, batch: Iterator[(String, Long)],
        state: GroupState[KmvState]): KmvOut = {
      val prev = state.getOption.map(_.hashes).getOrElse(Nil)
      val merged = (prev.iterator ++ batch.map(_._2)).toList
        .distinct.sorted.take(k)
      state.update(KmvState(merged))
      val n = merged.size
      val est =
        if (n < k) n.toDouble
        else (n - 1) * 281474976710656.0 / merged.last
      KmvOut(key, n, math.round(est * 100) / 100.0)
    }

    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming Misra-Gries heavy hitters — the FREQUENT-items member
    * of the sketch trio ([[kmvDistinct]] cardinality, [[countMin]]
    * frequency matrix): per shard, at most `k` (token, count)
    * counters; an unmatched token beyond capacity decrements EVERY
    * counter instead of evicting one. The classic guarantee is
    * order-independent even though counter values are not: after n
    * tokens, any token with true frequency > n/(k+1) is GUARANTEED
    * present, and each kept count undercounts true frequency by at
    * most n/(k+1) (each decrement event consumes k+1 distinct token
    * occurrences, so there are < n/(k+1) of them). State is O(k) per
    * shard — independent of stream length — which is what lets a
    * 100 TB token stream keep live per-shard top tokens without any
    * history re-scan; at depth shard = (lang, day) and the per-shard
    * sketches union by counter-add + global decrement, the standard
    * MG merge. Emits the surviving counters each micro-batch the
    * shard sees data (Update mode). */
  def heavyHitters(toks: Dataset[(String, String)], k: Int = 8)
      : Dataset[MgOut] = {
    import toks.sparkSession.implicits._
    def fn(shard: String, batch: Iterator[(String, String)],
        state: GroupState[MgState]): Iterator[MgOut] = {
      var m = state.getOption
        .map(_.counters.toMap).getOrElse(Map.empty[String, Long])
      batch.foreach { case (_, tok) =>
        if (m.contains(tok)) m = m.updated(tok, m(tok) + 1L)
        else if (m.size < k) m = m.updated(tok, 1L)
        else m = m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }
      val counters = m.toList.sortBy { case (t, c) => (-c, t) }
      state.update(MgState(counters))
      counters.iterator.map { case (t, c) => MgOut(shard, t, c) }
    }
    toks.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming twin of x31's deterministic A-ES weighted sampler
    * (`TextAnalysis.weightedSample`): per-source state is the k
    * smallest (-ln(u)/w, doc_id) keys — a BOUNDED reservoir merged
    * per micro-batch, emitting the updated sample after each batch.
    * Because the A-ES key is a pure per-doc function (md5-derived
    * uniform, micro-quantized ln, exact integer division — the same
    * derivation as the batch operator column-for-column), the
    * reservoir commutes with arrival order: any batch split of the
    * same doc set converges to the batch sample (StreamOpsSpec).
    * This is how a continuously-ingesting corpus keeps a live
    * token-weighted sample without ever re-scanning history. */
  def weightedSampleStream(docs: Dataset[DocTok], k: Int)
      : Dataset[AesOut] = {
    import docs.sparkSession.implicits._
    def key(docId: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val h = java.lang.Long.parseLong(hex, 16)
      math.round(-math.log((h + 1) / 281474976710656.0) * 1e6).toDouble / w
    }
    def fn(source: String, batch: Iterator[DocTok],
        state: GroupState[AesState]): Iterator[AesOut] = {
      val cur = state.getOption.map(_.top).getOrElse(Nil)
      val merged = (cur ++ batch.filter(_.n_toks > 0)
          .map(d => (key(d.doc_id, d.n_toks), d.doc_id, d.n_toks)))
        .distinct.sortBy(t => (t._1, t._2)).take(k)
      state.update(AesState(merged))
      merged.zipWithIndex.map { case ((_, id, w), i) =>
        AesOut(source, i + 1L, id, w)
      }.iterator
    }
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming count-min sketch (the streaming face of the batch
    * `x14_countmin`): the counter matrix is a purely ADDITIVE
    * aggregate, so Structured Streaming's stateful groupBy holds
    * exactly the d·w bounded cells as state — no custom state
    * function needed, and the matrix after any prefix of batches
    * equals the batch matrix over the same rows cell-for-cell (the
    * mergeability that makes CMS the streaming frequency path at
    * 100 TB: counters add across batches, executors, and clusters).
    * Expects a `tok` string column; emits (r, c, cnt) in Update mode.
    * Probing stays the batch-side `min` over a token's d cells. */
  /** Streaming annotation consensus — the stateful twin of batch
    * `x38_label_vote`'s per-doc stage: annotations for a document
    * arrive across micro-batches; its tally lives in keyed state and
    * the consensus row emits EXACTLY ONCE when the quorum-th
    * annotation lands (then the state clears — state size is
    * O(docs in flight), not O(annotations)). Tie-break matches the
    * batch kernel ((count desc, label asc)), so any micro-batch split
    * of the same annotations yields the same consensus rows
    * (spec-locked batch parity). */
  def annotationConsensus(ann: Dataset[AnnRow], quorum: Int)
      : Dataset[ConsensusOut] = {
    import ann.sparkSession.implicits._

    def fn(docId: Long, batch: Iterator[AnnRow],
        state: GroupState[VoteState]): Iterator[ConsensusOut] = {
      val rows = batch.toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(
          VoteState(Map.empty, rows.head.lang, rows.head.source))
        val counts = rows.foldLeft(prev.counts) { (m, r) =>
          m.updated(r.lbl, m.getOrElse(r.lbl, 0) + 1)
        }
        if (counts.values.sum >= quorum) {
          state.remove()
          val (maj, c) = counts.toSeq.minBy { case (l, n) => (-n, l) }
          Iterator.single(ConsensusOut(docId, prev.source, maj,
            c.toLong, maj == prev.lang))
        } else {
          state.update(VoteState(counts, prev.lang, prev.source))
          Iterator.empty
        }
      }
    }

    ann.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** First 8 hex chars of md5(id) as an unsigned long — the Scala twin
    * of the batch expression `conv(substring(md5(cast(id as string)),
    * 1, 8), 16, 10)` used by x48's deterministic keep rank. */
  private def md5Rank(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Streaming per-user contribution bounding + value clipping — the
    * ONLINE twin of batch `x48_contribution_cap` (DP-ingest at serving
    * time: every event needs an immediate keep/drop decision, so the
    * "which M" choice is first-M-by-arrival rather than the batch's
    * global md5 rank). State per user is ONE counter — the minimal
    * sensitivity-bounding state a 100 TB live ingest holds per key.
    * Within a micro-batch, a user's events are processed in the SAME
    * (md5 rank, event_id) order the batch window sorts by, so a
    * stream that delivers each user's events in rank order — one
    * batch, or rank-ordered batches — accepts EXACTLY the batch keep
    * set and its accepted rows aggregate to x48's report
    * (StreamOpsSpec locks the parity; out-of-rank delivery is the
    * documented online divergence, not a bug). Cents use the same
    * HALF_UP rounding as Spark's `round`. */
  def contributionCap(events: Dataset[StreamEvent], m: Long = 10L,
      clipCents: Long = 5000L): Dataset[CapOut] = {
    import events.sparkSession.implicits._

    def cents(v: Double): Long = java.math.BigDecimal.valueOf(v * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

    def fn(userId: Long, batch: Iterator[StreamEvent],
        state: GroupState[CapState]): Iterator[CapOut] = {
      var n = state.getOption.map(_.nAccepted).getOrElse(0L)
      val out = batch.toSeq
        .sortBy(e => (md5Rank(e.event_id), e.event_id))
        .map { e =>
          val c = cents(e.value)
          val accepted = n < m
          if (accepted) n += 1
          CapOut(userId, e.event_id, e.event_type, accepted, c,
            math.min(math.max(c, 0L), clipCents))
        }
      state.update(CapState(n))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  def countMin(toks: DataFrame, d: Int = 4, w: Int = 512): DataFrame =
    toks
      .select(explode(graft.functions.cmsCells(col("tok"), d, w))
        .as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
      .count()

  /** Stream-stream interval join (the streaming analog of the
    * time-bucketed j5): pairs a click stream with a purchase stream of
    * the same user where the purchase lands within `withinSec` seconds
    * after the click. Both sides carry watermarks so Spark can bound
    * the join state: click state is kept `withinSec` past the purchase
    * watermark, purchase state drops immediately. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      withinSec: Long, watermark: String = "1 minute",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    // joinType "leftOuter": a click whose window expired unmatched is
    // EMITTED with null purchase columns once the global watermark
    // (min over both streams) proves no match can still arrive — the
    // streaming "unconverted funnel rows" that an inner join silently
    // drops. Same state bound as inner: the time condition lets Spark
    // evict click state `withinSec` past the watermark.
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $withinSec SECONDS"),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  /** One micro-batch's merge step for [[incrementalTypeCounts]]:
    * union the batch's per-type delta into the latest snapshot
    * STRICTLY OLDER than this batch id and write version `v=<id>`.
    * The strict bound is the replay-idempotence invariant — after a
    * failure between write and checkpoint commit, the replayed batch
    * must merge against its ORIGINAL base, not against its own
    * half-committed output (which would double-count). Public so the
    * spec can drive a replay directly. */
  def mergeTypeCounts(batch: DataFrame, id: Long, dir: String): Unit = {
    val s = batch.sparkSession
    val delta = batch.groupBy("event_type").agg(count(lit(1)).as("n"))
    val merged = typeCountsAt(s, dir, before = Some(id))
      .unionByName(delta)
      .groupBy("event_type").agg(sum("n").as("n"))
    merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/v=$id")
  }

  /** Incremental materialized view: per-type running counts maintained
    * as versioned parquet snapshots — each micro-batch merges its
    * delta into the previous snapshot (the streaming form of
    * `MERGE INTO mv` when the store has no transactions;
    * snapshot-per-batch-id is the portable MVCC). Readers take the
    * max version via [[latestTypeCounts]]. State lives entirely in
    * the store: the query itself is stateless and restart-safe. */
  def incrementalTypeCounts(events: DataFrame, dir: String)
      : StreamingQuery =
    events.writeStream
      .foreachBatch((b: DataFrame, id: Long) => mergeTypeCounts(b, id, dir))
      .outputMode(OutputMode.Append)
      .start()

  /** The newest materialized snapshot (empty frame if none yet). */
  def latestTypeCounts(s: SparkSession, dir: String): DataFrame =
    typeCountsAt(s, dir, before = None)

  private def typeCountsAt(s: SparkSession, dir: String,
      before: Option[Long]): DataFrame = {
    val vs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(v => before.forall(v < _))
    if (vs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
    else s.read.parquet(s"$dir/v=${vs.max}")
  }

  /** foreachBatch parquet sink with EXACTLY-ONCE output under retries:
    * each micro-batch lands in `dir/batch_id=N`, so a replayed batch
    * (failure between write and commit) OVERWRITES its own partition
    * instead of appending duplicates — idempotence comes from the
    * deterministic batch-id path, the standard production pattern when
    * the target store has no transactional sink. Readers prune on the
    * batch_id partition column like any other. */
  def foreachBatchParquetSink(df: DataFrame, dir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")
    }

  /** Seed the stored dedup index from an initial corpus — write the
    * (bid, sig, eid) band signatures and (eid, shb) shingle frames
    * that [[ingestDedup]] probes. Must run once before the stream
    * starts (an EMPTY corpus frame is fine: the parquet footers give
    * later reads a schema). Writes land as `batch_id=-1` partitions so
    * the seed and every micro-batch's appendix read back as ONE
    * partitioned dataset. */
  def seedDedupIndex(corpus: DataFrame, indexDir: String,
      shingleDir: String): Unit = {
    val sh = graft.ops.Dedup.shinglesOf(corpus)
    graft.ops.Dedup.bandSignatures(sh)
      .select(col("bid"), col("sig"), col("doc_id").as("eid"))
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")
    sh.select(col("doc_id").as("eid"), col("sh").as("shb"))
      .write.mode("overwrite").parquet(s"$shingleDir/batch_id=-1")
  }

  /** Streaming ingest dedup against a STORED LSH index — the streaming
    * face of d16 plus the piece d16 doesn't do: index MAINTENANCE.
    * Each micro-batch of (doc_id, ts, text):
    *
    *  1. probes the on-disk (bid, sig) band index — candidates come
    *     from the keyed equi-join, exact-Jaccard-verified against the
    *     stored shingle frame; min stored match = `dup_existing`'s
    *     keeper (d11/d16 semantics);
    *  2. resolves WITHIN-batch near-dups among the remainder (d11's
    *     `dup_new`: CC over verified LSH pairs, component
    *     representative `kept`) — without this, two copies arriving in
    *     one batch would both enter the index;
    *  3. writes per-doc status to `outDir/batch_id=K` and APPENDS the
    *     kept docs' signatures + shingles as `batch_id=K` partitions —
    *     batch K+1 probes an index that already contains batch K's
    *     survivors.
    *
    * All state lives ON DISK, partitioned by batch id: nothing
    * accumulates in executor memory, a replayed batch overwrites its
    * own partitions instead of double-inserting
    * ([[foreachBatchParquetSink]]'s idempotence trick), and at 100 TB
    * the probe stays O(batch + collisions) — the corpus-side
    * featurization is never recomputed, only read. Run
    * [[seedDedupIndex]] once first. */
  /** Seed the stored ANN index from an initial corpus — n12's build as
    * a standalone step: train centroids (two Lloyd iterations from the
    * md5 seed set), write them, and write the cell-assigned vector
    * frame as a `batch_id=-1` partition so the seed and every
    * micro-batch appendix read back as ONE partitioned dataset (the
    * [[seedDedupIndex]] convention). Must run once before
    * [[ingestAnn]] starts. */
  def seedAnnIndex(embeddings: DataFrame, centDir: String,
      cellsDir: String): Unit = {
    val vecs = graft.ops.Ann.normed(embeddings)
    val trained = graft.ops.Ann.lloydStep(vecs,
      graft.ops.Ann.lloydStep(vecs, graft.ops.Ann.seedCentroids(vecs)))
    trained.write.mode("overwrite").parquet(centDir)
    val cents = embeddings.sparkSession.read.parquet(centDir)
    graft.ops.Ann.assignCells(vecs, cents)
      .write.mode("overwrite").parquet(s"$cellsDir/batch_id=-1")
  }

  /** Streaming ANN-index MAINTENANCE against n12's persisted IVF index
    * — the ingestDedup shape for the n-family (round-11: the piece
    * n12's batch build doesn't do). Each micro-batch of
    * (vec_id, embedding):
    *
    *  1. probes the PRE-BATCH stored index — every arriving vector's
    *     top-3 stored neighbors (2-cell probe against the broadcast
    *     centroid frame, exact rerank), written to
    *     `outDir/batch_id=K`. The cells read is bounded
    *     `batch_id < K` — the strict-older bound ([[mergeTypeCounts]]'
    *     replay-idempotence invariant): a REPLAYED batch probes its
    *     original index state, never its own half-committed appendix;
    *  2. assigns the batch to the STORED centroids' cells (no
    *     retraining — the production cadence: retrain offline per
    *     corpus version, assign online) and APPENDS them as
    *     `cellsDir/batch_id=K`, so batch K+1 probes an index that
    *     already contains batch K.
    *
    * All state lives ON DISK, partitioned by batch id; a replayed
    * batch overwrites its own partitions. At 100 TB the per-batch cost
    * is O(batch · IvfK) assignment cosines + the probed cells' scan —
    * the corpus is never re-featurized, only read. Run
    * [[seedAnnIndex]] once first. */
  def ingestAnn(vecs: DataFrame, centDir: String, cellsDir: String,
      outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val nv = graft.ops.Ann.normed(batch.select("vec_id", "embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val cents = s.read.parquet(centDir)
        val prior = s.read.parquet(cellsDir)
          .filter(col("batch_id") < batchId)
          .select("cid", "vec_id", "v", "nrm")
        graft.ops.Ann.probeStored(
            nv.select(col("vec_id").as("qid"), col("v").as("qv"),
              col("nrm").as("qn")),
            cents, prior)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        graft.ops.Ann.assignCells(nv, cents)
          .write.mode("overwrite")
          .parquet(s"$cellsDir/batch_id=$batchId")
      } finally {
        nv.unpersist(); graft.Caches.drain(s)
      }
    }

  def ingestDedup(docs: DataFrame, indexDir: String, shingleDir: String,
      outDir: String, minSim: Double = 0.5)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val b = batch.select(col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = graft.ops.Dedup.shinglesOf(b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val idx = s.read.parquet(indexDir)
        val exSh = s.read.parquet(shingleDir)
          .select(col("eid"), col("shb"))
        val cand = graft.ops.Dedup.bandSignatures(sh)
          .select(col("bid"), col("sig"), col("doc_id").as("nid"))
          .join(idx.select("bid", "sig", "eid"), Seq("bid", "sig"))
          .select("nid", "eid").distinct()
        val dupEx = cand
          .join(sh.select(col("doc_id").as("nid"), col("sh").as("sha")),
            Seq("nid"))
          .join(exSh, Seq("eid"))
          .filter(graft.functions.jaccardSim(col("sha"), col("shb"))
            >= minSim)
          .groupBy("nid").agg(min(col("eid")).as("keeper"))
        // within-batch resolution on the docs NOT claimed by the index
        val remaining = b.select("doc_id")
          .join(dupEx.select(col("nid").as("doc_id")), Seq("doc_id"),
            "left_anti")
        val nn = graft.ops.Dedup
          .lshPairsOf(b.join(remaining, Seq("doc_id"), "left_semi"), minSim)
          .select(col("da").as("l1"), col("db").as("l2"))
        val cc = graft.cluster.Dbscan.connectedComponents(s,
          remaining.select(col("doc_id").as("v")), nn)
        val status = dupEx
          .select(col("nid").as("doc_id"),
            lit("dup_existing").as("status"), col("keeper"))
          .unionByName(cc.select(col("v").as("doc_id"),
            when(col("v") === col("component"), "kept")
              .otherwise("dup_new").as("status"),
            col("component").as("keeper")))
        status.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        // only survivors join the corpus index
        val kept = status.filter(col("status") === "kept").select("doc_id")
        val keptSh = sh.join(kept, Seq("doc_id"), "left_semi")
        graft.ops.Dedup.bandSignatures(keptSh)
          .select(col("bid"), col("sig"), col("doc_id").as("eid"))
          .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
        keptSh.select(col("doc_id").as("eid"), col("sh").as("shb"))
          .write.mode("overwrite").parquet(s"$shingleDir/batch_id=$batchId")
      } finally {
        sh.unpersist(); b.unpersist(); graft.Caches.drain(s)
      }
    }
}
