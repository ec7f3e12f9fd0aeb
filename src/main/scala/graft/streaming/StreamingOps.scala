package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference's scalar functions are
  * stateless, so they lift unchanged into streams (SURVEY.md §2C); the
  * windowed aggregation mirrors the q25_events_hourly batch query, and
  * watermarking bounds state for unbounded 100 TB/day event streams.
  */
object StreamingOps {
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour window aggregation with a 2-hour watermark — the
    * streaming twin of q25_events_hourly. Append-safe: state for a window
    * is dropped once the watermark passes it. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("value_cents"))

  /** Sliding (hopping) window rollup — hourlyRollup's hop twin: every
    * event belongs to width/slide = 4 overlapping windows, so window
    * state is 4× the tumbling case but still WATERMARK-BOUNDED (a window
    * finalizes and its state drops once the watermark passes its end,
    * exactly like the tumbling rollup — the 4× is a query constant, not
    * a data-dependent growth). Projects the window start as epoch
    * seconds so the batch twin (q62) and DuckDB oracle compare without
    * timestamp-zone plumbing. */
  def slidingRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("wstart_s"),
        col("event_type"), col("n"), col("value_cents"))

  final case class SessionEvent(user_id: Long, event_id: Long, tms: Long)
  // public: Catalyst's generated encoder projection cannot access a
  // private nested class (internal plumbing for the watermark column)
  final case class SessionEventTs(user_id: Long, event_id: Long, tms: Long,
                                  ets: java.sql.Timestamp)
  final case class SessionState(sessionIdx: Long, lastTms: Long, startTms: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long, dur_ms: Long)

  /** Gap-based sessionization with explicit per-key state
    * (`flatMapGroupsWithState` — the custom-state tier of Structured
    * Streaming). Emits a session row whenever a gap larger than `gapMs`
    * closes the previous session. The open session is flushed by an
    * event-time timeout once the watermark passes `lastTms + gapMs` — idle
    * sessions do NOT sit in state forever (VERDICT r1 item 4). After a
    * timeout flush, an empty tombstone (still four longs) keeps session
    * numbering monotonic if the user returns; a second idle period GCs the
    * tombstone entirely, so state for a dead key is eventually zero.
    * Batch twin: q27_sessionize (lag + running sum).
    *
    * State per user is O(1) (four longs) — the shape that holds at
    * 100 TB/day event volumes where per-key buffering would not. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String = "0 milliseconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ets", timestamp_millis(col("tms")))
      .withWatermark("ets", watermarkDelay)
      .as[SessionEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEventTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.nEvents > 0) {
              // flush the idle open session; tombstone preserves numbering
              state.update(SessionState(st.sessionIdx + 1, -1L, -1L, 0L))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gapMs)
              Iterator.single(
                SessionOut(userId, st.sessionIdx, st.nEvents, st.lastTms - st.startTms))
            } else { // idle tombstone: second timeout removes it
              state.remove()
              Iterator.empty
            }
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.tms, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            sorted.foreach { e =>
              st = if (st.lastTms < 0) SessionState(st.sessionIdx, e.tms, e.tms, 1L)
              else if (e.tms - st.lastTms > gapMs) {
                closed += SessionOut(userId, st.sessionIdx, st.nEvents, st.lastTms - st.startTms)
                SessionState(st.sessionIdx + 1, e.tms, e.tms, 1L)
              } else SessionState(st.sessionIdx, e.tms, st.startTms, st.nEvents + 1L)
            }
            state.update(st)
            // flush when the watermark passes the session gap (must be
            // strictly ahead of the current watermark for late stragglers)
            state.setTimeoutTimestamp(
              math.max(st.lastTms + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.iterator
          }
      }
  }

  /** Exact dedup on an unbounded document stream — the streaming twin of
    * dd01. md5 fingerprint + `dropDuplicatesWithinWatermark`: state holds
    * only fingerprints younger than the watermark delay, so memory is
    * bounded by (delay × ingest rate), not by corpus size — the only shape
    * that survives a 100 TB/day stream. Duplicates arriving within the
    * delay are suppressed exactly; a duplicate arriving after its
    * original's state expired is re-emitted (documented tradeoff: exact
    * global dedup of an unbounded stream requires unbounded state). */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Feed record for [[dedupStream]]'s gate query (stream05). */
  final case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

  // ---- streaming LSH near-duplicate detection (streaming twin of dd05) ----

  final case class VecEvent(vec_id: Long, tms: Long, embedding: Array[Float])
  final case class BandEvent(band: Int, key: Long, vec_id: Long, tms: Long,
                             ets: java.sql.Timestamp)
  /** Per-bucket state: recent (vec_id, tms) members, pruned by TTL. */
  final case class BucketState(members: List[(Long, Long)])
  final case class CandPair(ida: Long, idb: Long, band: Int)

  /** Same 16-plane / 4-band integer-exact keys as the batch dd05 path
    * (Similarity.lshCandidatePairs), via the shared scalar kernel
    * ([[graft.functions.BandKeys.keysFor]]) so batch and stream bucket
    * assignment can never drift. */
  private[streaming] def bandKeysOf(emb: Array[Float]): Array[(Int, Long)] = {
    val keys = graft.functions.BandKeys.keysFor(
      emb.map(_.toDouble), nPlanes = 16, bandSize = 4)
    Array.tabulate(keys.length)(b => (b, keys(b)))
  }

  /** Streaming near-duplicate candidates: each vector fans out to its 4
    * LSH band buckets; per-bucket state holds only members younger than
    * `ttlMs` (pruned on arrival and by event-time timeout), so state is
    * bounded by (TTL × ingest rate per bucket), never corpus size. A new
    * arrival emits a candidate pair per live same-bucket member — the
    * streaming twin of dd05's banded candidate join; exact-cosine scoring
    * composes downstream exactly as in batch. */
  def lshCandidatesStream(vecs: Dataset[VecEvent], ttlMs: Long): Dataset[CandPair] = {
    import vecs.sparkSession.implicits._
    val bands = vecs.flatMap { v =>
      bandKeysOf(v.embedding).map { case (b, k) =>
        BandEvent(b, k, v.vec_id, v.tms, new java.sql.Timestamp(v.tms))
      }
    }
    bands
      .withWatermark("ets", "0 milliseconds")
      .groupByKey(e => (e.band, e.key))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk: (Int, Long), rows: Iterator[BandEvent], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          def live(ms: List[(Long, Long)]) = ms.filter(_._2 >= wm - ttlMs)
          if (state.hasTimedOut) {
            val remaining = live(state.get.members)
            if (remaining.isEmpty) state.remove()
            else {
              state.update(BucketState(remaining))
              state.setTimeoutTimestamp(wm + ttlMs)
            }
            Iterator.empty
          } else {
            var members = live(state.getOption.map(_.members).getOrElse(Nil))
            val out = scala.collection.mutable.ArrayBuffer[CandPair]()
            rows.toSeq.sortBy(e => (e.tms, e.vec_id)).foreach { e =>
              members.foreach { case (id, _) =>
                if (id != e.vec_id)
                  out += CandPair(math.min(id, e.vec_id), math.max(id, e.vec_id), bk._1)
              }
              members = (e.vec_id, e.tms) :: members
            }
            state.update(BucketState(members))
            state.setTimeoutTimestamp(math.max(wm + 1, wm + ttlMs))
            out.distinct.iterator
          }
      }
  }

  /** Stateless crypto transform on a stream: encrypt the props column per
    * event. Works identically on batch and streaming DataFrames — the
    * registration is session-level, the UDF is a pure row map. */
  def encryptProps(events: DataFrame, recipient: String): DataFrame =
    events.select(col("event_id"), col("ts"), col("event_type"),
      call_udf("age_encrypt", col("props").cast("binary"), lit(recipient)).as("props_enc"))

  final case class FunnelEvent(user_id: Long, event_id: Long, tms: Long,
                               etype: String)
  // public: Catalyst's generated encoder projection cannot access a
  // private nested class (same constraint as SessionEventTs)
  final case class FunnelEventTs(user_id: Long, event_id: Long,
                                 tms: Long, etype: String,
                                 ets: java.sql.Timestamp)
  final case class FunnelState(stage: Int, advTms: Long)
  final case class FunnelOut(user_id: Long, stage: Int)

  /** Streaming FUNNEL stage machine — q65's ordered-sequence analysis as
    * per-user state that survives micro-batch boundaries: stage 0→1 on the
    * first 'view', 1→2 on the first 'click' STRICTLY after the advancing
    * event, 2→3 on the first 'purchase' after that. Processing each
    * user's events in event-time order makes the greedy machine equal
    * q65's min-chain (the first qualifying event in ascending time IS the
    * min), so the batch oracle verifies the streaming state exactly.
    * State is 12 bytes per live user regardless of event volume; final
    * stages flush via event-time timeout once the watermark passes
    * `horizonMs` beyond the last batch (stream03's discipline) — the
    * timeout must sit BEYOND the data horizon, or a mid-stream batch
    * would flush-and-drop live state (the watermark+1 naive choice). */
  def funnelStages(events: Dataset[FunnelEvent],
                   horizonMs: Long): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      // tms rides MICROSECONDS (the oracle's native ts precision for the
      // strict after-guards); the event-time column converts accordingly
      .withColumn("ets", timestamp_micros(col("tms")))
      .withWatermark("ets", "0 milliseconds")
      .as[FunnelEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEventTs], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.stage > 0) Iterator.single(FunnelOut(userId, st.stage))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val sorted = rows.toSeq.sortBy(e => (e.tms, e.event_id))
            sorted.foreach { e =>
              st = (st.stage, e.etype) match {
                case (0, "view") => FunnelState(1, e.tms)
                case (1, "click") if e.tms > st.advTms => FunnelState(2, e.tms)
                case (2, "purchase") if e.tms > st.advTms => FunnelState(3, e.tms)
                case _ => st
              }
            }
            state.update(st)
            // anchor the timeout to EVENT time (sessionize's discipline):
            // the first batch's watermark is 0/epoch, so a watermark-based
            // horizon would land in 1970, fire mid-stream, and duplicate
            // every user that still had events coming
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              sorted.last.tms / 1000L + horizonMs))
            Iterator.empty
          }
      }
  }
}
