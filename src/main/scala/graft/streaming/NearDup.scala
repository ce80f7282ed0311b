package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.{functions => gf}

/**
 * Streaming first-wins MinHash near-dup dedup — q63's retention rule under
 * a watermark. Semantics (identical to the batch q63 when arrival order
 * follows doc id): a document is RETAINED iff it is the first claimant of
 * EVERY one of its 16 LSH band keys; any later document sharing >= 1 band
 * with an already-seen document is dropped ("dedup against seen" — the
 * greedy rule a single ordered pass can honor, which is what makes it
 * streamable at all).
 *
 * Scale shape: state is ONE tiny row per live band key (a claimed flag +
 * last event time), keyed by the band — the same key the batch band-join
 * shuffles on — and aged out by event-time timeout once the watermark
 * passes `ttl`, so state size is bounded by the band cardinality of the
 * horizon, never by stream length (the dedupStream bound, PageStream.scala).
 * No document text, shingle arrays, or signatures are ever held in state.
 */
object NearDup {

  /** One band-claim event: `first` = this doc was the band's first claimant
    * (within the state horizon). Event time travels in MICROseconds
    * (`Timestamp.getTime` is millis and truncates parquet micros —
    * Sessionize.scala's lesson). */
  final case class Claim(doc_id: Long, ts_us: Long, first: Boolean)

  /** `ts` (the watermarked event-time column — it must survive into the
    * stateful operator's input or Catalyst rejects the event-time timeout)
    * plus `ts_us` (exact micros for deterministic in-batch ordering). */
  final case class BandEvent(band: Long, doc_id: Long, ts: Timestamp, ts_us: Long)
  final case class BandState(lastSeenUs: Long)

  /**
   * Stage 1 (the stateful core): docs `(doc_id, ts, text)` -> one Claim per
   * (doc, band). Within a micro-batch, events of one band are ordered by
   * (ts, doc_id) before claiming — batch-internal arrival order never
   * changes the winner.
   */
  def bandClaims(docs: DataFrame, watermark: String = "1 hour",
                 ttlMillis: Long = 3600000L): Dataset[Claim] = {
    val spark = docs.sparkSession
    import spark.implicits._
    gf.registerAll(spark)
    // banding = the SHARED pipeline.Dedup scheme (same shingles, slots,
    // bands — and the same short-doc exclusion — as batch q63/q65)
    graft.pipeline.Dedup.banded(
        docs.select(col("doc_id").cast("long").as("doc_id"),
          col("ts").cast("timestamp").as("ts"), col("text"))
          .withWatermark("ts", watermark),
        "doc_id", "ts")
      .select(col("band"), col("doc_id"), col("ts"), expr("unix_micros(ts)").as("ts_us"))
      .as[BandEvent]
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, events: Iterator[BandEvent], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = events.toIndexedSeq.sortBy(e => (e.ts_us, e.doc_id))
            var claimed = state.exists
            val out = evs.map { e =>
              val first = !claimed
              claimed = true
              Claim(e.doc_id, e.ts_us, first)
            }
            state.update(BandState(evs.last.ts_us))
            // age the band out once the watermark passes last-seen + ttl
            state.setTimeoutTimestamp(evs.last.ts_us / 1000L + ttlMillis)
            out.iterator
          })
  }

  /**
   * Stage 2: AND the 16 claims per document — retained docs only. The
   * per-doc aggregation is windowed on the claim's event time (all of one
   * doc's claims share its single timestamp, so the window groups exactly
   * one doc's claims) and finalized by the watermark: a second stateful
   * operator chained after the first (Spark's multi-stateful append-mode
   * support), emitting each retained doc exactly once.
   */
  def kept(docs: DataFrame, watermark: String = "1 hour",
           ttlMillis: Long = 3600000L, window: String = "10 minutes",
           disableChainedStateCheck: Boolean = false): DataFrame = {
    // Spark's chained-stateful correctness check flags ANY FMGWS feeding a
    // stateful agg, because an FMGWS MAY emit rows older than the
    // watermark (e.g. on timeout) that the agg would silently drop as
    // late. This operator cannot: claims are emitted only for the
    // micro-batch's own input rows (ts >= watermark by definition) and
    // the timeout path emits nothing — so every claim reaches the agg in
    // the same batch it was created, before the watermark next advances.
    // CAVEAT — the flag is SESSION-GLOBAL (Spark has no per-query form)
    // and the check runs at query START, so it cannot be restored here:
    // opting in mutates the session for every later chained-stateful
    // query; hence the false DEFAULT — callers must pass true (and accept
    // the session-wide effect, logged below) or the returned query fails
    // analysis with the chained-stateful error. A session that also runs
    // FMGWS->agg pipelines relying on the guard should keep the default
    // and manage the flag itself around this query's start().
    if (disableChainedStateCheck) {
      val conf = docs.sparkSession.conf
      val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
      if (conf.get(key, "true") != "false") {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"NearDup.kept: disabling $key SESSION-WIDE (Spark has no per-query " +
            "form); later chained-stateful queries in this session lose the guard")
        conf.set(key, "false")
      }
    }
    bandClaims(docs, watermark, ttlMillis).toDF()
      .select(col("doc_id"), expr("timestamp_micros(ts_us)").as("ts"), col("first"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("doc_id"))
      .agg(min(when(col("first"), 1).otherwise(0)).as("k"),
        count(lit(1)).as("n_bands"))
      .filter(col("k") === 1)
      .select(col("doc_id"), col("n_bands"))
  }
}
