package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom-state streaming: gap sessionization over an unbounded event
 * stream via `flatMapGroupsWithState` (the KeyValueGroupedDataset state
 * API) — the streaming twin of the batch q19 query.
 *
 * Correctness under out-of-order arrival: events are BUFFERED in state
 * and a session is emitted only once the watermark passes `end + gap` —
 * the point after which no on-time event can extend it, precede it, or
 * split it. (Emitting eagerly on gap-detection would mis-sessionize an
 * on-time event that arrives in a later micro-batch with an earlier
 * timestamp.) State per user is bounded by gap x event-rate: everything
 * older than the watermark minus gap has been emitted and dropped.
 * Emissions are append-mode, exactly once per session, and match the
 * batch definition (tested against q19 over the real events table).
 */
object Sessionize {

  /** The BUILT-IN `session_window` aggregation in streaming form — q58's
    * operator under a watermark: Spark merges overlapping `[ts, ts+gap)`
    * windows in state and emits each merged session once the watermark
    * finalizes it (append mode). Prefer this native form for plain gap
    * sessions — the engine owns the state; [[sessions]] (the
    * flatMapGroupsWithState path) exists for semantics the native
    * operator can't express (exact event buffering, custom timeout
    * emission, per-session payloads). Stream-vs-batch parity with q58 is
    * pinned in StreamingSpec. */
  def sessionsBuiltin(events: DataFrame, gap: String = "30 minutes",
                      watermark: String = "1 hour"): DataFrame =
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  case class Event(user_id: Long, ts: Timestamp)
  /** Buffered event times in MICROseconds — java.sql.Timestamp.getTime is
    * millis and would silently truncate parquet's micros, shifting session
    * boundaries off the batch (q19) definition. */
  case class Buffered(times: Array[Long])
  case class Session(user_id: Long, t_start: Timestamp, t_end: Timestamp, n_events: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** events: any frame with (user_id LONG, ts TIMESTAMP). */
  def sessions(events: DataFrame, gapSec: Long, watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Buffered, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Buffered]) =>
          val gapUs = gapSec * 1000000L
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (state.getOption.map(_.times).getOrElse(Array.empty[Long]) ++
            batch.map(e => micros(e.ts))).sorted
          if (all.isEmpty) {
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            // fold the time-sorted buffer into (start, end, n) sessions
            val folded = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            var s = all(0); var e = all(0); var n = 1L
            var i = 1
            while (i < all.length) {
              val t = all(i)
              if (t - e > gapUs) { folded += ((s, e, n)); s = t; e = t; n = 1L }
              else { e = t; n += 1L }
              i += 1
            }
            folded += ((s, e, n))
            // final iff no on-time event (ts >= watermark) can still touch
            // it: extension/split needs ts - end <= gap, i.e. end + gap >= wm
            val (closed, open) = folded.partition(x => x._2 + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(Buffered(all.filter(_ >= open.head._1)))
              // wake when the watermark can close the earliest open session
              // (ms API; +1 keeps it strictly above the current watermark)
              state.setTimeoutTimestamp((open.head._2 + gapUs) / 1000L + 1L)
            }
            closed.iterator.map { case (start, end, cnt) =>
              Session(userId, toTs(start), toTs(end), cnt)
            }
          }
      }
  }
}
