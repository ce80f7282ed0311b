package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom-state streaming: gap sessionization over an unbounded event
 * stream via `flatMapGroupsWithState` (the KeyValueGroupedDataset state
 * API) — the streaming twin of the batch q19 query. A session closes
 * when a later event arrives more than `gapSec` after it, or when the
 * watermark passes its timeout (no more on-time events can extend it).
 *
 * State per user is O(1) (the open session only); emissions are
 * append-mode closed sessions, exactly once per session. At 10^12-event
 * scale the state store shards by user hash across executors — the same
 * partitioning story as every keyed operator here.
 */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  /** start/last in MICROseconds since epoch — java.sql.Timestamp.getTime
    * is millis and would silently truncate parquet's micros, shifting
    * session boundaries off the batch (q19) definition. */
  case class OpenSession(start: Long, last: Long, n: Long)
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
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val gapUs = gapSec * 1000000L
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's horizon: close and emit
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, toTs(s.start), toTs(s.last), s.n))
          } else {
            // micro-batch iterators are NOT time-ordered: sort this batch,
            // then fold sessions left to right
            val ts = batch.map(e => micros(e.ts)).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            ts.foreach { t =>
              open match {
                case Some(s) if t - s.last > gapUs =>
                  closed += Session(userId, toTs(s.start), toTs(s.last), s.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  open = Some(OpenSession(s.start, Math.max(s.last, t), s.n + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close via timeout once no on-time event can extend it
              // (timeout API is millis; rounding up is safe — later is fine)
              state.setTimeoutTimestamp(s.last / 1000 + gapSec * 1000 + 1)
            }
            closed.iterator
          }
      }
  }
}
