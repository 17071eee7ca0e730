package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, RelationalGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of scio's windowed / stateful stream
  * processing (reference: scio-core WindowedSCollection.scala and
  * PairSCollectionFunctions stateful sections; Beam fixed/sliding/
  * session windows and stateful DoFns).
  *
  * Spark-first: unbounded input is `readStream` → the SAME declarative
  * transforms used in batch → `writeStream`; event time comes from a
  * watermark, windows from `window()`/`session_window()`, and custom
  * state from `flatMapGroupsWithState`. Everything here works on both
  * batch and streaming frames (Structured Streaming's unified model),
  * which is what StreamingSpec asserts.
  */
object Windows {

  /** Beam fixed windows → tumbling `window()` groups. Caller adds
    * aggregates; on a stream combine with OutputMode.Append and the
    * given watermark delay.
    */
  def fixedGroups(df: DataFrame, tsCol: String, duration: String,
                  watermarkDelay: String, extraKeys: Column*): RelationalGroupedDataset =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration) +: extraKeys: _*)

  /** Beam sliding windows → `window(ts, duration, slide)`. */
  def slidingGroups(df: DataFrame, tsCol: String, duration: String, slide: String,
                    watermarkDelay: String, extraKeys: Column*): RelationalGroupedDataset =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration, slide) +: extraKeys: _*)

  /** Beam session windows → `session_window(ts, gap)` (merging windows
    * handled by Spark's streaming session aggregation).
    */
  def sessionGroups(df: DataFrame, tsCol: String, gap: String,
                    watermarkDelay: String, keys: Column*): RelationalGroupedDataset =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
}

/** A keyed event on the stream (mirrors the `events` test table). */
final case class Event(userId: Long, ts: Timestamp, value: Double)

/** A closed session emitted by [[Sessionize]]. */
final case class SessionAgg(userId: Long, sessStart: Timestamp, sessEnd: Timestamp,
                            nEvents: Long, sumValue: Double)

/** Custom-state sessionizer via `flatMapGroupsWithState` — graft's
  * analogue of a Beam stateful DoFn with an event-time timer. The
  * built-in `session_window` covers plain windowed aggregation;
  * this path exists for session logic the built-in can't express
  * (per-session derived payloads, early emission, caps).
  *
  * State per user is the single open session; closed sessions are
  * emitted as soon as a gap is observed in-batch, and the final open
  * session is emitted by the event-time timeout once the watermark
  * passes `last + gap` (streaming) or — because a batch run never
  * fires timeouts — when `emitOpen` is set (batch).
  */
object Sessionize {

  /** Open-session accumulator (timestamps in epoch micros). */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** Full-µs epoch micros (Timestamp.getTime alone truncates to ms —
    * the events table carries µs precision and the gap compare must
    * match the SQL/oracle sessionization exactly).
    */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toAgg(userId: Long, s: OpenSession): SessionAgg =
    SessionAgg(userId, tsOf(s.startUs), tsOf(s.lastUs), s.n, s.sum)

  /** Sessionize an event stream with the given inactivity gap.
    *
    * @param emitOpen also emit the still-open session at the end of
    *                 each invocation — set ONLY for batch runs (no
    *                 timeouts there to flush final sessions); on a
    *                 stream it would double-emit.
    */
  def sessions(events: Dataset[Event], gapSec: Long = 1800L,
               emitOpen: Boolean = false): Dataset[SessionAgg] = {
    val sess = events.sparkSession
    import sess.implicits._
    val gapUs = gapSec * 1000000L

    events.groupByKey(_.userId).flatMapGroupsWithState[OpenSession, SessionAgg](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // Watermark passed last+gap with no new events: session over.
          val out = state.getOption.map(toAgg(userId, _)).toList
          state.remove()
          out.iterator
        } else {
          val sorted = it.toVector.sortBy(e => micros(e.ts))
          var open = state.getOption
          val closed = Vector.newBuilder[SessionAgg]
          sorted.foreach { e =>
            val tsUs = micros(e.ts)
            open match {
              case Some(s) if tsUs < s.startUs - gapUs =>
                // A late in-watermark event predating the open session
                // by MORE than the gap: it belongs to an earlier,
                // already-elapsed session — emit it as its own closed
                // session and leave the open one untouched (closing
                // the open session here would emit it prematurely).
                closed += toAgg(userId, OpenSession(tsUs, tsUs, 1L, e.value))
              case Some(s) if tsUs - s.lastUs <= gapUs =>
                // Within [start - gap, last + gap]: merge. min() on the
                // start — a late event can precede the open session's
                // start (cross-batch) and must extend it backward.
                open = Some(OpenSession(math.min(s.startUs, tsUs), math.max(s.lastUs, tsUs),
                  s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += toAgg(userId, s)
                open = Some(OpenSession(tsUs, tsUs, 1L, e.value))
              case None =>
                open = Some(OpenSession(tsUs, tsUs, 1L, e.value))
            }
          }
          open.foreach { s =>
            if (emitOpen) { closed += toAgg(userId, s); state.remove() }
            else {
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L)
            }
          }
          closed.result().iterator
        }
    }
  }
}
