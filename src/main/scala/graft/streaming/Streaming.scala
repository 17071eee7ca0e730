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
  * State per user is the SET of open sessions (Beam's merging session
  * windows): late in-watermark events may interleave arbitrarily with
  * already-open sessions, so each invocation sweep-merges the open
  * sessions plus the new events (sorted by start; adjacent intervals
  * within the gap coalesce). A session is emitted once the watermark
  * passes `last + gap` — at that point no admissible future event
  * (all have ts ≥ watermark) can merge into it — either during an
  * invocation or via the event-time timeout set to the earliest
  * pending expiry. A batch run never fires timeouts; `emitOpen`
  * flushes everything instead.
  */
object Sessionize {

  /** Open-session accumulator (timestamps in epoch micros). */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** State: disjoint open sessions, kept sorted by startUs. */
  final case class SessionSet(sessions: Seq[OpenSession])

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

  /** Sorted-by-start sweep merge: intervals whose gap-padded spans
    * touch coalesce into one session. Input need not be sorted.
    */
  private[streaming] def sweepMerge(all: Seq[OpenSession], gapUs: Long): Seq[OpenSession] =
    all.sortBy(s => (s.startUs, s.lastUs)).foldLeft(List.empty[OpenSession]) {
      case (prev :: rest, s) if s.startUs - prev.lastUs <= gapUs =>
        OpenSession(prev.startUs, math.max(prev.lastUs, s.lastUs),
          prev.n + s.n, prev.sum + s.sum) :: rest
      case (acc, s) => s :: acc
    }.reverse

  /** Sessionize an event stream with the given inactivity gap.
    *
    * @param emitOpen also emit the still-open sessions at the end of
    *                 each invocation — set ONLY for batch runs (no
    *                 timeouts there to flush final sessions); on a
    *                 stream it would double-emit.
    */
  def sessions(events: Dataset[Event], gapSec: Long = 1800L,
               emitOpen: Boolean = false): Dataset[SessionAgg] = {
    val sess = events.sparkSession
    import sess.implicits._
    val gapUs = gapSec * 1000000L

    events.groupByKey(_.userId).flatMapGroupsWithState[SessionSet, SessionAgg](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (userId: Long, it: Iterator[Event], state: GroupState[SessionSet]) =>
        val merged =
          if (state.hasTimedOut) state.getOption.map(_.sessions).getOrElse(Nil)
          else {
            val fresh = it.map { e =>
              val us = micros(e.ts); OpenSession(us, us, 1L, e.value)
            }.toVector
            sweepMerge(state.getOption.map(_.sessions).getOrElse(Nil) ++ fresh, gapUs)
          }
        if (emitOpen) {
          // Batch: no timeouts ever fire — flush everything.
          state.remove()
          merged.map(toAgg(userId, _)).iterator
        } else {
          // A session is final once the watermark passes last+gap:
          // Spark has already dropped anything later than that, so no
          // admissible future event can merge into it.
          val wmMs = state.getCurrentWatermarkMs()
          val (expired, open) = merged.partition(s => s.lastUs + gapUs < wmMs * 1000L)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionSet(open))
            // earliest pending expiry; ms truncation can land exactly
            // on the watermark, which Spark rejects — clamp past it
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastUs / 1000L + gapSec * 1000L).min, wmMs + 1L))
          }
          expired.map(toAgg(userId, _)).iterator
        }
    }
  }
}
