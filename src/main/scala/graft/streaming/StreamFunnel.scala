package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed event for funnel tracking (mirrors the `events` table). */
final case class FunnelEvent(userId: Long, ts: Timestamp, eventType: String)

/** An emitted step completion: the user finished `step` (1-based
  * `stepIdx`) at `ts`, final — no admissible future event can change it.
  */
final case class StepCompletion(userId: Long, stepIdx: Int, step: String, ts: Timestamp)

/** Real-time funnel tracking — the streaming mirror of
  * `operators.Events.funnelTimes` (strict step ordering, first-touch
  * attribution, optional horizon from step 1), built the way the
  * reference builds stateful stream logic (Beam stateful DoFn + timers;
  * scio-core values/SCollection.scala windowing entry points) but on
  * `flatMapGroupsWithState`.
  *
  * Out-of-order safety comes from WATERMARK FINALITY, not arrival
  * order: a step's candidate time is the min qualifying event seen so
  * far, and it is emitted only once (a) the previous step is final and
  * (b) the watermark has passed it — at that point any admissible
  * future event has ts ≥ watermark > t, so the min cannot drop, and
  * the previous-step time it depends on is already immutable. The
  * same chain argument the batch operator gets from seeing all data.
  *
  * State per user: finalized step times + a buffer of still-relevant
  * events. The buffer prunes on every finalize (events at or before
  * the final frontier, events of already-final steps, and — with a
  * horizon — events past t1+horizon are all dead). At 100 TB stream
  * scale set `withinSec`: it bounds state for users who stall mid-
  * funnel (without it, an event for step 3 must legally wait forever
  * for step 2 — unbounded by the SEMANTICS, not the implementation).
  */
object StreamFunnel {

  final case class FunnelState(done: Vector[Long], buffer: Vector[(Int, Long)])

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Candidate times for steps beyond the finalized prefix: min
    * qualifying buffered event per step, chained.
    */
  private def candidates(done: Vector[Long], buffer: Vector[(Int, Long)],
                         nSteps: Int, horizonUs: Option[Long]): Vector[Long] = {
    var times = done
    var i = done.size
    var stalled = false
    while (i < nSteps && !stalled) {
      val prevT = if (i == 0) Long.MinValue else times(i - 1)
      val inHorizon: Long => Boolean = horizonUs match {
        case Some(h) if i > 0 => t => t <= times(0) + h
        case _                => _ => true
      }
      val cand = buffer.iterator
        .filter { case (si, t) => si == i && t > prevT && inHorizon(t) }
        .map(_._2)
      if (cand.isEmpty) stalled = true
      else { times = times :+ cand.min; i += 1 }
    }
    times
  }

  /** Track step completions on an event stream. `emitOpen = true` is
    * the BATCH mode switch (exactly like `Sessionize.sessions`): no
    * timeouts fire in a batch run, so every candidate is emitted as
    * final at the end of the single invocation.
    */
  def completions(events: Dataset[FunnelEvent], steps: Seq[String],
                  withinSec: Option[Long] = None,
                  emitOpen: Boolean = false): Dataset[StepCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    withinSec.foreach(w => require(w > 0, s"withinSec must be > 0, got $w"))
    val sess = events.sparkSession
    import sess.implicits._
    val stepIdx: Map[String, Int] = steps.zipWithIndex.toMap
    val nSteps = steps.size
    val horizonUs = withinSec.map(_ * 1000000L)
    val stepNames = steps.toVector

    events
      .filter(e => stepIdx.contains(e.eventType))
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, StepCompletion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Vector.empty, Vector.empty))
          val buffer =
            if (state.hasTimedOut) st.buffer
            else st.buffer ++ it.map(e => (stepIdx(e.eventType), micros(e.ts)))
          val cand = candidates(st.done, buffer, nSteps, horizonUs)
          // batch runs have no watermark to read (Spark throws)
          val wmUs = if (emitOpen) Long.MaxValue else state.getCurrentWatermarkMs() * 1000L
          // finality frontier: candidates strictly below the watermark
          // (batch mode finalizes everything — no timer will ever fire)
          var nFinal = st.done.size
          while (nFinal < cand.size && (emitOpen || cand(nFinal) < wmUs)) nFinal += 1
          val newlyFinal = (st.done.size until nFinal).map(i =>
            StepCompletion(userId, i + 1, stepNames(i), tsOf(cand(i))))
          val done = cand.take(nFinal)
          // a stalled funnel whose horizon the watermark has passed is
          // DEAD: every admissible future event has ts ≥ wm > t1+h, so
          // no later step can ever qualify — drop the state, or the
          // deadline timer would refire forever
          val horizonDead = horizonUs.exists(h =>
            done.nonEmpty && cand.size == nFinal && wmUs > done(0) + h)
          if (nFinal == nSteps || emitOpen || horizonDead) {
            state.remove()
          } else {
            // prune: events ≤ the final frontier, events of finalized
            // steps, and (with a horizon, once t1 is final) events past
            // t1 + horizon are all dead
            val frontier = if (done.nonEmpty) done.last else Long.MinValue
            val deadline = horizonUs match {
              case Some(h) if done.nonEmpty => done(0) + h
              case _                        => Long.MaxValue
            }
            val pruned = buffer.filter { case (si, t) =>
              si >= nFinal && t > frontier && t <= deadline
            }
            state.update(FunnelState(done, pruned))
            // wake when the next candidate can finalize; without a
            // pending candidate there is nothing to finalize until new
            // data arrives — no timer needed. With a horizon and a
            // final t1, also wake at the deadline to drop dead state.
            val nextAt: Option[Long] =
              if (cand.size > nFinal) Some(cand(nFinal) / 1000L + 1L)
              else if (deadline != Long.MaxValue) Some(deadline / 1000L + 1L)
              else None
            nextAt.foreach(ms => state.setTimeoutTimestamp(
              math.max(ms, state.getCurrentWatermarkMs() + 1L)))
          }
          newlyFinal.iterator
      }
  }
}
