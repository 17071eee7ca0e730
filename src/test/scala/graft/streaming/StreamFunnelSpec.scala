package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private val steps = Seq("view", "click", "buy")

  private def runStream(batches: Seq[Seq[FunnelEvent]],
                        withinSec: Option[Long] = None): Seq[(Long, Int, Timestamp)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamFunnel.completions(
      input.toDS().withWatermark("ts", "10 minutes").as[FunnelEvent],
      steps, withinSec)
    val name = s"funnel_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[StepCompletion]
      .collect().map(c => (c.userId, c.stepIdx, c.ts)).toSeq.sorted
  }

  test("streaming completions match the batch funnel") {
    val events = Seq(
      FunnelEvent(1L, ts(0), "view"), FunnelEvent(1L, ts(10), "click"),
      FunnelEvent(1L, ts(20), "buy"),
      FunnelEvent(2L, ts(5), "view"), FunnelEvent(2L, ts(6), "click"),
      FunnelEvent(3L, ts(2), "click"), FunnelEvent(3L, ts(9), "view"),
      // watermark pusher so earlier completions finalize
      FunnelEvent(99L, ts(2000), "view"))
    val got = runStream(Seq(events))
    val batch = graft.operators.Events.funnelTimes(
        events.toDF("user", "ts", "type").withColumnRenamed("user", "userId"),
        "userId", "type", "ts", steps)
      .collect().flatMap { r =>
        (1 to 3).flatMap(i => Option(r.getTimestamp(i)).map(t => (r.getLong(0), i, t)))
      }.toSeq.sorted
    // the watermark pusher's own step-1 completion is not yet final
    // (nothing advanced the watermark past it) — exclude it from batch
    assert(got == batch.filterNot(_._1 == 99L))
  }

  test("out-of-order arrival across batches still yields first-touch times") {
    // click arrives FIRST, then an earlier view in a later batch (still
    // inside the watermark), then the watermark advances
    val b1 = Seq(FunnelEvent(1L, ts(8), "click"))
    val b2 = Seq(FunnelEvent(1L, ts(5), "view"))
    val b3 = Seq(FunnelEvent(99L, ts(3000), "view"))
    val got = runStream(Seq(b1, b2, b3))
    assert(got == Seq((1L, 1, ts(5)), (1L, 2, ts(8))))
  }

  test("a step is not emitted before the watermark passes it") {
    val b1 = Seq(FunnelEvent(1L, ts(0), "view"))
    val got = runStream(Seq(b1)) // nothing ever advanced the watermark
    assert(got.isEmpty)
  }

  test("horizon: completions beyond withinSec never emit; dead state is dropped") {
    val b1 = Seq(FunnelEvent(1L, ts(0), "view"), FunnelEvent(1L, ts(90), "click"))
    val b2 = Seq(FunnelEvent(99L, ts(3000), "view"))
    // 1h horizon: the click at +90min does not qualify
    val got = runStream(Seq(b1, b2), withinSec = Some(3600L))
    assert(got == Seq((1L, 1, ts(0))))
  }

  test("batch mode (emitOpen) equals the batch operator with no watermark at all") {
    val events = Seq(
      FunnelEvent(1L, ts(0), "view"), FunnelEvent(1L, ts(1), "click"),
      FunnelEvent(2L, ts(3), "view"))
    val got = StreamFunnel.completions(events.toDS(), steps, None, emitOpen = true)
      .collect().map(c => (c.userId, c.stepIdx, c.ts)).toSeq.sorted
    assert(got == Seq((1L, 1, ts(0)), (1L, 2, ts(1)), (2L, 1, ts(3))))
  }
}
