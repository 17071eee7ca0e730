package graft

import graft.syntax.external._

import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.Future

/** Specs for the external-service verbs (scio transforms parity).
  * local mode shares one JVM, so static counters observe executor-side
  * effects directly.
  */
object ExternalSpecState {
  val opened = new AtomicInteger()
  val closed = new AtomicInteger()
  val lookups = new AtomicInteger()
  val active = new AtomicInteger()
  val maxActive = new AtomicInteger()
  def reset(): Unit = { opened.set(0); closed.set(0); lookups.set(0); active.set(0); maxActive.set(0) }
}

class ExternalSpec extends SparkSpec {
  import spark.implicits._

  test("mapWithResource: one resource per task, closed on completion") {
    ExternalSpecState.reset()
    val out = (1 to 100).toDS().repartition(4)
      .mapWithResource[AnyRef, Int](
        create = () => { ExternalSpecState.opened.incrementAndGet(); new Object },
        close = _ => ExternalSpecState.closed.incrementAndGet())(
        (_, i) => i * 2)
      .collect().sorted
    assert(out.toSeq == (1 to 100).map(_ * 2))
    assert(ExternalSpecState.opened.get() == 4, s"opened=${ExternalSpecState.opened.get()}")
    // close listeners fire at task end; all tasks finished after collect
    assert(ExternalSpecState.closed.get() == ExternalSpecState.opened.get())
  }

  test("mapWithResource: resource not created for empty partitions") {
    ExternalSpecState.reset()
    val out = (1 to 2).toDS().repartition(8)
      .mapWithResource[AnyRef, Int](
        create = () => { ExternalSpecState.opened.incrementAndGet(); new Object },
        close = _ => ExternalSpecState.closed.incrementAndGet())((_, i) => i)
      .collect()
    assert(out.length == 2)
    assert(ExternalSpecState.opened.get() <= 2, "lazy create must skip empty partitions")
  }

  test("flatMapWithResource and filterWithResource") {
    val fm = (1 to 5).toDS().coalesce(1)
      .flatMapWithResource[AnyRef, Int](() => new Object, _ => ())((_, i) => List(i, i))
      .collect().sorted.toSeq
    assert(fm == (1 to 5).flatMap(i => List(i, i)).sorted)
    val fl = (1 to 10).toDS().coalesce(1)
      .filterWithResource[AnyRef](() => new Object, _ => ())((_, i) => i % 2 == 0)
      .collect().sorted.toSeq
    assert(fl == Seq(2, 4, 6, 8, 10))
  }

  test("mapWithParallelism: order preserved, concurrency bounded") {
    ExternalSpecState.reset()
    val out = (1 to 200).toDS().repartition(2)
      .mapWithParallelism(4) { i =>
        val a = ExternalSpecState.active.incrementAndGet()
        ExternalSpecState.maxActive.updateAndGet(m => math.max(m, a))
        Thread.sleep(1)
        ExternalSpecState.active.decrementAndGet()
        i * 10
      }
      .collect().sorted.toSeq
    assert(out == (1 to 200).map(_ * 10))
    // 2 partitions × parallelism 4 = at most 8 in flight
    assert(ExternalSpecState.maxActive.get() <= 8,
      s"maxActive=${ExternalSpecState.maxActive.get()}")
    assert(ExternalSpecState.maxActive.get() >= 2, "should actually run concurrently")
  }

  test("mapWithParallelism: a throwing element fails the job, not hangs") {
    intercept[org.apache.spark.SparkException] {
      (1 to 10).toDS().coalesce(1)
        .mapWithParallelism(2)(i => if (i == 5) sys.error("poison") else i)
        .collect()
    }
  }

  test("collectWithResource, filterWithParallelism, collectWithParallelism") {
    val cw = (1 to 10).toDS().coalesce(1)
      .collectWithResource[AnyRef, Int](() => new Object, _ => ()) {
        case (_, i) if i % 3 == 0 => i * 100
      }
      .collect().sorted.toSeq
    assert(cw == Seq(300, 600, 900))
    val fp = (1 to 20).toDS().repartition(2)
      .filterWithParallelism(3)(_ % 2 == 1)
      .collect().sorted.toSeq
    assert(fp == (1 to 20).filter(_ % 2 == 1))
    val cp = (1 to 20).toDS().coalesce(1)
      .collectWithParallelism(3) { case i if i > 15 => i - 15 }
      .collect().toSeq
    assert(cp == (1 to 5))
  }

  test("mapAsync: future-returning client, order preserved") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val out = (1 to 50).toDS().coalesce(1)
      .mapAsync(8)(i => Future(i + 1))
      .collect().toSeq
    assert(out == (2 to 51))
  }

  test("asyncBatchLookup: one call per batch, batch windows respect batchSize") {
    import scala.concurrent.ExecutionContext.Implicits.global
    ExternalSpecState.reset()
    val out = (1 to 100).toDS().coalesce(1)
      .asyncBatchLookup[Int, Int](batchSize = 10)(identity) { ks =>
        ExternalSpecState.lookups.incrementAndGet()
        ExternalSpecState.maxActive.updateAndGet(m => math.max(m, ks.size))
        Future(ks.map(k => k -> k * 2).toMap)
      }
      .collect().toSeq
    assert(out.size == 100)
    assert(out.forall { case (i, v, err) => v.contains(i * 2) && err.isEmpty })
    assert(ExternalSpecState.lookups.get() == 10,
      s"100 distinct keys / batchSize 10 must be 10 calls, got ${ExternalSpecState.lookups.get()}")
    assert(ExternalSpecState.maxActive.get() <= 10, "no batch may exceed batchSize")
  }

  test("asyncBatchLookup: duplicate keys dedupe — piggyback in flight, cache across batches") {
    import scala.concurrent.ExecutionContext.Implicits.global
    ExternalSpecState.reset()
    // 10 distinct keys cycled 10× with an eager-drain window (maxPending=1):
    // every occurrence after a key's batch completes must hit the cache,
    // so each distinct key is requested exactly once
    val keys = (0 until 100).map(_ % 10)
    val out = keys.toDS().coalesce(1)
      .asyncBatchLookup[Int, String](batchSize = 2, maxPending = 1,
        maxCacheEntries = 100)(identity) { ks =>
        ExternalSpecState.lookups.incrementAndGet()
        ExternalSpecState.active.addAndGet(ks.size) // total keys requested
        Future(ks.map(k => k -> s"v$k").toMap)
      }
      .collect().toSeq
    assert(out.size == 100 && out.forall { case (k, v, e) => v.contains(s"v$k") && e.isEmpty })
    assert(ExternalSpecState.active.get() == 10,
      s"each distinct key must be requested once, got ${ExternalSpecState.active.get()}")
    assert(ExternalSpecState.lookups.get() == 5,
      s"10 distinct keys / batchSize 2 = 5 calls, got ${ExternalSpecState.lookups.get()}")
  }

  test("asyncBatchLookup: a poison batch fails only its own elements") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val out = (1 to 20).toDS().coalesce(1)
      .asyncBatchLookup[Int, Int](batchSize = 2)(identity) { ks =>
        if (ks.contains(13)) Future.failed(new RuntimeException("boom"))
        else Future(ks.map(k => k -> k * 2).toMap)
      }
      .collect().toSeq
    val (failed, ok) = out.partition(_._3.isDefined)
    // batches are consecutive pairs: {13,14} is the poison batch
    assert(failed.map(_._1).sorted == Seq(13, 14), s"failed=${failed.map(_._1).sorted}")
    assert(failed.forall(_._3.exists(_.contains("boom"))))
    assert(ok.size == 18 && ok.forall { case (i, v, _) => v.contains(i * 2) })
  }

  test("asyncBatchLookup: a key missing from the response fails only that key") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val out = (1 to 10).toDS().coalesce(1)
      .asyncBatchLookup[Int, Int](batchSize = 5)(identity) { ks =>
        Future(ks.filterNot(_ == 7).map(k => k -> k).toMap) // omit key 7
      }
      .collect().toSeq
    val bad = out.filter(_._1 == 7)
    assert(bad.size == 1 && bad.head._3.exists(_.contains("UnmatchedRequest")))
    assert(out.filter(_._1 != 7).forall { case (i, v, e) => v.contains(i) && e.isEmpty })
  }

  test("lookupWithCache: repeated keys hit the service once per task") {
    ExternalSpecState.reset()
    val keys = (1 to 100).map(i => s"k${i % 5}")   // 5 distinct keys, 100 rows
    val out = keys.toDS().coalesce(1)
      .lookupWithCache(maxCacheEntries = 10)(identity) { k =>
        ExternalSpecState.lookups.incrementAndGet(); s"v-$k"
      }
      .collect()
    assert(out.length == 100)
    assert(out.forall { case (k, v) => v == s"v-$k" })
    assert(ExternalSpecState.lookups.get() == 5,
      s"lookups=${ExternalSpecState.lookups.get()} (cache must dedupe)")
  }

  test("lookupWithCache: LRU evicts beyond maxCacheEntries") {
    ExternalSpecState.reset()
    // 3 distinct keys cycled with cache of 2 → evictions force re-lookups
    val keys = Seq.fill(10)(Seq("a", "b", "c")).flatten
    keys.toDS().coalesce(1)
      .lookupWithCache(maxCacheEntries = 2)(identity) { k =>
        ExternalSpecState.lookups.incrementAndGet(); k.toUpperCase
      }
      .collect()
    assert(ExternalSpecState.lookups.get() > 3, "cycling 3 keys through a 2-entry LRU must evict")
  }

  test("rateLimited: throughput bounded per task") {
    val t0 = System.nanoTime()
    val n = (1 to 20).toDS().coalesce(1).rateLimited(100.0).collect().length
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(n == 20)
    // 20 elements at 100/sec = ≥190ms of pacing (first is free)
    assert(elapsedMs >= 150, s"elapsed ${elapsedMs}ms — rate limit not applied")
  }

  test("safeFlatMap: poison records route to the error output") {
    val ds = Seq("1", "2", "x", "3", "y").toDS()
    val (ok, err) = ds.safeFlatMap(s => List(s.toInt))
    assert(ok.collect().sorted.toSeq == Seq(1, 2, 3))
    val errs = err.collect().toMap
    assert(errs.keySet == Set("x", "y"))
    assert(errs.values.forall(_.contains("NumberFormatException")))
  }

  test("safeMap: one-to-one flavor") {
    val (ok, err) = Seq("10", "zz").toDS().safeMap(_.toInt * 2)
    assert(ok.collect().toSeq == Seq(20))
    assert(err.collect().map(_._1).toSeq == Seq("zz"))
  }

  test("pipe: lines stream through an external command per task") {
    val out = Seq("hello", "world", "spark").toDS().repartition(2)
      .pipe(Seq("tr", "a-z", "A-Z"))
      .collect().sorted.toSeq
    assert(out == Seq("HELLO", "SPARK", "WORLD"))
  }

  test("pipe: large stream does not deadlock on the pipe buffer") {
    val lines = (1 to 20000).map(i => s"line-$i-" + "x" * 100)
    val out = lines.toDS().coalesce(1).pipe(Seq("cat")).collect()
    assert(out.length == 20000)
  }

  test("pipe: non-zero exit fails the task loudly") {
    intercept[org.apache.spark.SparkException] {
      Seq("a").toDS().coalesce(1).pipe(Seq("false")).collect()
    }
  }
}
