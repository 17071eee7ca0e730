package graft.syntax

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/** External-service integration verbs — the Spark re-expression of the
  * reference's `scio-core transforms` package (DoFnWithResource,
  * ParallelismDoFns, BaseAsyncDoFn/AsyncLookupDoFn, RateLimiterDoFn,
  * PipeDoFn, SCollectionSafeSyntax.safeFlatMap, FileDownloadDoFn).
  *
  * Beam's unit of resource scope is the DoFn instance; Spark's is the
  * TASK (one partition attempt). Every verb here follows that mapping:
  * resources/pools/processes are created lazily per task and torn down
  * by a `TaskContext` completion listener, so a straggler retry or
  * speculative attempt gets its own instance — the same isolation the
  * reference gets from DoFn setup/teardown.
  *
  * These verbs exist for EXTERNAL effects (service calls, subprocess
  * codecs, native clients). For anything expressible as data, the
  * declarative operators win at scale — e.g. an external KV lookup
  * that can ship as a table should be `hashLookup`/`sparseLookup`
  * (broadcast/Bloom joins), not `mapAsyncUnordered` against an RPC.
  *
  * `import graft.syntax.external._`.
  */
object external {

  private def daemonFactory(name: String): ThreadFactory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger()
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-$name-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  }

  private def onTaskEnd(body: => Unit): Unit = {
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => body)
  }

  implicit class ExternalOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Reference `DoFnWithResource` / `SCollectionWithResourceSyntax`
      * (`mapWithResource`): apply `f` with a per-task resource,
      * created on first use and closed when the task completes
      * (success OR failure). Beam's `ResourceType.PER_INSTANCE` ↦
      * per-task — each partition attempt owns one resource.
      */
    def mapWithResource[R, U: Encoder](create: () => R, close: R => Unit)(
        f: (R, T) => U): Dataset[U] =
      ds.mapPartitions { it =>
        lazy val r: R = {
          val res = create()
          onTaskEnd(close(res))
          res
        }
        it.map(t => f(r, t))
      }

    /** Reference `flatMapWithResource`. */
    def flatMapWithResource[R, U: Encoder](create: () => R, close: R => Unit)(
        f: (R, T) => IterableOnce[U]): Dataset[U] =
      ds.mapPartitions { it =>
        lazy val r: R = {
          val res = create()
          onTaskEnd(close(res))
          res
        }
        it.flatMap(t => f(r, t))
      }

    /** Reference `collectWithResource`: filter + map by a partial
      * function sharing the per-task resource.
      */
    def collectWithResource[R, U: Encoder](create: () => R, close: R => Unit)(
        pf: PartialFunction[(R, T), U]): Dataset[U] =
      ds.mapPartitions { it =>
        lazy val r: R = {
          val res = create()
          onTaskEnd(close(res))
          res
        }
        it.flatMap(t => pf.lift((r, t)))
      }

    /** Reference `filterWithResource`. */
    def filterWithResource[R](create: () => R, close: R => Unit)(
        pred: (R, T) => Boolean)(implicit te: Encoder[T]): Dataset[T] =
      ds.mapPartitions { it =>
        lazy val r: R = {
          val res = create()
          onTaskEnd(close(res))
          res
        }
        it.filter(t => pred(r, t))
      }

    /** Reference `ParallelismDoFns` (`mapWithParallelism`) +
      * `ScalaAsyncDoFn`: evaluate `f` with up to `parallelism`
      * in-flight elements per task, preserving input order. For
      * I/O-bound externals only — CPU-bound work should rely on task
      * parallelism (more partitions), not thread pools inside tasks.
      * The pool is per-task, daemon, and shut down on task completion.
      */
    def mapWithParallelism[U: Encoder](parallelism: Int)(f: T => U): Dataset[U] = {
      require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
      ds.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pool = Executors.newFixedThreadPool(parallelism, daemonFactory("par"))
          onTaskEnd { pool.shutdown(); pool.awaitTermination(10, TimeUnit.SECONDS); () }
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val inflight = mutable.Queue.empty[Future[U]]
          new Iterator[U] {
            private def fill(): Unit =
              while (inflight.size < parallelism && it.hasNext) {
                val t = it.next()
                inflight += Future(f(t))
              }
            override def hasNext: Boolean = { fill(); inflight.nonEmpty }
            override def next(): U = { fill(); Await.result(inflight.dequeue(), Duration.Inf) }
          }
        }
      }
    }

    /** Reference `filterWithParallelism`: bounded-concurrency
      * predicate evaluation (an external validity check), order
      * preserved.
      */
    def filterWithParallelism(parallelism: Int)(pred: T => Boolean)(
        implicit te: Encoder[T]): Dataset[T] = {
      require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
      ds.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pool = Executors.newFixedThreadPool(parallelism, daemonFactory("par"))
          onTaskEnd { pool.shutdown(); pool.awaitTermination(10, TimeUnit.SECONDS); () }
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val inflight = mutable.Queue.empty[Future[(T, Boolean)]]
          new Iterator[(T, Boolean)] {
            private def fill(): Unit =
              while (inflight.size < parallelism && it.hasNext) {
                val t = it.next()
                inflight += Future((t, pred(t)))
              }
            override def hasNext: Boolean = { fill(); inflight.nonEmpty }
            override def next(): (T, Boolean) = { fill(); Await.result(inflight.dequeue(), Duration.Inf) }
          }.collect { case (t, true) => t }
        }
      }
    }

    /** Reference `collectWithParallelism`: partial function under the
      * bounded-concurrency window.
      */
    def collectWithParallelism[U: Encoder](parallelism: Int)(
        pf: PartialFunction[T, U]): Dataset[U] = {
      require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
      ds.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pool = Executors.newFixedThreadPool(parallelism, daemonFactory("par"))
          onTaskEnd { pool.shutdown(); pool.awaitTermination(10, TimeUnit.SECONDS); () }
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val inflight = mutable.Queue.empty[Future[Option[U]]]
          new Iterator[Option[U]] {
            private def fill(): Unit =
              while (inflight.size < parallelism && it.hasNext) {
                val t = it.next()
                inflight += Future(pf.lift(t))
              }
            override def hasNext: Boolean = { fill(); inflight.nonEmpty }
            override def next(): Option[U] = { fill(); Await.result(inflight.dequeue(), Duration.Inf) }
          }.flatten
        }
      }
    }

    /** Async flavor: `f` already returns a Future (an async client);
      * bounded in-flight window, order preserved. Reference
      * `ScalaAsyncDoFn.processElement`.
      */
    def mapAsync[U: Encoder](parallelism: Int)(f: T => Future[U]): Dataset[U] = {
      require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
      ds.mapPartitions { it =>
        val inflight = mutable.Queue.empty[Future[U]]
        new Iterator[U] {
          private def fill(): Unit =
            while (inflight.size < parallelism && it.hasNext) inflight += f(it.next())
          override def hasNext: Boolean = { fill(); inflight.nonEmpty }
          override def next(): U = { fill(); Await.result(inflight.dequeue(), Duration.Inf) }
        }
      }
    }

    /** Reference `BaseAsyncLookupDoFn` with its `CacheSupplier`:
      * keyed external lookup memoized per task, bounded LRU — repeated
      * keys inside a partition hit the external service once. (A
      * lookup whose table can ship to the cluster should be
      * `hashLookup`/`sparseLookup` instead; this is for live services.)
      * Sorting/clustering by key upstream maximizes the hit rate.
      */
    def lookupWithCache[K, U](maxCacheEntries: Int)(key: T => K)(lookup: K => U)(
        implicit oe: Encoder[(T, U)]): Dataset[(T, U)] = {
      require(maxCacheEntries >= 1, s"maxCacheEntries must be >= 1, got $maxCacheEntries")
      ds.mapPartitions { it =>
        val cache = new java.util.LinkedHashMap[K, U](16, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[K, U]): Boolean =
            size() > maxCacheEntries
        }
        it.map { t =>
          val k = key(t)
          val v = if (cache.containsKey(k)) cache.get(k) else {
            val u = lookup(k); cache.put(k, u); u
          }
          (t, v)
        }
      }
    }

    /** Reference `BaseAsyncBatchLookupDoFn` / `ScalaAsyncBatchLookupDoFn`
      * (scio-core transforms/BaseAsyncBatchLookupDoFn.java,
      * ScalaAsyncBatchLookupDoFn.scala): batch up to `batchSize`
      * DISTINCT keys, issue ONE async call per batch, fan results back
      * out to every buffered input — the shape real enrichment / LLM
      * scoring endpoints charge for. Reference semantics kept:
      *  - requests dedupe by key; an element whose key is already
      *    waiting (pending OR in flight) piggybacks on that request;
      *  - at most `maxPending` batch futures in flight (semaphore);
      *  - per-BATCH failure isolation: a failed batch marks only its
      *    own elements failed, other batches proceed;
      *  - a key missing from the response map fails only that key's
      *    elements (the reference's UnmatchedRequestException);
      *  - optional bounded LRU cache (the `CacheSupplier` surface of
      *    [[lookupWithCache]]); hits short-circuit the service.
      * Output is (input, Some(value), None) on success and
      * (input, None, Some("className: message")) on failure — same
      * platform delta as [[safeFlatMap]] (Throwables don't encode).
      */
    def asyncBatchLookup[K, U](batchSize: Int, maxPending: Int = 4,
        maxCacheEntries: Int = 0)(key: T => K)(
        batchLookup: Seq[K] => Future[Map[K, U]])(
        implicit oe: Encoder[(T, Option[U], Option[String])]): Dataset[(T, Option[U], Option[String])] = {
      require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
      require(maxPending >= 1, s"maxPending must be >= 1, got $maxPending")
      require(maxCacheEntries >= 0, s"maxCacheEntries must be >= 0, got $maxCacheEntries")
      ds.mapPartitions { it =>
        val cache: java.util.LinkedHashMap[K, U] =
          if (maxCacheEntries == 0) null
          else new java.util.LinkedHashMap[K, U](16, 0.75f, true) {
            override def removeEldestEntry(e: java.util.Map.Entry[K, U]): Boolean =
              size() > maxCacheEntries
          }
        val out = mutable.Queue.empty[(T, Option[U], Option[String])]
        // key → every input waiting on it, across the pending batch AND
        // all in-flight batches (the reference's `inputs` map)
        val waiting = mutable.Map.empty[K, mutable.Buffer[T]]
        val batchKeys = mutable.Buffer.empty[K]
        val inflight = mutable.Queue.empty[(Future[Map[K, U]], Seq[K])]

        def drainOne(): Unit = {
          val (f, keys) = inflight.dequeue()
          Try(Await.result(f, Duration.Inf)) match {
            case Success(m) =>
              keys.foreach { k =>
                val ts = waiting.remove(k).getOrElse(mutable.Buffer.empty)
                m.get(k) match {
                  case Some(v) =>
                    if (cache != null) cache.put(k, v)
                    ts.foreach(t => out += ((t, Some(v), None)))
                  case None => ts.foreach(t => out +=
                    ((t, None, Some(s"UnmatchedRequest: no value for key $k"))))
                }
              }
            case Failure(e) =>
              val msg = s"${e.getClass.getName}: ${e.getMessage}"
              keys.foreach { k =>
                waiting.remove(k).getOrElse(mutable.Buffer.empty)
                  .foreach(t => out += ((t, None, Some(msg))))
              }
          }
        }

        def issue(): Unit = if (batchKeys.nonEmpty) {
          val keys = batchKeys.toList
          batchKeys.clear()
          while (inflight.size >= maxPending) drainOne()
          val f = Try(batchLookup(keys)) match {
            case Success(fut) => fut
            case Failure(e)   => Future.failed(e)
          }
          inflight += (f -> keys)
        }

        new Iterator[(T, Option[U], Option[String])] {
          override def hasNext: Boolean = {
            while (out.isEmpty &&
              (it.hasNext || batchKeys.nonEmpty || inflight.nonEmpty)) {
              if (it.hasNext) {
                val t = it.next()
                val k = key(t)
                val cached = if (cache != null && cache.containsKey(k))
                  Some(cache.get(k)) else None
                cached match {
                  case Some(v) => out += ((t, Some(v), None))
                  case None => waiting.get(k) match {
                    case Some(buf) => buf += t // piggyback, no new request
                    case None =>
                      waiting(k) = mutable.Buffer(t)
                      batchKeys += k
                      if (batchKeys.size >= batchSize) issue()
                  }
                }
              } else if (batchKeys.nonEmpty) issue()
              else drainOne()
            }
            out.nonEmpty
          }
          override def next(): (T, Option[U], Option[String]) = {
            if (!hasNext) throw new NoSuchElementException("asyncBatchLookup")
            out.dequeue()
          }
        }
      }
    }

    /** Reference `RateLimiterDoFn`: bound the per-TASK throughput to
      * `permitsPerSec` elements/sec (Beam's unit is the DoFn instance;
      * the cluster-wide rate is permitsPerSec × concurrent tasks —
      * size it accordingly, exactly as scio users size per-worker
      * rates). Simple monotonic-clock pacing, no burst debt.
      */
    def rateLimited(permitsPerSec: Double)(implicit te: Encoder[T]): Dataset[T] = {
      require(permitsPerSec > 0, s"permitsPerSec must be > 0, got $permitsPerSec")
      ds.mapPartitions { it =>
        val intervalNanos = (1e9 / permitsPerSec).toLong
        var nextFree = 0L
        it.map { t =>
          val now = System.nanoTime()
          if (nextFree == 0L) nextFree = now
          val wait = nextFree - now
          if (wait > 0) {
            Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          }
          nextFree += intervalNanos
          t
        }
      }
    }

    /** Reference `SCollectionSafeSyntax.safeFlatMap`: apply `f`,
      * routing elements that THROW to an error output instead of
      * failing the job — the latency-optimized "don't retry the whole
      * bundle for one poison record" verb. Returns (successes,
      * failures-with-reason). Platform delta, stated: Spark Encoders
      * cannot serialize arbitrary Throwables, so the error output
      * carries `className: message`; and each output is its own plan —
      * `f` runs once per MATERIALIZED output (persist upstream if `f`
      * is expensive), where Beam multiplexes one pass into two side
      * outputs. `f` must be deterministic for the two views to agree.
      */
    def safeFlatMap[U: Encoder](f: T => IterableOnce[U])(
        implicit ete: Encoder[(T, String)]): (Dataset[U], Dataset[(T, String)]) = {
      val ok = ds.flatMap { t =>
        Try(f(t).iterator.toSeq) match {
          case Success(us) => us
          case Failure(_)  => Nil
        }
      }
      val err = ds.flatMap { t =>
        Try(f(t).iterator.foreach(_ => ())) match {
          case Success(_) => Nil
          case Failure(e) => List((t, s"${e.getClass.getName}: ${e.getMessage}"))
        }
      }
      (ok, err)
    }

    /** safeMap: one-to-one flavor of [[safeFlatMap]]. */
    def safeMap[U: Encoder](f: T => U)(
        implicit ete: Encoder[(T, String)]): (Dataset[U], Dataset[(T, String)]) =
      safeFlatMap(t => List(f(t)))
  }

  implicit class PipeOps(private val ds: Dataset[String]) extends AnyVal {

    /** Reference `PipeDoFn` / `SCollectionPipeSyntax.pipe`: stream the
      * partition's lines through an external command's stdin and emit
      * its stdout lines — one subprocess per task, fed by a writer
      * thread (so producer and consumer can't deadlock on the pipe
      * buffer), reaped on task completion. Line-oriented, like the
      * reference's default framing. A non-zero exit fails the task
      * loudly (retry gets a fresh process).
      */
    def pipe(cmd: Seq[String], env: Map[String, String] = Map.empty)(
        implicit se: Encoder[String]): Dataset[String] = {
      require(cmd.nonEmpty, "pipe command must be non-empty")
      ds.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pb = new ProcessBuilder(cmd: _*)
          env.foreach { case (k, v) => pb.environment().put(k, v) }
          pb.redirectErrorStream(false)
          val proc = pb.start()
          onTaskEnd { if (proc.isAlive) proc.destroyForcibly(); () }
          val writer = new Thread(() => {
            val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
              proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
            try it.foreach(out.println) finally out.close()
          }, "graft-pipe-writer")
          writer.setDaemon(true)
          writer.start()
          val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
            proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
          new Iterator[String] {
            private var line = reader.readLine()
            override def hasNext: Boolean = {
              if (line == null) {
                val rc = proc.waitFor()
                require(rc == 0, s"pipe command ${cmd.mkString(" ")} exited with $rc")
              }
              line != null
            }
            override def next(): String = {
              val l = line; line = reader.readLine(); l
            }
          }
        }
      }
    }
  }
}
