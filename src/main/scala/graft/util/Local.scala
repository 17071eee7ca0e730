package graft.util

import scala.collection.mutable

/** Driver/executor-local helpers mirroring the reference's in-JVM
  * utility surface (scio-extra Collections.scala:38 `top`/`topByKey`
  * over plain collections; Iterators.scala:45 time-series windowing
  * over plain iterators). In graft these earn their keep INSIDE
  * `mapPartitions`: a timestamp-sorted partition can be windowed
  * element-by-element without materializing it, and per-group local
  * top-k runs bounded-memory inside a task. Pipeline-level top-k /
  * windowing stays with the Dataset operators — these are for the
  * imperative tail where typed per-partition logic genuinely needs
  * them.
  */
object Local {

  // ---- bounded top-k ------------------------------------------------

  /** Greatest `num` elements by `ord`, descending. Bounded memory: a
    * size-capped min-heap of the current best — O(n log num), never
    * a full sort.
    */
  def top[T](xs: IterableOnce[T], num: Int)(implicit ord: Ordering[T]): Seq[T] = {
    require(num > 0, s"num must be > 0, got $num")
    val heap = mutable.PriorityQueue.empty[T](ord.reverse) // min-heap of the kept set
    xs.iterator.foreach { x =>
      if (heap.size < num) heap.enqueue(x)
      else if (ord.gt(x, heap.head)) { heap.dequeue(); heap.enqueue(x) }
    }
    heap.dequeueAll.reverse.toSeq
  }

  /** Per-key greatest `num` values, each list descending; one bounded
    * heap per key.
    */
  def topByKey[K, V](xs: IterableOnce[(K, V)], num: Int)
                    (implicit ord: Ordering[V]): Map[K, Seq[V]] = {
    require(num > 0, s"num must be > 0, got $num")
    val heaps = mutable.Map.empty[K, mutable.PriorityQueue[V]]
    xs.iterator.foreach { case (k, v) =>
      val heap = heaps.getOrElseUpdate(k, mutable.PriorityQueue.empty[V](ord.reverse))
      if (heap.size < num) heap.enqueue(v)
      else if (ord.gt(v, heap.head)) { heap.dequeue(); heap.enqueue(v) }
    }
    heaps.iterator.map { case (k, h) => k -> h.dequeueAll.reverse.toSeq }.toMap
  }

  implicit final class TopOps[T](private val self: Iterable[T]) extends AnyVal {
    def localTop(num: Int)(implicit ord: Ordering[T]): Seq[T] = top(self, num)
  }

  implicit final class TopByKeyOps[K, V](private val self: Iterable[(K, V)]) extends AnyVal {
    def localTopByKey(num: Int)(implicit ord: Ordering[V]): Map[K, Seq[V]] =
      topByKey(self, num)
  }

  // ---- time-series windows over a sorted iterator --------------------

  // true floored division: correct for ts below offset (pre-epoch /
  // negative timestamps), where the truncating `/` would round toward
  // zero and clamp every such element into one bogus window
  private def floorTo(ts: Long, size: Long, offset: Long): Long =
    Math.floorDiv(ts - offset, size) * size + offset

  /** Windowing views over a TIMESTAMP-ORDERED iterator — the caller
    * guarantees non-decreasing `tsOf` (a sorted partition, a merge of
    * sorted runs). All windows are half-open `[start, start + size)`.
    */
  final class TimeSeries[T] private[Local] (it: Iterator[T], tsOf: T => Long) {

    /** Non-overlapping windows `[N·size+offset, (N+1)·size+offset)`;
      * empty windows are skipped.
      */
    def fixed(size: Long, offset: Long = 0L): Iterator[Seq[T]] = {
      require(size > 0, s"size must be > 0, got $size")
      require(offset >= 0 && offset < size, s"offset must be in [0, size), got $offset")
      val in = it.buffered
      // captured before the anon class: Iterator's inherited `size`
      // member would otherwise shadow the parameter inside it
      val (sz, off) = (size, offset)
      new Iterator[Seq[T]] {
        override def hasNext: Boolean = in.hasNext
        override def next(): Seq[T] = {
          val head = in.next()
          val end = floorTo(tsOf(head), sz, off) + sz
          val buf = mutable.ArrayBuffer(head)
          while (in.hasNext && tsOf(in.head) < end) buf += in.next()
          buf.toSeq
        }
      }
    }

    /** Maximal runs where consecutive elements are less than
      * `gap` apart.
      */
    def session(gap: Long): Iterator[Seq[T]] = {
      require(gap > 0, s"gap must be > 0, got $gap")
      val in = it.buffered
      new Iterator[Seq[T]] {
        override def hasNext: Boolean = in.hasNext
        override def next(): Seq[T] = {
          val buf = mutable.ArrayBuffer(in.next())
          var last = tsOf(buf.head)
          while (in.hasNext && tsOf(in.head) - last < gap) {
            val e = in.next(); last = tsOf(e); buf += e
          }
          buf.toSeq
        }
      }
    }

    /** Possibly overlapping windows `[N·period+offset, N·period+offset+size)`,
      * one per period: an element appears in every window whose
      * interval contains it (≈ size/period of them). Empty windows
      * are skipped (the sequence re-anchors on the next element);
      * `period > size` leaves gaps — elements falling between windows
      * are discarded, documented. (The reference's iterator documents
      * these interval semantics but its drain loop empties the whole
      * buffer per window, so elements never repeat; this implements
      * the documented contract.)
      */
    def sliding(size: Long, period: Long = 1L, offset: Long = 0L): Iterator[Seq[T]] = {
      require(size > 0, s"size must be > 0, got $size")
      require(offset >= 0 && offset < size, s"offset must be in [0, size), got $offset")
      require(period > offset, s"period must be > offset, got $period <= $offset")
      val in = it.buffered
      // captured before the anon class (see fixed(): member shadowing)
      val (sz, per, off) = (size, period, offset)
      new Iterator[Seq[T]] {
        // elements of the CURRENT window [w, w+sz), in order; retained
        // across next() calls while still inside later windows
        private val window = mutable.Queue.empty[T]
        private var w = 0L
        private var anchored = false

        /** Earliest window start whose interval contains `t`. */
        private def firstStart(t: Long): Long = floorTo(t - sz, per, off) + per

        private def advance(): Unit = {
          while (!anchored && in.hasNext) {
            val t = tsOf(in.head)
            val c = firstStart(t)
            if (c > t) in.next() // period > size gap: in no window — discard
            else { w = c; anchored = true }
          }
          if (anchored)
            while (in.hasNext && tsOf(in.head) < w + sz) window.enqueue(in.next())
        }

        override def hasNext: Boolean = { advance(); window.nonEmpty }

        override def next(): Seq[T] = {
          advance()
          val out = window.toSeq
          w += per // retire only elements outside the NEXT window
          while (window.nonEmpty && tsOf(window.head) < w) window.dequeue()
          if (window.isEmpty) anchored = false // re-anchor past empty stretches
          out
        }
      }
    }
  }

  implicit final class TimeSeriesOps[T](private val self: Iterator[T]) extends AnyVal {
    /** Window this (timestamp-ordered) iterator by event time. */
    def timeSeries(tsOf: T => Long): TimeSeries[T] = new TimeSeries(self, tsOf)
  }
}
