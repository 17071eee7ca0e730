package graft.testing

import org.apache.spark.sql.{Dataset, Encoder}
import org.scalatest.matchers.{MatchResult, Matcher}

/** Scio-test-parity assertion DSL over Spark Datasets.
  *
  * Mirrors the user-facing surface of the reference's
  * `scio-test/core/src/main/scala/com/spotify/scio/testing/SCollectionMatchers.scala`
  * (containInAnyOrder:330, containSingleValue:351, containValue:370,
  * beEmpty:399, haveSize:417, equalMapOf:429, satisfy:447,
  * satisfySingleValue:471, forAll:492, exist:501) re-expressed for
  * `Dataset[T]`: where Beam runs assertions inside the pipeline via
  * `PAssert`, Spark's equivalent is a distributed predicate evaluated as a
  * plan (filter + limited sample) so the matcher never materializes more
  * than the expected set plus a bounded violation sample on the driver.
  *
  * `forAll` / `exist` / `beEmpty` / `haveSize` are fully distributed: the
  * dataset itself is never collected, only counts and a ≤5-row diagnostic
  * sample cross to the driver — safe against a 100 TB input by
  * construction. `containInAnyOrder` / `equalMapOf` / `satisfy` compare
  * against a driver-provided expected value and therefore collect the
  * actual side; that is inherent to the assertion (the expected multiset
  * already lives on the driver) and matches the reference's semantics.
  *
  * Ships as the `graft-testing` module (exactly as scio-test is a
  * separate module from scio-core): scalatest is a compile dependency
  * HERE, and downstream jobs add graft-testing at test scope.
  *
  * Usage:
  * {{{
  * class MyPipelineSpec extends GraftPipelineSpec {
  *   test("word count") {
  *     val out = wordCount(input)
  *     out should containInAnyOrder(Seq("a" -> 2L, "b" -> 1L))
  *     out should forAll[(String, Long)](_._2 > 0)
  *   }
  * }
  * }}}
  */
trait DatasetMatchers {

  /** Max violating rows fetched for a failure message. */
  private val SampleN = 5

  private def fmt(xs: Seq[Any]): String = xs.mkString("[", ", ", "]")

  /** Multiset equality with the expected elements, any order.
    * Reference: SCollectionMatchers.scala:330 `containInAnyOrder`.
    */
  def containInAnyOrder[T](expected: Iterable[T]): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val want = expected.groupBy(identity).map { case (k, v) => (k, v.size) }
      val got = ds.collect().toSeq.groupBy(identity).map { case (k, v) => (k, v.size) }
      val missing = want.collect {
        case (k, n) if got.getOrElse(k, 0) < n => k
      }.toSeq
      val extra = got.collect {
        case (k, n) if want.getOrElse(k, 0) < n => k
      }.toSeq
      MatchResult(
        missing.isEmpty && extra.isEmpty,
        s"Dataset did not contain expected elements in any order; " +
          s"missing: ${fmt(missing.take(SampleN))}, unexpected: ${fmt(extra.take(SampleN))}",
        "Dataset contained exactly the expected elements"
      )
    }

  /** Exactly one element, equal to `value`.
    * Reference: SCollectionMatchers.scala:351 `containSingleValue`.
    */
  def containSingleValue[T](value: T): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val got = ds.limit(2).collect().toSeq
      MatchResult(
        got.length == 1 && got.head == value,
        s"Dataset did not contain the single value $value; saw ${fmt(got)}" +
          (if (got.length == 2) " (and possibly more)" else ""),
        s"Dataset contained the single value $value"
      )
    }

  /** Contains `value` at least once (no claim about other elements).
    * Reference: SCollectionMatchers.scala:370 `containValue`.
    * Distributed: evaluates as a filter + limit(1), never a full collect.
    */
  def containValue[T](value: T): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val found = !ds.filter((t: T) => t == value).isEmpty
      MatchResult(
        found,
        s"Dataset did not contain value $value",
        s"Dataset contained value $value"
      )
    }

  /** No elements. Reference: SCollectionMatchers.scala:399 `beEmpty`.
    * Distributed: `isEmpty` plans a limit(1).
    */
  def beEmptyDataset: Matcher[Dataset[_]] =
    Matcher { (ds: Dataset[_]) =>
      MatchResult(
        ds.isEmpty,
        s"Dataset was not empty; first rows: ${fmt(ds.asInstanceOf[Dataset[Any]].take(SampleN).toSeq)}",
        "Dataset was empty"
      )
    }

  /** Exactly `size` elements. Reference: SCollectionMatchers.scala:417
    * `haveSize`. Distributed count.
    */
  def haveSize(size: Long): Matcher[Dataset[_]] =
    Matcher { (ds: Dataset[_]) =>
      val n = ds.count()
      MatchResult(
        n == size,
        s"Dataset expected size: $size, actual: $n",
        s"Dataset had size $size"
      )
    }

  /** Key-value dataset equals the map exactly (same keys, same values,
    * no duplicates). Reference: SCollectionMatchers.scala:429 `equalMapOf`.
    */
  def equalMapOf[K, V](expected: Map[K, V]): Matcher[Dataset[(K, V)]] =
    Matcher { (ds: Dataset[(K, V)]) =>
      val got = ds.collect().toSeq
      val dupKeys = got.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }.toSeq
      val gotMap = got.toMap
      val diff =
        (expected.keySet ++ gotMap.keySet).toSeq.filter(k => expected.get(k) != gotMap.get(k))
      MatchResult(
        dupKeys.isEmpty && diff.isEmpty,
        s"Dataset did not equal the expected map; duplicate keys: ${fmt(dupKeys.take(SampleN))}, " +
          s"mismatched keys: ${fmt(diff.take(SampleN).map(k => s"$k -> expected ${expected.get(k)}, got ${gotMap.get(k)}"))}",
        "Dataset equaled the expected map"
      )
    }

  /** The materialized contents satisfy the predicate.
    * Reference: SCollectionMatchers.scala:447 `satisfy`.
    */
  def satisfy[T](pred: Iterable[T] => Boolean): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      MatchResult(
        pred(ds.collect().toSeq),
        "Dataset contents did not satisfy the predicate",
        "Dataset contents satisfied the predicate"
      )
    }

  /** Exactly one element and it satisfies the predicate.
    * Reference: SCollectionMatchers.scala:471 `satisfySingleValue`.
    */
  def satisfySingleValue[T](pred: T => Boolean): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val got = ds.limit(2).collect().toSeq
      MatchResult(
        got.length == 1 && pred(got.head),
        s"Dataset did not contain a single value satisfying the predicate; saw ${fmt(got)}",
        "Dataset contained a single satisfying value"
      )
    }

  /** Every element satisfies the predicate.
    * Reference: SCollectionMatchers.scala:492 `forAll`.
    * Distributed: plans `filter(!pred).take(sample)`; only violations
    * cross to the driver.
    */
  def forAll[T](pred: T => Boolean): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val bad = ds.filter((t: T) => !pred(t)).take(SampleN).toSeq
      MatchResult(
        bad.isEmpty,
        s"Dataset had elements violating the predicate, e.g. ${fmt(bad)}",
        "all Dataset elements satisfied the predicate"
      )
    }

  /** At least one element satisfies the predicate.
    * Reference: SCollectionMatchers.scala:501 `exist`.
    * Distributed: plans `filter(pred).limit(1)`.
    */
  def exist[T](pred: T => Boolean): Matcher[Dataset[T]] =
    Matcher { (ds: Dataset[T]) =>
      val found = !ds.filter((t: T) => pred(t)).isEmpty
      MatchResult(
        found,
        "no Dataset element satisfied the predicate",
        "a Dataset element satisfied the predicate"
      )
    }
}

object DatasetMatchers extends DatasetMatchers
