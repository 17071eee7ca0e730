package graft.testing

import org.scalatest.exceptions.TestFailedException

/** Exercises the scio-test-parity DSL end-to-end, including that each
  * matcher FAILS when it should (a matcher that never fails is worse
  * than none).
  */
class DatasetMatchersSpec extends GraftPipelineSpec {
  import spark.implicits._

  private def fails(body: => Unit): Unit =
    intercept[TestFailedException](body)

  test("containInAnyOrder matches multisets regardless of order") {
    val ds = datasetOf(Seq("b", "a", "b"))
    ds should containInAnyOrder(Seq("a", "b", "b"))
    fails(ds should containInAnyOrder(Seq("a", "b")))        // multiset, not set
    fails(ds should containInAnyOrder(Seq("a", "b", "c")))
    ds shouldNot containInAnyOrder(Seq("a"))
  }

  test("containSingleValue requires exactly one element") {
    datasetOf(Seq(42)) should containSingleValue(42)
    fails(datasetOf(Seq(42, 42)) should containSingleValue(42))
    fails(datasetOf(Seq.empty[Int]) should containSingleValue(42))
    fails(datasetOf(Seq(41)) should containSingleValue(42))
  }

  test("containValue finds one element without claims about the rest") {
    val ds = datasetOf(Seq(1, 2, 3))
    ds should containValue(2)
    fails(ds should containValue(9))
    ds shouldNot containValue(9)
  }

  test("beEmptyDataset and haveSize are distributed counts") {
    datasetOf(Seq.empty[String]) should beEmptyDataset
    fails(datasetOf(Seq("x")) should beEmptyDataset)
    datasetOf(Seq(1, 2, 3)) should haveSize(3)
    fails(datasetOf(Seq(1, 2, 3)) should haveSize(2))
  }

  test("equalMapOf checks keys, values, and duplicates") {
    val ds = datasetOf(Seq("a" -> 1, "b" -> 2))
    ds should equalMapOf(Map("a" -> 1, "b" -> 2))
    fails(ds should equalMapOf(Map("a" -> 1)))
    fails(ds should equalMapOf(Map("a" -> 1, "b" -> 3)))
    // duplicate key in the dataset → not equal to any map
    fails(datasetOf(Seq("a" -> 1, "a" -> 1)) should equalMapOf(Map("a" -> 1)))
  }

  test("satisfy and satisfySingleValue") {
    val ds = datasetOf(Seq(1, 2, 3))
    ds should satisfy[Int](_.sum == 6)
    fails(ds should satisfy[Int](_.sum == 7))
    datasetOf(Seq(10)) should satisfySingleValue[Int](_ > 5)
    fails(datasetOf(Seq(10, 11)) should satisfySingleValue[Int](_ > 5))
  }

  test("forAll and exist evaluate distributed with bounded samples") {
    val ds = datasetOf(1 to 1000)
    ds should forAll[Int](_ > 0)
    fails(ds should forAll[Int](_ > 1))
    ds should exist[Int](_ == 999)
    fails(ds should exist[Int](_ > 1000))
  }

  test("runWithData lifts, transforms, collects — 1/2/3 input arities") {
    val out = runWithData(Seq("a b", "b"))(ds => ds.flatMap(_.split(" ")).groupByKey(identity).count())
    out.toMap shouldBe Map("a" -> 1L, "b" -> 2L)

    val joined = runWithData(Seq(1 -> "x"), Seq(1 -> 10))((l, r) => l.joinWith(r, l("_1") === r("_1")))
    joined shouldBe Seq(((1, "x"), (1, 10)))

    val tri = runWithData(Seq(1), Seq(2), Seq(3))((a, b, c) => a.union(b).union(c))
    tri.sorted shouldBe Seq(1, 2, 3)
  }

  test("approximation assertions mirror the reference bounds") {
    import ApproximationAssertions._
    // expected 1000 ± 5% → [950, 1050]
    (Seq(980L): Iterable[Long]) shouldApproximate withErrorRate(Seq(1000L), 5.0)
    intercept[AssertionError] {
      (Seq(1051L): Iterable[Long]) shouldApproximate withErrorRate(Seq(1000L), 5.0)
    }
    intercept[AssertionError] { // size mismatch
      (Seq(1L, 2L): Iterable[Long]) shouldApproximate withErrorRate(Seq(1L), 5.0)
    }
    (Seq("a" -> 980L, "b" -> 102L): Iterable[(String, Long)]) shouldApproximate
      withErrorRatePerKey(Seq("a" -> 1000L, "b" -> 100L), 5.0)
    intercept[AssertionError] {
      (Seq("a" -> 2000L): Iterable[(String, Long)]) shouldApproximate
        withErrorRatePerKey(Seq("a" -> 1000L), 5.0)
    }
    intercept[AssertionError] { // unknown key
      (Seq("z" -> 10L): Iterable[(String, Long)]) shouldApproximate
        withErrorRatePerKey(Seq("a" -> 10L), 5.0)
    }
  }

  test("matchers work on DataFrames (Dataset[Row]) too") {
    val df = datasetOf(Seq(1, 2, 3)).toDF("n")
    df should haveSize(3)
    df.filter("n > 10") should beEmptyDataset
  }
}
