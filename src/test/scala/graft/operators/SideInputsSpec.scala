package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Side-input shapes: scio asSingleton/asList/asMap/asMultiMap ≈
  * guarded driver materialization + SparkContext.broadcast, consumed
  * inside executor-side closures.
  */
class SideInputsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(("a", 1), ("b", 2), ("b", 3)).toDS()

  test("asMap broadcast is usable inside executor-side map") {
    val m = SideInputs.asMap(Seq(("a", 10), ("b", 20)).toDS())
    val out = Seq("a", "b", "c").toDS()
      .map(k => m.value.getOrElse(k, -1))
      .collect().sorted
    assert(out.toSeq == Seq(-1, 10, 20))
  }

  test("asMap rejects duplicate keys; asMultiMap groups them") {
    intercept[IllegalArgumentException](SideInputs.asMap(pairs))
    val mm = SideInputs.asMultiMap(pairs).value
    assert(mm("a") == Seq(1) && mm("b").sorted == Seq(2, 3))
  }

  test("asSingleton requires exactly one row") {
    val one = SideInputs.asSingleton(Seq(42).toDS())
    assert(one.value == 42)
    intercept[IllegalArgumentException](SideInputs.asSingleton(Seq(1, 2).toDS()))
    intercept[IllegalArgumentException](SideInputs.asSingleton(spark.emptyDataset[Int]))
  }

  test("asList preserves rows and enforces the maxRows guard") {
    assert(SideInputs.asList(pairs).value.sorted == Seq(("a", 1), ("b", 2), ("b", 3)))
    intercept[IllegalArgumentException](SideInputs.asList(pairs, maxRows = 2))
  }

  test("asSet deduplicates and broadcasts a membership set") {
    val ds = Seq("x", "y", "x", "z").toDS()
    val s = SideInputs.asSet(ds)
    assert(s.value == Set("x", "y", "z"))
    // maxRows guards the DISTINCT cardinality, not the input size
    assert(SideInputs.asSet(ds, maxRows = 3).value.size == 3)
    intercept[IllegalArgumentException](SideInputs.asSet(ds, maxRows = 2))
  }

  test("side-input lookup agrees with the equivalent broadcast join") {
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDS().toDF("k", "name")
    val facts = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val m = SideInputs.asMap(dim.as[(String, String)])
    val viaSide = facts.as[(String, Int)]
      .map { case (k, v) => (k, v, m.value.getOrElse(k, "?")) }
      .toDF("k", "v", "name")
    val viaJoin = facts.join(broadcast(dim), Seq("k"), "left")
      .select(col("k"), col("v"), coalesce(col("name"), lit("?")).as("name"))
    assert(sortedRows(viaSide) == sortedRows(viaJoin))
  }
}
