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

  test("asLargeMap: a side too big to broadcast probes with no Exchange on the stored side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_large_side").toFile
    dir.deleteOnExit()
    // 100 rows exceeds an asMap guard of 10 — the broadcast path
    // refuses; the disk-backed path takes over
    val side = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    intercept[IllegalArgumentException](
      SideInputs.asMap(side.as[(Long, Long)], maxRows = 10))
    val large = SideInputs.asLargeMap(side, "graft_test_large_map",
      s"$dir/side", Seq("k"), buckets = 4)
    val probe = spark.range(120).selectExpr("id AS pk", "CAST(id % 7 AS STRING) AS tag")
    val looked = large.lookup(probe, Seq("pk"))
    val plan = looked.queryExecution.executedPlan.toString()
    // sort-merge against the bucketed layout: no broadcast of the side,
    // and the ONLY Exchange in the plan is the probe's
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"side must not broadcast:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"only the probe side may shuffle:\n$plan")
    val rows = looked.collect()
    assert(rows.length == 120)
    assert(rows.filter(_.isNullAt(3)).map(_.getLong(0)).sorted.toSeq == (100L until 120L))
    assert(rows.find(_.getLong(0) == 42L).get.getLong(3) == 84L)
    // semi/anti verbs against the same stored layout
    assert(large.intersectKeys(probe, Seq("pk")).count() == 100)
    assert(large.subtractKeys(probe, Seq("pk")).count() == 20)
  }

  test("asLargeMap rejects duplicate keys; asLargeMultiMap keeps them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_large_dup").toFile
    dir.deleteOnExit()
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      SideInputs.asLargeMap(dup, "graft_test_large_dup", s"$dir/dup", Seq("k"), buckets = 2))
    assert(e.getMessage.contains("unique keys"))
    val mm = SideInputs.asLargeMultiMap(dup, "graft_test_large_mm",
      s"$dir/mm", Seq("k"), buckets = 2)
    val out = mm.lookup(Seq(1L).toDF("pk"), Seq("pk")).collect()
    assert(out.map(_.getString(2)).sorted.toSeq == Seq("a", "b"))
  }
}
