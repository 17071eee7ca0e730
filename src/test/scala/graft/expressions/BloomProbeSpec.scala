package graft.expressions

import graft.SparkSpec
import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** BloomProbe (native codegen Bloom membership) contracts:
  * bit-identical to direct filter probes for every supported key type,
  * null → false, and the sparse-join plans it powers carry no UDF node
  * (the probe must stay inside whole-stage codegen — it runs on every
  * row of the big side).
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private def probeCol(keyCol: org.apache.spark.sql.Column, bf: BloomFilter) =
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(keyCol), bf))

  test("long probe matches direct mightContainLong, null probes false") {
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 500L by 2).foreach(bf.putLong)
    val keys = ((0L until 1000L).map(java.lang.Long.valueOf) :+ null).toDF("k")
    val got = keys.select(col("k"), probeCol(col("k"), bf).as("p"))
      .collect().map(r => (Option(r.get(0)), r.getBoolean(1)))
    got.foreach { case (k, p) =>
      val want = k.exists(v => bf.mightContainLong(v.asInstanceOf[Long]))
      assert(p == want, s"key $k: got $p want $want")
    }
    // evens were inserted — all must probe true (no false negatives)
    got.foreach { case (k, p) =>
      if (k.exists(v => { val l = v.asInstanceOf[Long]; l < 500 && l % 2 == 0 })) assert(p)
    }
  }

  test("string probe matches mightContainString (UTF-8 bytes), incl. non-ASCII") {
    val bf = BloomFilter.create(100, 0.01)
    val inserted = Seq("alpha", "β-gamma", "日本語", "", "mixedΩ")
    inserted.foreach(bf.putString)
    val keys = (inserted ++ Seq("absent", "ζeta", null)).toDF("k")
    val got = keys.select(col("k"), probeCol(col("k"), bf).as("p"))
      .collect().map(r => (Option(r.getString(0)), r.getBoolean(1)))
    got.foreach { case (k, p) =>
      assert(p == k.exists(bf.mightContainString), s"key $k")
    }
    inserted.foreach(s => assert(bf.mightContainString(s))) // sanity
  }

  test("binary probe matches mightContainBinary") {
    val bf = BloomFilter.create(100, 0.01)
    val ins = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](-5, 0, 7))
    ins.foreach(bf.putBinary)
    val keys = (ins ++ Seq(Array[Byte](9, 9), null)).toDF("k")
    val got = keys.select(col("k"), probeCol(col("k"), bf).as("p"))
      .collect().map(r => (Option(r.getAs[Array[Byte]](0)), r.getBoolean(1)))
    got.foreach { case (k, p) => assert(p == k.exists(bf.mightContainBinary)) }
  }

  test("rejects unsupported key types at analysis") {
    val df = Seq(1.5, 2.5).toDF("k")
    intercept[Exception] {
      df.select(probeCol(col("k"), BloomFilter.create(10, 0.1))).collect()
    }
  }

  test("sparseJoin plans contain no UDF (probe is codegen-native)") {
    val left = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "lv")
    val right = Seq((1L, "a"), (7L, "b")).toDF("id", "rv")
    val plan = Joins.sparseJoin(left, right, "id", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF found in sparse-join plan:\n$plan")
    val planStr = Joins.sparseLookup(right, left.withColumnRenamed("lv", "sv"), "id", "sv",
      expectedLeftKeys = 100L).queryExecution.executedPlan.toString
    assert(!planStr.contains("UDF"), "UDF found in sparse-lookup plan")
  }
}
