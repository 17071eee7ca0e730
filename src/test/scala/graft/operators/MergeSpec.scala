package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, String, Double)*) = rows.toDF("k", "s", "v")

  test("upsert: matched keys replaced, new keys appended, untouched rows kept") {
    val target = kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val updates = kv((2L, "B", 20.0), (9L, "i", 9.0))
    val got = Merge.upsert(target, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0), (9L, "i", 9.0)))
  }

  test("upsert: composite keys; column-order independence via unionByName") {
    val target = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "s", "v")
    val updates = Seq((9.0, "y", 1L)).toDF("v", "s", "k") // shuffled column order
    val got = Merge.upsert(target, updates, Seq("k", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("upsert: duplicate update keys rejected (the MERGE multi-match contract)") {
    val target = kv((1L, "a", 1.0))
    val dup = kv((2L, "b", 2.0), (2L, "c", 3.0))
    val e = intercept[IllegalArgumentException](Merge.upsert(target, dup, Seq("k")))
    assert(e.getMessage.contains("unique"))
    // assumeUniqueUpdates skips the check (caller's contract)
    Merge.upsert(target, kv((2L, "b", 2.0)), Seq("k"), assumeUniqueUpdates = true)
  }

  test("applyCdc: highest sequence wins per key; D deletes; I/U upsert; new keys append") {
    val target = kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val changes = Seq(
      (1L, "a2", 10.0, 1L, "U"), // superseded by the seq-2 delete below
      (1L, "a3", 11.0, 2L, "D"),
      (2L, "b2", 20.0, 1L, "U"),
      (9L, "i", 9.0, 1L, "I")
    ).toDF("k", "s", "v", "seq", "op")
    val got = Merge.applyCdc(target, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((2L, "b2", 20.0), (3L, "c", 3.0), (9L, "i", 9.0)))
  }

  test("applyCdc: same-seq ties break lexicographically (deterministic, order-free)") {
    val target = kv((1L, "a", 1.0))
    val changes = Seq((1L, "x", 5.0, 1L, "U"), (1L, "z", 7.0, 1L, "U"))
      .toDF("k", "s", "v", "seq", "op")
    val a = Merge.applyCdc(target, changes, Seq("k"), "seq", "op").collect().toSeq
    val b = Merge.applyCdc(target, changes.orderBy(col("s").desc), Seq("k"), "seq", "op")
      .collect().toSeq
    assert(a == b && a.head.getString(1) == "z") // max struct picks (1, U, z, 7.0)
  }

  test("scd2: versioned spans with run compression; open current row; tie determinism") {
    val log = Seq(
      (1L, 10L, "bronze"),
      (1L, 20L, "bronze"), // same value re-stated → compressed away
      (1L, 30L, "silver"),
      (1L, 40L, "gold"),
      (2L, 15L, "gold")
    ).toDF("k", "t", "tier")
    val got = Merge.scd2(log, Seq("k"), "t")
      .select("k", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "gold", 15L, None, true)))
    // compressRuns = false keeps the re-stated row as its own version
    val raw = Merge.scd2(log, Seq("k"), "t", compressRuns = false)
    assert(raw.filter(col("k") === 1L).count() == 4)
  }

  test("scd2: flip-flop values are separate versions (not dedup by value)") {
    val log = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a")).toDF("k", "t", "s")
    val got = Merge.scd2(log, Seq("k"), "t").orderBy("valid_from")
      .select("s").as[String].collect().toSeq
    assert(got == Seq("a", "b", "a"))
  }
}
