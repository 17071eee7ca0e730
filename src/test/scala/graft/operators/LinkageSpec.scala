package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq(
    (1L, "jon smith"), (2L, "john smith"), (3L, "jane smith"),
    (4L, "jon smyth"), (5L, "zeb quartz"), (6L, null.asInstanceOf[String])
  ).toDF("id", "name")

  test("fuzzyPairs: edit-distance matches within blocks, id_a < id_b, nulls dropped") {
    // default blocker: (len/4, first char) — all j-names of close length block together
    val got = Linkage.fuzzyPairs(names, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got.contains((1L, 2L, 1))) // jon ~ john
    assert(got.contains((1L, 4L, 1))) // smith ~ smyth
    assert(got.forall { case (a, b, d) => a < b && d <= 2 })
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L)) // different block, no pair
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L)) // null dropped
  }

  test("fuzzyPairs: blocked result equals brute force when the blocker is a constant") {
    val got = Linkage.fuzzyPairs(names, "id", "name", maxDist = 3, blocker = _ => lit(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val vals = names.filter(col("name").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- vals; (ib, sb) <- vals if ia < ib
      d = lev(sa, sb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want)
  }

  test("fuzzyPairs: hot blocks above maxBlock are excluded (the quadratic bound)") {
    val many = (1 to 50).map(i => (i.toLong, "same name")).toDF("id", "name")
    val capped = Linkage.fuzzyPairs(many, "id", "name", maxDist = 1, maxBlock = 10)
    assert(capped.count() == 0) // the one block exceeds the cap → no pairs
    val uncapped = Linkage.fuzzyPairs(many, "id", "name", maxDist = 1, maxBlock = 100)
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("fuzzyJoin: inner lookup semantics against a reference table") {
    val dirty = Seq(("a", "jon smith"), ("b", "zzz zzz")).toDF("rec", "who")
    val canon = Seq(("C1", "john smith"), ("C2", "zeb quartz")).toDF("cid", "canonical")
    val got = Linkage.fuzzyJoin(dirty, canon, "who", "canonical", maxDist = 2)
      .select("rec", "cid", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("a", "C1", 1)))
  }
}
