package graft.operators

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("associationRules: hand-computed support/confidence/lift; dup items collapse") {
    // baskets: 1={x,y}, 2={x,y,z}, 3={x,z}, 4={y} (y listed twice: dedups)
    val rows = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "z"),
      (4L, "y"), (4L, "y")
    ).toDF("basket", "item")
    val out = Baskets.associationRules(rows, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // counts: x=3, y=3, z=2, baskets=4
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    val (sXY, cXY, cYX, lXY) = out(("x", "y"))
    assert(sXY == 2L && cXY == 2.0 / 3.0 && cYX == 2.0 / 3.0)
    assert(math.abs(lXY - 2.0 * 4.0 / 9.0) < 1e-12)
    val (sXZ, _, cZX, lXZ) = out(("x", "z"))
    assert(sXZ == 2L && cZX == 1.0)
    assert(math.abs(lXZ - 2.0 * 4.0 / 6.0) < 1e-12)
    assert(out(("y", "z"))._1 == 1L)
    // minSupport prunes pairs without disturbing the survivors
    val pruned = Baskets.associationRules(rows, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("x", "y"), ("x", "z")))
  }

  test("associationRules: single-item and null rows contribute no pairs") {
    val rows = Seq((1L, Some("a")), (2L, Some("b")), (2L, None))
      .toDF("basket", "item")
    assert(Baskets.associationRules(rows, "basket", "item").count() == 0L)
  }
}
