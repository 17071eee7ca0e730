package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions score ~0; a shift scores large") {
    val ref = (1 to 10000).map(i => (i % 1000).toDouble).toDF("v")
    val same = (1 to 10000).map(i => ((i * 7) % 1000).toDouble).toDF("v")
    val shifted = (1 to 10000).map(i => (i % 1000) * 3.0 + 2000).toDF("v")
    assert(Drift.psi(ref, same, "v") < 0.01)
    assert(Drift.psi(ref, shifted, "v") > 0.25, "a full distribution shift must flag")
  }

  test("psiBuckets: all buckets present, probabilities sum to ~1, floors applied") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (1 to 100).map(_.toDouble).toDF("v")   // everything in low buckets
    val rows = Drift.psiBuckets(ref, cur, "v", nBuckets = 10).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    // empty current buckets get the 1e-6 floor, not -inf contributions
    assert(rows.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
    assert(rows.map(_.getLong(2)).sum == 100L)
  }

  test("nulls are excluded; guard on bucket count") {
    val ref = Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0)).toDF("v")
    val rows = Drift.psiBuckets(ref, ref, "v", nBuckets = 2).collect()
    assert(rows.map(_.getLong(1)).sum == 4L)
    intercept[IllegalArgumentException](Drift.psiBuckets(ref, ref, "v", nBuckets = 1))
  }

  test("ksStat: identical samples give 0, disjoint samples give 1") {
    val a = (1 to 500).map(_.toDouble).toDF("v")
    val b = (501 to 1000).map(_.toDouble).toDF("v")
    val same = Drift.ksStat(a, a, "v").collect()(0)
    assert(same.getLong(0) == 500L && same.getLong(1) == 500L)
    assert(same.getDouble(2) == 0.0)
    val dis = Drift.ksStat(a, b, "v").collect()(0)
    assert(dis.getDouble(2) == 1.0)
    assert(dis.getDouble(3) == 500.0, "sup attained first at ref's max value")
  }

  test("ksStat matches a brute-force CDF scan; null/NaN excluded") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(400)(rnd.nextInt(50).toDouble)
    val ys = Seq.fill(300)(rnd.nextInt(60).toDouble + 5)
    val support = (xs ++ ys).distinct.sorted
    val brute = support.map(v =>
      math.abs(xs.count(_ <= v).toDouble / xs.size -
        ys.count(_ <= v).toDouble / ys.size)).max
    val noisy = (ys.map(Option(_)) ++ Seq(None, Some(Double.NaN))).toDF("v")
    val r = Drift.ksStat(xs.toDF("v"), noisy, "v").collect()(0)
    assert(r.getLong(0) == 400L && r.getLong(1) == 300L)
    assert(math.abs(r.getDouble(2) - brute) < 1e-12)
  }

  test("ksStat is stable under repartitioning") {
    val a = (1 to 997).map(i => ((i * 31) % 200).toDouble).toDF("v")
    val b = (1 to 800).map(i => ((i * 17) % 220).toDouble).toDF("v")
    val r1 = Drift.ksStat(a, b, "v").collect()(0)
    val r2 = Drift.ksStat(a.repartition(13), b.repartition(7), "v").collect()(0)
    assert(r1 == r2)
  }

  test("welchT matches the closed form; identical samples give t=0; degenerates null") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val cur = Seq(3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("v")
    val r = Drift.welchT(ref, cur, "v").collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L)
    // closed form: means 3 and 5.5, vars 2.5 and 3.5
    val se2 = 2.5 / 5 + 3.5 / 6
    val t = (5.5 - 3.0) / math.sqrt(se2)
    val dfW = se2 * se2 / ((2.5 / 5) * (2.5 / 5) / 4 + (3.5 / 6) * (3.5 / 6) / 5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == r6(t) && r.getDouble(5) == r6(dfW))
    val same = Drift.welchT(ref, ref, "v").collect()(0)
    assert(same.getDouble(4) == 0.0)
    // both constant → se2 = 0 → undefined
    val const = Seq(2.0, 2.0, 2.0).toDF("v")
    assert(Drift.welchT(const, const, "v").collect()(0).isNullAt(4))
    // one row on a side → undefined
    assert(Drift.welchT(Seq(1.0).toDF("v"), cur, "v").collect()(0).isNullAt(4))
  }

  test("mannWhitney matches brute-force pair counting with ties; symmetric identity") {
    val rnd = new scala.util.Random(41)
    val a = Seq.fill(80)((rnd.nextInt(25)).toDouble)
    val b = Seq.fill(65)((rnd.nextInt(25) + 5).toDouble)
    val r = Drift.mannWhitney(a.toDF("v"), b.toDF("v"), "v").collect()(0)
    assert(r.getLong(0) == 80L && r.getLong(1) == 65L)
    // brute force: U_cur = #{(x in ref, y in cur): y > x} + ties/2
    val brute = (for (x <- a; y <- b) yield
      if (y > x) 1.0 else if (y == x) 0.5 else 0.0).sum
    assert(r.getDouble(2) == brute, s"U ${r.getDouble(2)} != brute $brute")
    // identical samples: U = n²/2, z = 0
    val same = Drift.mannWhitney(a.toDF("v"), a.toDF("v"), "v").collect()(0)
    assert(same.getDouble(2) == 80.0 * 80 / 2 && same.getDouble(3) == 0.0)
    // all values tied → zero variance → null z
    val const = Seq.fill(10)(3.0)
    assert(Drift.mannWhitney(const.toDF("v"), const.toDF("v"), "v")
      .collect()(0).isNullAt(3))
  }

  test("chiSquare: identical mixes score 0; novel categories hit the floor path") {
    val ref = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c")).toDF("cat")
    val r0 = Drift.chiSquare(ref, ref, "cat").collect()(0)
    assert(r0.getLong(0) == 3L && r0.getDouble(3) == 0.0)
    // shifted mix: closed form with expected = ref share × cur total
    val cur = (Seq.fill(30)("a") ++ Seq.fill(60)("b") ++ Seq.fill(10)("c")).toDF("cat")
    val r1 = Drift.chiSquare(ref, cur, "cat").collect()(0)
    def term(obs: Double, exp: Double) = (obs - exp) * (obs - exp) / exp
    val want = term(30, 60) + term(60, 30) + term(10, 10)
    assert(math.abs(r1.getDouble(3) - want) < 1e-9)
    // a category the reference never saw: finite via the pseudo-count
    val novel = (Seq.fill(90)("a") ++ Seq.fill(10)("z")).toDF("cat")
    val r2 = Drift.chiSquare(ref, novel, "cat").collect()(0)
    assert(r2.getLong(0) == 4L && !r2.isNullAt(3) && r2.getDouble(3) > 100,
      s"novel category must register extreme drift: $r2")
    intercept[IllegalArgumentException](Drift.chiSquare(ref, cur, "cat", floorCount = 0))
  }
}
