package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIters: Int = 10): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find for the brute-force comparison. */
  private def bruteCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = min vertex in component
    val byRoot = vs.groupBy(find)
    byRoot.values.flatMap(g => { val m = g.min; g.map(_ -> m) }).toMap
  }

  test("components get canonical min-vertex labels") {
    val m = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 5L -> 5L))
  }

  test("long chain needs diameter iterations; converged flag reports truncation") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    val full = Graph.connectedComponents(chain.toDF("src", "dst"), "src", "dst", 25)
    assert(full.select("component").distinct().count() == 1)
    assert(full.select("converged").head().getBoolean(0))
    val cut = Graph.connectedComponents(chain.toDF("src", "dst"), "src", "dst", 2)
    assert(!cut.select("converged").head().getBoolean(0))
    assert(cut.select("component").distinct().count() > 1)
  }

  test("randomized graphs match a union-find recount") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      assert(cc(edges, maxIters = 60) == bruteCc(edges), s"trial $trial")
    }
  }

  test("null endpoints dropped; repartition-stable") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("src", "dst")
    val m = Graph.connectedComponents(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L))
    val edges = (1 to 50).map(i => ((i % 10).toLong, (i % 7).toLong))
    val a = cc(edges)
    val b = Graph.connectedComponents(
      edges.toDF("src", "dst").repartition(13), "src", "dst", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
