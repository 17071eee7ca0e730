package graft.similarity

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnoySpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_annoy").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/index.ann"
  }

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("file layout follows the public angular node struct exactly") {
    val dim = 4
    val vecs = IndexedSeq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f),
      Array(1f, 1f, 0f, 0f), Array(0f, 0f, 1f, 1f),
      Array(1f, 0f, 1f, 0f), Array(0f, 1f, 0f, 1f),
      Array(1f, 1f, 1f, 0f), Array(0f, 1f, 1f, 1f))
    val bytes = Annoy.build(vecs, dim, nTrees = 3)
    val s = 12 + 4 * dim
    assert(bytes.length % s == 0, "file must be a flat array of fixed-size nodes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // item nodes at [0, n): n_descendants = 1, v = the vector
    (0 until 10).foreach { i =>
      assert(buf.getInt(i * s) == 1, s"item node $i n_descendants")
      (0 until dim).foreach(j =>
        assert(buf.getFloat(i * s + 12 + 4 * j) == vecs(i)(j)))
    }
    // trailing root copies all carry n_descendants == nItems
    val nNodes = bytes.length / s
    (1 to 3).foreach(t => assert(buf.getInt((nNodes - t) * s) == 10,
      "root copies at the end must have n_descendants == nItems"))
  }

  test("build → parse roundtrip recovers every item vector and nItems") {
    val vecs = (0 until 100).map(i =>
      Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    val idx = Annoy.parse(Annoy.build(vecs, 8, nTrees = 4), 8)
    assert(idx.nItems == 100)
    assert(idx.roots.nonEmpty && idx.roots.size <= 8) // nTrees + possible pre-dedupe extras
    (0 until 100).foreach(i => assert(idx.itemVector(i).toSeq == vecs(i).toSeq))
  }

  test("tiny corpus (single bucket per tree) still parses and queries") {
    val vecs = IndexedSeq(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f))
    val idx = Annoy.parse(Annoy.build(vecs, 2, nTrees = 2), 2)
    assert(idx.nItems == 3)
    val top = idx.query(Array(1f, 0.1f), 2)
    assert(top.head._1 == 0) // exact direction match ranks first
    assert(top.size == 2)
  }

  test("query recall >= 0.9 vs brute force on real embeddings") {
    val idx = Annoy.buildFrom(emb, "vec_id", "embedding", dim = 64, nTrees = 12)
    val all = emb.orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).toArray)
    def bruteTop(q: Array[Float], k: Int): Set[Int] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < a.length) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
        if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
      }
      all.indices.map(i => i -> cos(q, all(i))).sortBy(-_._2).take(k).map(_._1).toSet
    }
    val k = 10
    val probes = (0 until 30).map(i => all(i * 7 % all.length))
    val recalls = probes.map { q =>
      val ann = idx.query(q, k, searchK = 400).map(_._1).toSet
      val exact = bruteTop(q, k)
      ann.intersect(exact).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean below 0.9")
  }

  test("hadoop save/load roundtrip; loaded index answers identically") {
    val vecs = (0 until 64).map(i => Array.tabulate(6)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    val idx = Annoy.parse(Annoy.build(vecs, 6, nTrees = 3), 6)
    val path = tmpFile()
    Annoy.write(spark, idx, path)
    val back = Annoy.read(spark, path, 6)
    assert(back.nItems == idx.nItems)
    val q = Array(1f, -1f, 2f, 0f, 1f, -2f)
    assert(back.query(q, 5) == idx.query(q, 5))
  }

  test("searchTopK distributes the probe side and matches local query") {
    val idx = Annoy.buildFrom(emb, "vec_id", "embedding", dim = 64, nTrees = 8)
    val probes = emb.filter(col("vec_id") < 5)
    val dist = Annoy.searchTopK(idx, probes, "vec_id", "embedding", k = 3, searchK = 300)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val local = probes.collect().flatMap { r =>
      idx.query(r.getSeq[Float](1).toArray, 3, searchK = 300)
        .zipWithIndex.map { case ((item, _), rank) =>
          (r.getAs[Number](0).longValue(), rank + 1, item) }
    }.toSet
    assert(dist == local)
  }

  test("buildFrom rejects non-dense ids and oversize inputs") {
    val sparse = Seq((0, Seq(1f, 0f)), (5, Seq(0f, 1f))).toDF("id", "v")
    intercept[IllegalArgumentException](Annoy.buildFrom(sparse, "id", "v", 2))
    val dense = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("id", "v")
    intercept[IllegalArgumentException](
      Annoy.buildFrom(dense, "id", "v", 2, maxItems = 1))
  }
}
