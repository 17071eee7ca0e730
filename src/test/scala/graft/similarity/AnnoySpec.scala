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

  test("fuzz: corrupt .ann bytes reject cleanly at parse, never crash or hang") {
    val dim = 4
    val vecs = (0 until 50).map(i =>
      Array.tabulate(dim)(j => math.cos(i * dim + j).toFloat))
    val valid = Annoy.build(vecs, dim, nTrees = 3)
    val s = 12 + 4 * dim
    val rnd = new scala.util.Random(20260813L)
    def attempt(bytes: Array[Byte]): Unit =
      try {
        val idx = Annoy.parse(bytes, dim)
        idx.query(vecs(0), 5) // whatever parses must search without crashing
        ()
      } catch { case _: IllegalArgumentException => () }
    (0 until 300).foreach { _ =>
      val garbage = new Array[Byte](s * (1 + rnd.nextInt(40)))
      rnd.nextBytes(garbage)
      attempt(garbage)
      val mutated = valid.clone()
      (0 to rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      attempt(mutated)
    }
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

  test("buildFrom rejects non-dense ids and over-budget inputs (byte-aware)") {
    val sparse = Seq((0, Seq(1f, 0f)), (5, Seq(0f, 1f))).toDF("id", "v")
    intercept[IllegalArgumentException](Annoy.buildFrom(sparse, "id", "v", 2))
    // dim=2 angular node = 20 B; a 20 B budget holds exactly one item,
    // so two rows must abort on the BYTE budget, not a row count
    val dense = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Annoy.buildFrom(dense, "id", "v", 2, maxBytes = 20L))
    assert(e.getMessage.contains("maxBytes"))
  }

  // ---- euclidean metric ------------------------------------------------

  test("file layout follows the public euclidean node struct exactly (bias at offset 4)") {
    val dim = 4
    val vecs = (0 until 20).map(i =>
      Array.tabulate(dim)(j => ((i * 5 + j * 3) % 11 - 5).toFloat))
    val bytes = Annoy.build(vecs, dim, nTrees = 3, metric = Annoy.Euclidean)
    val s = 16 + 4 * dim // n_desc(4) + a(4) + children(8) + v
    assert(bytes.length % s == 0, "file must be a flat array of euclidean-size nodes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 20).foreach { i =>
      assert(buf.getInt(i * s) == 1, s"item node $i n_descendants")
      (0 until dim).foreach(j =>
        assert(buf.getFloat(i * s + 16 + 4 * j) == vecs(i)(j), s"item $i v[$j] at offset 16"))
    }
    val nNodes = bytes.length / s
    (1 to 3).foreach(t => assert(buf.getInt((nNodes - t) * s) == 20,
      "root copies at the end must have n_descendants == nItems"))
    // at least one interior split stores a non-zero plane offset —
    // the euclidean-only field (angular planes pass through 0)
    val splits = (20 until nNodes).filter(i => buf.getInt(i * s) > (s - 8) / 4)
    assert(splits.nonEmpty && splits.exists(i => buf.getFloat(i * s + 4) != 0f),
      "euclidean split nodes must carry the bias float a at offset 4")
  }

  test("euclidean roundtrip: exhaustive searchK is exact; default searchK recall >= 0.9") {
    val dim = 16
    val vecs = (0 until 400).map(i =>
      Array.tabulate(dim)(j => (math.sin(i * dim + j) * 10).toFloat))
    val idx = Annoy.parse(
      Annoy.build(vecs, dim, nTrees = 10, metric = Annoy.Euclidean), dim, Annoy.Euclidean)
    assert(idx.metric == Annoy.Euclidean && idx.nItems == 400)
    (0 until 400).foreach(i => assert(idx.itemVector(i).toSeq == vecs(i).toSeq))
    def bruteTop(q: Array[Float], k: Int): Seq[Int] = {
      def d2(a: Array[Float], b: Array[Float]): Double =
        a.indices.map(j => (a(j).toDouble - b(j)) * (a(j).toDouble - b(j))).sum
      vecs.indices.sortBy(i => (d2(q, vecs(i)), i)).take(k)
    }
    val k = 10
    val probes = (0 until 25).map(i => vecs(i * 13 % vecs.length))
    // searchK = corpus ⇒ every candidate inspected ⇒ exact-rank equality
    probes.foreach { q =>
      assert(idx.query(q, k, searchK = 400).map(_._1) == bruteTop(q, k),
        "exhaustive euclidean search must equal brute force exactly")
    }
    val recalls = probes.map { q =>
      val ann = idx.query(q, k, searchK = 120).map(_._1).toSet
      ann.intersect(bruteTop(q, k).toSet).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean euclidean recall $mean below 0.9")
    // hadoop save/load keeps answers identical
    val path = tmpFile()
    Annoy.write(spark, idx, path)
    val back = Annoy.read(spark, path, dim, Annoy.Euclidean)
    val q = vecs(7)
    assert(back.query(q, 5) == idx.query(q, 5))
    // distributed search column is `distance`, ascending with rank
    val probesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, vecs(3).toSeq)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val rows = Annoy.searchTopK(idx, probesDf, "vec_id", "embedding", k = 5, searchK = 400)
      .orderBy(col("rank")).collect()
    assert(rows.head.schema.fieldNames.contains("distance"))
    val dists = rows.map(_.getDouble(3)).toSeq
    assert(dists == dists.sorted, "rank 1 must be the nearest (smallest distance)")
    assert(rows.head.getInt(2) == 3 && rows.head.getDouble(3) == 0.0,
      "the probe's own vector is its nearest euclidean neighbor")
  }
}
