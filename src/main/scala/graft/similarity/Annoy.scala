package graft.similarity

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Annoy index files — the PUBLIC on-disk format of spotify/annoy
  * (reference: scio-extra/src/main/scala/com/spotify/scio/extra/annoy/
  * — scio builds Annoy indexes as side inputs and ships the .ann file
  * as a distributed-cache artifact). graft reads and writes the
  * angular-metric layout, so an index file is exchangeable with other
  * tooling that speaks it.
  *
  * Format (annoy's angular Node, little-endian, f = vector dim; the
  * file stores no header — it is a flat array of fixed-size nodes,
  * dim is supplied at load exactly like `AnnoyIndex(f)`):
  *
  *   node size s = 12 + 4f
  *   struct Node { int32 n_descendants; int32 children[2]; float v[f] }
  *
  *  - item nodes occupy indices [0, nItems) (ids must be dense 0..n-1,
  *    annoy's documented contract) with n_descendants = 1 and v = the
  *    item vector;
  *  - split nodes: v = hyperplane normal (plane through the origin —
  *    angular), children[0/1] = node index of the negative/positive
  *    side; margin(x) = ⟨v, x⟩;
  *  - bucket leaves (2 ≤ n_descendants ≤ K, K = (s−4)/4 = f+2): the
  *    bytes from offset 4 onward are reinterpreted as n_descendants
  *    int32 item ids (annoy's children-spill trick); a single-item
  *    subtree is no node at all — the parent's child pointer aims
  *    straight at the item node;
  *  - after the trees, each tree root node is COPIED to the end of
  *    the file; the loader scans backwards collecting trailing nodes
  *    with equal n_descendants — that shared value IS nItems — and
  *    drops the one over-collected original last root when its
  *    children match the front's (annoy's load protocol, including
  *    that dedupe hack).
  *
  * Build is driver-side over a collected, size-guarded vector set —
  * the same shape as the reference, where scio builds the Annoy side
  * input in one place and distributes the FILE; an .ann artifact is by
  * contract a fits-in-memory object. SEARCH is distributed: the index
  * bytes broadcast once, each partition probes locally.
  */
object Annoy {

  /** Loaded index over the raw node bytes. */
  final class Index private[Annoy] (val dim: Int, val nItems: Int,
                                    private[Annoy] val bytes: Array[Byte],
                                    val roots: Seq[Int]) extends Serializable {
    private val s = 12 + 4 * dim
    @transient private lazy val buf =
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def nNodes: Int = bytes.length / s
    private def nDesc(i: Int): Int = buf.getInt(i * s)
    private def child(i: Int, c: Int): Int = buf.getInt(i * s + 4 + 4 * c)
    private[Annoy] def vec(i: Int): Array[Float] = {
      val a = new Array[Float](dim)
      var j = 0
      while (j < dim) { a(j) = buf.getFloat(i * s + 12 + 4 * j); j += 1 }
      a
    }

    def itemVector(item: Int): Array[Float] = {
      require(item >= 0 && item < nItems, s"item $item out of range [0, $nItems)")
      vec(item)
    }

    private def cosine(a: Array[Float], b: Array[Float]): Double = {
      // per-element double promotion — the same arithmetic as the
      // codegen cosine kernel and DuckDB's list_cosine_similarity, so
      // exhaustive-search rankings agree bit-exactly with the oracle
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        val x = a(j).toDouble; val y = b(j).toDouble
        dot += x * y; na += x * x; nb += y * y; j += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }

    /** Top-k by angular similarity (cosine): walk every tree from its
      * root best-first by hyperplane margin, collect ≥ searchK
      * candidates, exact-rank them. searchK defaults to annoy's
      * n_trees·k heuristic.
      */
    def query(q: Array[Float], k: Int, searchK: Int = -1): Seq[(Int, Double)] = {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      val limit = if (searchK > 0) searchK else math.max(k * roots.length, k)
      val frontier = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(
        Ordering.by(_._1))
      roots.foreach(r => frontier.enqueue((Double.PositiveInfinity, r)))
      val kCap = (s - 4) / 4
      val candidates = new scala.collection.mutable.HashSet[Int]()
      while (candidates.size < limit && frontier.nonEmpty) {
        val (_, node) = frontier.dequeue()
        val nd = nDesc(node)
        if (nd == 1 && node < nItems) candidates += node
        else if (nd <= kCap) {
          var j = 0
          while (j < nd) { candidates += buf.getInt(node * s + 4 + 4 * j); j += 1 }
        } else {
          val n = vec(node)
          var m = 0.0; var j = 0
          while (j < dim) { m += n(j) * q(j); j += 1 }
          frontier.enqueue((m, child(node, 1)))
          frontier.enqueue((-m, child(node, 0)))
        }
      }
      candidates.toSeq
        .map(i => i -> cosine(q, vec(i)))
        .sortBy { case (i, sim) => (-sim, i) }
        .take(k)
    }

    /** Items back as a DataFrame (id, vector) — reading someone
      * else's .ann into the engine.
      */
    def toDataFrame(spark: SparkSession): DataFrame = {
      val schema = StructType(Seq(
        StructField("item_id", IntegerType, nullable = false),
        StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))
      val rows = (0 until nItems).map(i => Row(i, vec(i).toSeq))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)), schema)
    }
  }

  /** Deterministic splitting hash — rebuilds are byte-identical. */
  private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9E3779B97F4A7C15L + b
    h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 29
    h
  }

  /** Build an angular Annoy index over dense ids 0..n-1 and return the
    * .ann file bytes. `nTrees` trades file size for recall, like
    * annoy's build(n_trees). Splits use seeded two-point hyperplanes
    * (annoy's two_means in spirit — the FORMAT admits any valid tree).
    */
  def build(vectors: IndexedSeq[Array[Float]], dim: Int, nTrees: Int = 8,
            seed: Long = 42L): Array[Byte] = {
    require(vectors.nonEmpty, "cannot build an empty Annoy index")
    require(nTrees >= 1, s"nTrees must be >= 1, got $nTrees")
    require(vectors.forall(_.length == dim), s"every vector must have dim $dim")
    val nItems = vectors.size
    val s = 12 + 4 * dim
    val kCap = (s - 4) / 4

    val out = new java.io.ByteArrayOutputStream()
    var nNodes = 0
    def putNode(nDesc: Int, c0: Int, c1: Int, v: Array[Float]): Int = {
      val b = ByteBuffer.allocate(s).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(nDesc); b.putInt(c0); b.putInt(c1)
      var j = 0
      while (j < dim) { b.putFloat(if (v == null) 0f else v(j)); j += 1 }
      out.write(b.array()); nNodes += 1; nNodes - 1
    }
    def putBucket(ids: Seq[Int]): Int = {
      val b = ByteBuffer.allocate(s).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(ids.size)
      ids.foreach(b.putInt)
      while (b.position() < s) b.put(0.toByte)
      out.write(b.array()); nNodes += 1; nNodes - 1
    }

    // item nodes at [0, nItems)
    vectors.foreach(v => putNode(1, 0, 0, v))

    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { d += a(j) * b(j); j += 1 }
      d
    }

    def makeTree(ids: Seq[Int], rng: Long, depth: Int): Int = {
      if (ids.size == 1) return ids.head // child pointer aims at the item node
      if (ids.size <= kCap) return putBucket(ids)
      require(depth < 512, "Annoy.build: split recursion too deep (degenerate data?)")
      val i1 = (mix(rng, 2L * depth + 1).abs % ids.size).toInt
      var i2 = (mix(rng, 2L * depth + 2).abs % ids.size).toInt
      if (i2 == i1) i2 = (i2 + 1) % ids.size
      val va = vectors(ids(i1)); val vb = vectors(ids(i2))
      val normal = Array.tabulate(dim)(j => va(j) - vb(j))
      var (pos, neg) = ids.partition(id => dot(normal, vectors(id)) > 0)
      if (pos.isEmpty || neg.isEmpty) {
        // degenerate plane (duplicate points): deterministic half-split
        val sorted = ids.sortBy(id => mix(rng ^ 0x5bd1e995L, id.toLong))
        val (l, r) = sorted.splitAt(ids.size / 2)
        neg = l; pos = r
      }
      val c0 = makeTree(neg, mix(rng, 3L), depth + 1)
      val c1 = makeTree(pos, mix(rng, 5L), depth + 1)
      putNode(ids.size, c0, c1, normal)
    }

    val allIds = 0 until nItems
    val rootIdx = (0 until nTrees).map(t => makeTree(allIds, mix(seed, t.toLong), 0))
    // annoy's load protocol: copies of the roots go at the very end
    val arr = out.toByteArray
    val withRoots = new java.io.ByteArrayOutputStream()
    withRoots.write(arr)
    rootIdx.foreach(r => withRoots.write(arr, r * s, s))
    withRoots.toByteArray
  }

  /** Parse .ann bytes (annoy's backward root scan + dedupe hack). */
  def parse(bytes: Array[Byte], dim: Int): Index = {
    val s = 12 + 4 * dim
    require(bytes.length > 0 && bytes.length % s == 0,
      s"not an angular Annoy file for dim=$dim: ${bytes.length} bytes is not a multiple of $s")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nNodes = bytes.length / s
    val roots = scala.collection.mutable.ArrayBuffer.empty[Int]
    var m = -1
    var i = nNodes - 1
    var stop = false
    while (i >= 0 && !stop) {
      val k = buf.getInt(i * s)
      if (m == -1 || k == m) { roots += i; m = k; i -= 1 } else stop = true
    }
    // the original last root sits just before its copy — drop the dup
    if (roots.size > 1 &&
        buf.getInt(roots.head * s + 4) == buf.getInt(roots.last * s + 4))
      roots.remove(roots.size - 1)
    new Index(dim, m, bytes, roots.toSeq)
  }

  /** Collect a (small, guarded) vector table and build the index —
    * the scio AnnoySideInput shape: ids must be dense 0..n-1.
    */
  def buildFrom(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                nTrees: Int = 8, seed: Long = 42L, maxItems: Int = 5000000): Index = {
    val n = df.count()
    require(n <= maxItems,
      s"Annoy.buildFrom: $n items exceeds maxItems=$maxItems — an .ann index is a " +
        "fits-in-memory artifact (raise maxItems only if the driver can hold it)")
    val collected = df.select(col(idCol).cast("int"), col(vecCol)).collect()
    val vecs = new Array[Array[Float]](n.toInt)
    collected.foreach { r =>
      val id = r.getInt(0)
      require(id >= 0 && id < n, s"ids must be dense 0..${n - 1}, got $id")
      vecs(id) = r.getSeq[Float](1).toArray
    }
    require(vecs.forall(_ != null), "ids must cover 0..n-1 exactly once")
    parse(build(scala.collection.immutable.ArraySeq.unsafeWrapArray(vecs), dim, nTrees, seed), dim)
  }

  /** Persist .ann bytes to any Hadoop-visible path (temp + rename —
    * readers never observe a torn artifact).
    */
  def write(spark: SparkSession, index: Index, path: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val outS = fs.create(tmp, true)
    try outS.write(index.bytes) finally outS.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
  }

  def read(spark: SparkSession, path: String, dim: Int): Index = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path too large to map ($len bytes)")
    val in = fs.open(p)
    val bytes = new Array[Byte](len.toInt)
    try in.readFully(0, bytes) finally in.close()
    parse(bytes, dim)
  }

  /** Distributed search: broadcast the index once, probe per
    * partition. Output (probe_id, rank, item_id, cos_sim) — the same
    * shape as KNN.bruteForceTopK, so the two are drop-in comparable.
    */
  def searchTopK(index: Index, probes: DataFrame, idCol: String, vecCol: String,
                 k: Int, searchK: Int = -1): DataFrame = {
    val spark = probes.sparkSession
    val bc = spark.sparkContext.broadcast(index)
    val schema = StructType(Seq(
      StructField("probe_id", LongType, nullable = false),
      StructField("rank", IntegerType, nullable = false),
      StructField("item_id", IntegerType, nullable = false),
      StructField("cos_sim", DoubleType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(schema)
    probes.select(col(idCol).cast("long"), col(vecCol))
      .mapPartitions { rows =>
        val idx = bc.value
        rows.flatMap { r =>
          val pid = r.getLong(0)
          val q = r.getSeq[Float](1).toArray
          idx.query(q, k, searchK).zipWithIndex.map { case ((item, sim), rank) =>
            Row(pid, rank + 1, item, sim)
          }
        }
      }
  }
}
