package graft.operators

import graft.SparkSpec
import graft.pipeline.Pack
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalOffset equals the naive global cumsum, across buckets") {
    // non-contiguous, negative, unordered keys; enough rows to spread
    // over several buckets with a deliberately small numBuckets
    val rows = scala.util.Random.shuffle(
      (-50L to 149L).map(i => (i * 7, math.abs(i % 11) + 1))).toSeq
    val df = rows.toDF("k", "w")
    val out = GlobalOrder.withGlobalOffset(df, "k", col("w"), numBuckets = 7)
      .select("k", "offset").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, w) =>
      assert(out(k) == acc, s"k=$k"); acc += w
    }
  }

  test("zipWithGlobalIndex is dense 0..n-1 in key order") {
    val df = Seq(30L, 10L, 20L, 40L).toDF("k")
    val idx = GlobalOrder.zipWithGlobalIndex(df, "k", numBuckets = 2)
      .orderBy("k").select("index").as[Long].collect().toSeq
    assert(idx == Seq(0L, 1L, 2L, 3L))
  }

  test("duplicate, null, and NaN order keys fail loudly (never dropped)") {
    val df = Seq((1L, 1), (1L, 2), (2L, 3)).toDF("k", "w")
    val e = intercept[IllegalArgumentException](
      GlobalOrder.withGlobalOffset(df, "k", col("w")))
    assert(e.getMessage.contains("duplicate"))
    val withNull = Seq((java.lang.Long.valueOf(1L), 1), (null.asInstanceOf[java.lang.Long], 2))
      .toDF("k", "w")
    assert(intercept[IllegalArgumentException](
      GlobalOrder.withGlobalOffset(withNull, "k", col("w"))).getMessage.contains("null"))
    val withNan = Seq((1.0, 1), (Double.NaN, 2)).toDF("k", "w")
    assert(intercept[IllegalArgumentException](
      GlobalOrder.withGlobalOffset(withNan, "k", col("w"))).getMessage.contains("NaN"))
    // null/negative weights are rejected too (they would silently
    // skip rows in the cumsum or regress offsets)
    val badW = Seq((1L, 1), (2L, -3)).toDF("k", "w")
    assert(intercept[IllegalArgumentException](
      GlobalOrder.withGlobalOffset(badW, "k", col("w"))).getMessage.contains("negative"))
    // fractional weights would silently truncate in the long cumsum
    val fracW = Seq((1L, 0.9), (2L, 0.9)).toDF("k", "w")
    assert(intercept[IllegalArgumentException](
      GlobalOrder.withGlobalOffset(fracW, "k", col("w"))).getMessage.contains("fractional"))
    // whole-valued doubles are fine
    assert(GlobalOrder.withGlobalOffset(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "w"),
      "k", col("w")).count() == 2L)
  }

  test("single row and empty input") {
    assert(GlobalOrder.withGlobalOffset(Seq((5L, 9)).toDF("k", "w"), "k", col("w"))
      .select("offset").as[Long].head() == 0L)
    assert(GlobalOrder.withGlobalOffset(
      Seq.empty[(Long, Int)].toDF("k", "w"), "k", col("w")).count() == 0L)
  }

  test("takePrefixByWeight keeps exactly the contiguous in-budget prefix") {
    val rows = scala.util.Random.shuffle(
      (1L to 100L).map(i => (i, (i % 7) + 1))).toSeq
    val df = rows.toDF("k", "w")
    // brute force: cumulative in k order until the budget trips
    val sorted = rows.sortBy(_._1)
    val cums = sorted.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val budget = cums(59) // exactly the first 60 rows fit
    val kept = GlobalOrder.takePrefixByWeight(df, "k", col("w"), budget,
      numBuckets = 9).select("k").as[Long].collect().toSet
    assert(kept == sorted.take(60).map(_._1).toSet)
    // a budget below the first weight keeps nothing; 0 keeps nothing
    assert(GlobalOrder.takePrefixByWeight(df, "k", col("w"), 0L).count() == 0L)
    // a huge budget keeps everything
    assert(GlobalOrder.takePrefixByWeight(df, "k", col("w"), 1000000L).count() == 100L)
  }

  test("packedSequences: the token stream re-concatenates exactly, windows full") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h"), (3L, "i j k l m n o p q r s t")
    ).toDF("doc_id", "text")
    val seqs = Pack.packedSequences(docs, "doc_id", "text", window = 8)
      .orderBy("seq_id")
      .select("seq_id", "n_tokens", "text").as[(Long, Long, String)].collect().toSeq
    // 20 tokens at window 8 -> sequences of 8, 8, 4
    assert(seqs.map(_._2) == Seq(8L, 8L, 4L))
    assert(seqs.map(_._1) == Seq(0L, 1L, 2L))
    // doc 2 straddles nothing, doc 3 straddles seqs 1..2; the stream
    // reads back exactly as the docs concatenated in id order
    assert(seqs.map(_._3).mkString(" ") == "a b c d e f g h i j k l m n o p q r s t")
  }

  test("writeShards: deterministic placement, one shard dir each, no file blowup") {
    val docs = (1L to 2000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = s"/tmp/graft_io/shards_spec_${java.util.UUID.randomUUID()}"
    Pack.writeShards(docs, "doc_id", numShards = 8, seed = "s", outDir = out)
    val back = spark.read.parquet(out)
    assert(back.count() == 2000)
    // every doc in exactly the shard assignShard says, regardless of layout
    val expect = docs.withColumn("shard", Splits.assignShard(col("doc_id"), 8, "s"))
    assert(back.select(col("doc_id"), col("shard").cast("long"))
      .except(expect.select(col("doc_id"), col("shard"))).count() == 0)
    // 8 shard dirs; repartition-on-shard keeps it to ~one file per shard
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"${d.getName} fragmented into ${files.length} files")
    }
  }

  test("sequenceSpans packs docs contiguously into fixed windows") {
    val docs = Seq(
      (1L, "a b c d e"),      // offset 0, tokens 5  -> seq 0
      (2L, "f g h"),          // offset 5  -> seq 0
      (3L, "i j k l m n o p") // offset 8, 8 tokens -> positions 8..15, seqs 1..1 at window 8
    ).toDF("doc_id", "text")
    val out = Pack.sequenceSpans(docs, "doc_id", "text", window = 8)
      .orderBy("id")
      .select("id", "n_tokens", "start_offset", "first_seq", "last_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 0L, 0L, 0L, 1L),
      (2L, 3L, 5L, 0L, 0L, 1L),
      (3L, 8L, 8L, 1L, 1L, 1L)))
    // a doc straddling a window boundary spans both sequences
    val straddle = Pack.sequenceSpans(
      Seq((1L, "a b c d e f"), (2L, "g h i j")).toDF("doc_id", "text"), "doc_id", "text",
      window = 8).orderBy("id")
      .select("first_seq", "last_seq", "n_seqs").as[(Long, Long, Long)].collect().toSeq
    assert(straddle == Seq((0L, 0L, 1L), (0L, 1L, 2L)))
  }

  test("binPack: bins respect capacity, docs unsplit, overflow flagged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),        // 5 tokens: 2 per bin at C=10
      (2L, "f g h i j"),
      (3L, "k l m n o"),        // third 5-token doc -> second bin
      (4L, "p q r"),            // 3 tokens: 3 per bin
      (5L, "one two three four five six seven eight nine ten eleven") // 11 > C
    ).toDF("doc_id", "text")
    // salts = 1: the unsalted layout, so the fixture's bin ids are the
    // plain per-length ranks (the salted default is pinned below)
    val out = Pack.binPack(docs, "doc_id", "text", capacity = 10, salts = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((5L, 5L, 0L, 1.0)))
    assert(out(2L) == ((5L, 5L, 0L, 1.0)))
    assert(out(3L) == ((5L, 5L, 1L, 1.0)))   // bin 0 full at 2 docs
    assert(out(4L) == ((3L, 3L, 0L, 0.9)))   // 3 docs of 3 = 9/10
    assert(out(5L) == ((11L, 11L, -1L, 0.0))) // overflow flagged
    // no (bin_len, bin_seq) bin exceeds capacity
    val loads = out.values.filter(_._3 >= 0L)
      .groupBy(v => (v._2, v._3)).map { case (_, vs) => vs.map(_._1).sum }
    assert(loads.forall(_ <= 10L), s"overfull bin: $loads")
  }

  test("binPack: empty/whitespace docs never get a null bin id") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, null: String), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = Pack.binPack(docs, "doc_id", "text", capacity = 4).collect()
    assert(out.length == 4)
    // bin_seq and fill_frac are never null — a null bin id would
    // silently vanish from inner-join/groupBy consumers
    assert(out.forall(r => !r.isNullAt(3) && !r.isNullAt(4)),
      s"null bin ids: ${out.mkString(", ")}")
    // empty/whitespace/null text tokenizes to one empty token, so those
    // docs place normally in the length-1 class
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L && byId(4L) == 2L)
  }

  test("binPack: randomized invariants — every doc placed once, no bin overfull") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (1L to 500L).map(i =>
      (i, (0 until (1 + rnd.nextInt(30))).map(_ => "w").mkString(" ")))
    val out = Pack.binPack(docs.toDF("doc_id", "text"), "doc_id", "text", capacity = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    val placed = out.filter(_._4 >= 0L)
    assert(placed.forall(_._2 <= 24L))
    val loads = placed.groupBy(t => (t._3, t._4)).map { case (_, ts) => ts.map(_._2).sum }
    assert(loads.forall(_ <= 24L), s"overfull bin: ${loads.filter(_ > 24L)}")
    assert(out.filter(_._4 == -1L).forall(_._2 > 24L)) // only oversize docs overflow
  }

  test("binPack: uniform-length corpus spreads across salted window partitions") {
    import graft.pipeline.Pack
    import spark.implicits._
    // the straggler corpus: 50k docs of IDENTICAL token length (what a
    // chunked/budget-trimmed corpus looks like). Unsalted, every row
    // lands in ONE window partition — one linear task at 100 TB; the
    // (n_tokens, salt) key must spread placement across all salts.
    val docs = spark.range(1, 50001).select(col("id").as("doc_id"),
      lit("w1 w2 w3 w4 w5").as("text"))
    val out = Pack.binPack(docs, "doc_id", "text", capacity = 20)
      .select(col("id"), col("bin_seq"), pmod(col("bin_seq"), lit(16L)).as("salt"))
      .collect()
    assert(out.length == 50000)
    val bySalt = out.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    // all 16 salts used, and no salt hoards the corpus (md5 is uniform:
    // expected 3125/salt; 2x headroom is far beyond any md5 deviation)
    assert(bySalt.keySet == (0L until 16L).toSet, s"salts used: ${bySalt.keySet}")
    assert(bySalt.values.max <= 2 * 50000 / 16,
      s"salt skew: max=${bySalt.values.max}")
    // placement is still valid packing: 4 docs of 5 tokens per bin,
    // and bins never exceed capacity
    val loads = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(loads.values.forall(_ <= 4), s"overfull bin: ${loads.values.max}")
  }

  test("binPackSaltsFor: the documented sizing formula (ceil division, floor 1, guards)") {
    import graft.pipeline.Pack
    // scaladoc example: 50 M docs of one length at ~2 M rows/task
    assert(Pack.binPackSaltsFor(50000000L, 2000000L) == 25)
    assert(Pack.binPackSaltsFor(50000001L, 2000000L) == 26) // ceil, not floor
    assert(Pack.binPackSaltsFor(1L, 2000000L) == 1)         // never below 1
    assert(Pack.binPackSaltsFor(0L, 1000L) == 1)            // empty class → unsalted
    intercept[IllegalArgumentException](Pack.binPackSaltsFor(-1L, 1000L))
    intercept[IllegalArgumentException](Pack.binPackSaltsFor(10L, 0L))
    // the formula feeds binPack directly: placement at the computed
    // fanout stays a valid packing
    import spark.implicits._
    val docs = spark.range(1, 101).select(col("id").as("doc_id"),
      lit("a b c").as("text"))
    val salts = Pack.binPackSaltsFor(100L, 25L) // = 4
    assert(salts == 4)
    val out = Pack.binPack(docs, "doc_id", "text", capacity = 9, salts = salts).collect()
    assert(out.length == 100)
    val loads = out.groupBy(_.getLong(3)).view.mapValues(_.length)
    assert(loads.values.forall(_ <= 3), "bin over capacity at computed fanout")
  }

  test("maskCorrupt: runs collapse to one sentinel; masked+kept reconstruct the doc") {
    import graft.pipeline.Pack
    val docs = (1L to 200L).map(id => (id, (1 to 30).map(j => s"w${id}_$j").mkString(" ")))
    val out = Pack.maskCorrupt(docs.toDF("doc_id", "text"), "doc_id", "text",
        maskRate = 0.3, seed = "m1")
      .select("doc_id", "masked_text", "targets", "n_masked")
      .as[(Long, String, Seq[String], Long)].collect()
    val byId = docs.toMap
    var totMasked = 0L
    for ((id, masked, targets, n) <- out) {
      assert(n == targets.size)
      totMasked += n
      // kept tokens + masked targets = the original multiset, order kept
      val keptSeq = masked.split(" ").filter(_ != "<mask>").toSeq
      val orig = byId(id).split(" ").toSeq
      assert((keptSeq ++ targets).sorted == orig.sorted, s"doc $id lost tokens")
      // no two adjacent sentinels (runs collapse)
      assert(!masked.contains("<mask> <mask>"), s"doc $id has un-collapsed runs")
      // interleaving order: removing sentinels keeps original relative order
      assert(orig.filter(keptSeq.contains) == keptSeq)
    }
    assert(math.abs(totMasked / 6000.0 - 0.3) < 0.05, s"mask rate off: $totMasked/6000")
    // deterministic under repartition; total at rate 0 and 1
    val again = Pack.maskCorrupt(docs.toDF("doc_id", "text").repartition(5),
        "doc_id", "text", 0.3, "m1")
      .select("doc_id", "masked_text").as[(Long, String)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap == again)
    assert(Pack.maskCorrupt(docs.toDF("doc_id", "text"), "doc_id", "text", 0.0, "m1")
      .agg(sum("n_masked")).as[Long].head() == 0L)
    val full = Pack.maskCorrupt(docs.toDF("doc_id", "text"), "doc_id", "text", 1.0, "m1")
      .select("masked_text").as[String].collect()
    assert(full.forall(_ == "<mask>"), "rate 1: whole doc is one collapsed sentinel")
  }

  test("fimTransform: PSM rendering is a lossless permutation; selection honors the rate") {
    import graft.pipeline.Pack
    val docs = (1L to 400L).map(id => (id, s"doc $id " + ("x" * (id % 23).toInt)))
    val out = Pack.fimTransform(docs.toDF("doc_id", "text"), "doc_id", "text",
        fimRate = 0.5, seed = "s")
      .select("doc_id", "fim", "fim_text")
      .as[(Long, Boolean, String)].collect().toSeq
    val byId = docs.toMap
    var nFim = 0
    for ((id, fim, rendered) <- out) {
      if (!fim) assert(rendered == byId(id))
      else {
        nFim += 1
        // parse the three sections back and reassemble the original
        val pre = rendered.indexOf(Pack.FimPrefix)
        val suf = rendered.indexOf(Pack.FimSuffix)
        val mid = rendered.indexOf(Pack.FimMiddle)
        assert(pre == 0 && suf > 0 && mid > suf, s"bad sentinels in $rendered")
        val p = rendered.substring(Pack.FimPrefix.length, suf)
        val sx = rendered.substring(suf + Pack.FimSuffix.length, mid)
        val m = rendered.substring(mid + Pack.FimMiddle.length)
        assert(p + m + sx == byId(id), s"FIM lost bytes for doc $id")
      }
    }
    assert(math.abs(nFim / 400.0 - 0.5) < 0.1, s"selection far from rate: $nFim/400")
    // deterministic: the same seed reproduces; a new seed re-selects
    val again = Pack.fimTransform(docs.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", 0.5, "s")
      .select("doc_id", "fim", "fim_text").as[(Long, Boolean, String)].collect().toSeq
    assert(again.sortBy(_._1) == out.sortBy(_._1))
    // rate 0 and 1 are total
    assert(Pack.fimTransform(docs.toDF("doc_id", "text"), "doc_id", "text", 0.0, "s")
      .filter(col("fim")).count() == 0L)
    assert(Pack.fimTransform(docs.toDF("doc_id", "text"), "doc_id", "text", 1.0, "s")
      .filter(!col("fim")).count() == 0L)
  }
}
