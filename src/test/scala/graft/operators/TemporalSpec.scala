package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // trades (left): user, time, size. quotes (right): user, time, price.
  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), 100),
    (1L, ts("2024-01-01 10:00:30"), 200),
    (1L, ts("2024-01-01 10:02:00"), 300),
    (2L, ts("2024-01-01 09:59:59"), 400), // before any quote for user 2
    (3L, ts("2024-01-01 10:00:10"), 500)  // user with no quotes at all
  ).toDF("user", "t_ts", "size")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 10.0),
    (1L, ts("2024-01-01 10:00:30"), 11.0), // exactly at trade 2's ts
    (1L, ts("2024-01-01 10:01:00"), 12.0),
    (2L, ts("2024-01-01 10:00:00"), 20.0)
  ).toDF("user", "q_ts", "price")

  test("backward asofJoin picks the latest quote at-or-before each trade") {
    val out = Temporal.asofJoin(trades, quotes, "user", "t_ts", "q_ts", Seq("price"))
      .collect().map(r => (r.getAs[Int]("size"), Option(r.getAs[java.lang.Double]("price")))).toMap
    assert(out(100) == Some(10.0)) // 10:00:05 → quote 10:00:00
    assert(out(200) == Some(11.0)) // equality included
    assert(out(300) == Some(12.0)) // latest of the three
    assert(out(400) == None)       // quote is after the trade
    assert(out(500) == None)       // keyless user survives, null value
  }

  test("forward asofJoin picks the earliest quote at-or-after each trade") {
    val out = Temporal.asofJoin(trades, quotes, "user", "t_ts", "q_ts", Seq("price"),
        direction = "forward")
      .collect().map(r => (r.getAs[Int]("size"), Option(r.getAs[java.lang.Double]("price")))).toMap
    assert(out(100) == Some(11.0)) // next quote after 10:00:05
    assert(out(200) == Some(11.0)) // equality included
    assert(out(300) == None)       // nothing after 10:02:00
    assert(out(400) == Some(20.0))
    assert(out(500) == None)
  }

  test("tolerance nulls matches farther than the bound; matchedTsCol reports") {
    val out = Temporal.asofJoin(trades, quotes, "user", "t_ts", "q_ts", Seq("price"),
        toleranceSec = Some(30L), matchedTsCol = Some("q_at"))
      .collect().map(r => (r.getAs[Int]("size"),
        Option(r.getAs[java.lang.Double]("price")), Option(r.getAs[java.sql.Timestamp]("q_at")))).toList
    val bySize = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(bySize(100) == (Some(10.0), Some(ts("2024-01-01 10:00:00"))))
    // trade 300 at 10:02:00: last quote 10:01:00 is 60s away > 30s
    assert(bySize(300) == (None, None))
  }

  test("asofJoin matches the brute-force inequality-join form exactly") {
    // randomized cross-check on a bigger frame
    val l = spark.range(300).select((col("id") % 7).as("user"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long").plus(xxhash64(col("id")) % 86400)
        .cast("timestamp").as("t_ts"), col("id").as("size"))
    val r = spark.range(150).select((col("id") % 7).as("user"),
      to_timestamp(lit("2024-01-01 00:00:00")).cast("long").plus(xxhash64(col("id"), lit(1)) % 86400)
        .cast("timestamp").as("q_ts"), (col("id") * 10).as("price"))
      .groupBy("user", "q_ts").agg(max("price").as("price")) // unique (key, ts)
    val fast = Temporal.asofJoin(l, r, "user", "t_ts", "q_ts", Seq("price"))
      .select("size", "price").as[(Long, Option[Long])].collect().toMap
    val brute = l.as("l").join(r.as("r"),
        col("l.user") === col("r.user") && col("r.q_ts") <= col("l.t_ts"), "left")
      .groupBy(col("l.size").as("size"))
      .agg(max_by(col("r.price"), col("r.q_ts")).as("price"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
  }

  test("asofJoinChunked equals asofJoin for every chunk size (seeds cross chunks)") {
    // randomized trades/quotes with cross-chunk gaps: some chunks have
    // left rows but no right rows, so seeds must carry state forward
    val rnd = new scala.util.Random(11)
    val l = (1 to 300).map { i =>
      (rnd.nextInt(4).toLong, 1000L + rnd.nextInt(5000), i) }.toDF("k", "lts", "payload")
    // unique (k, rts): right-side ties resolve in unspecified order
    // (the documented contract), so the equivalence fixture dedupes
    val r = (1 to 120).map { i =>
      (rnd.nextInt(5).toLong, 1000L + rnd.nextInt(5000), i * 1.5) }.toDF("k", "rts", "v")
      .dropDuplicates("k", "rts")
    val base = Temporal.asofJoin(l, r, "k", "lts", "rts", Seq("v"),
        toleranceSec = Some(900L), matchedTsCol = Some("m"))
      .collect().map(_.toSeq).toSet
    for (chunkSize <- Seq(1L, 7L, 250L, 100000L)) {
      val chunked = Temporal.asofJoinChunked(l, r, "k", "lts", "rts", Seq("v"),
          chunkSize = chunkSize, toleranceSec = Some(900L), matchedTsCol = Some("m"))
        .collect().map(_.toSeq).toSet
      assert(chunked == base, s"chunkSize=$chunkSize diverges from asofJoin")
    }
    // and on the timestamp-typed fixture (chunk units = seconds)
    val baseTs = Temporal.asofJoin(trades, quotes, "user", "t_ts", "q_ts", Seq("price"))
      .collect().map(_.toSeq).toSet
    val chunkedTs = Temporal.asofJoinChunked(trades, quotes, "user", "t_ts", "q_ts",
      Seq("price"), chunkSize = 60L).collect().map(_.toSeq).toSet
    assert(chunkedTs == baseTs)
  }

  test("forward asofJoinChunked equals forward asofJoin for every chunk size") {
    val rnd = new scala.util.Random(23)
    val l = (1 to 300).map { i =>
      (rnd.nextInt(4).toLong, 1000L + rnd.nextInt(5000), i) }.toDF("k", "lts", "payload")
    val r = (1 to 120).map { i =>
      (rnd.nextInt(5).toLong, 1000L + rnd.nextInt(5000), i * 1.5) }.toDF("k", "rts", "v")
      .dropDuplicates("k", "rts")
    val base = Temporal.asofJoin(l, r, "k", "lts", "rts", Seq("v"),
        direction = "forward", toleranceSec = Some(900L), matchedTsCol = Some("m"))
      .collect().map(_.toSeq).toSet
    for (chunkSize <- Seq(1L, 7L, 250L, 100000L)) {
      val chunked = Temporal.asofJoinChunked(l, r, "k", "lts", "rts", Seq("v"),
          chunkSize = chunkSize, direction = "forward",
          toleranceSec = Some(900L), matchedTsCol = Some("m"))
        .collect().map(_.toSeq).toSet
      assert(chunked == base, s"forward chunkSize=$chunkSize diverges from asofJoin")
    }
    // timestamp-typed fixture too (chunk units = seconds)
    val baseTs = Temporal.asofJoin(trades, quotes, "user", "t_ts", "q_ts", Seq("price"),
        direction = "forward")
      .collect().map(_.toSeq).toSet
    val chunkedTs = Temporal.asofJoinChunked(trades, quotes, "user", "t_ts", "q_ts",
        Seq("price"), chunkSize = 60L, direction = "forward")
      .collect().map(_.toSeq).toSet
    assert(chunkedTs == baseTs)
  }

  test("asofJoinChunked spreads a hot key over (key, chunk) window partitions") {
    // one ultra-hot key spanning 8 chunks: the window partition count
    // for that key must be the chunk count, not 1
    val hotL = (0 until 800).map(i => (1L, i.toLong, i)).toDF("k", "lts", "p")
    val hotR = (0 until 80).map(i => (1L, i.toLong * 10, i * 2.0)).toDF("k", "rts", "v")
    val out = Temporal.asofJoinChunked(hotL, hotR, "k", "lts", "rts", Seq("v"), chunkSize = 100L)
    val base = Temporal.asofJoin(hotL, hotR, "k", "lts", "rts", Seq("v"))
    assert(out.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet)
    // mechanism: the main window pass partitions by (k, __asof_chunk)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("__asof_chunk"), s"chunked window key missing:\n$plan")
  }

  test("intervalJoin pairs points with containing intervals only, bucket-bounded") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"), "p1"),
      (1L, ts("2024-01-01 13:30:00"), "p2"),
      (2L, ts("2024-01-01 10:30:00"), "p3")).toDF("k", "at", "pt")
    val spans = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "s1"), // contains p1
      (1L, ts("2024-01-01 10:15:00"), ts("2024-01-01 14:00:00"), "s2"), // contains p1+p2
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), "s3")  // misses p3
    ).toDF("k", "s", "e", "span")
    val out = Temporal.intervalJoin(points, spans, "k", "at", "s", "e")
      .select("pt", "span").as[(String, String)].collect().toSet
    assert(out == Set(("p1", "s1"), ("p1", "s2"), ("p2", "s2")))
  }

  test("intervalOverlapJoin: each overlapping pair emits exactly once, matches brute force") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 16:00:00"), "L1"), // spans many buckets
      (1L, ts("2024-01-01 18:00:00"), ts("2024-01-01 18:30:00"), "L2"),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "L3")
    ).toDF("k", "ls", "le", "lname")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00"), "R1"), // overlaps L1 (3h shared)
      (1L, ts("2024-01-01 15:59:00"), ts("2024-01-01 19:00:00"), "R2"), // overlaps L1 AND L2
      (1L, ts("2024-01-01 16:00:01"), ts("2024-01-01 17:00:00"), "R3"), // just past L1
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), "R4")  // touches L3 endpoint
    ).toDF("k", "rs", "re", "rname")
    val out = Temporal.intervalOverlapJoin(left, right, "k", "ls", "le", "rs", "re",
        bucketSec = 900L)
      .select("lname", "rname").as[(String, String)].collect().toList
    // exactly-once despite multi-bucket co-residency
    assert(out.size == out.distinct.size, s"duplicate pair emission: $out")
    assert(out.toSet == Set(("L1", "R1"), ("L1", "R2"), ("L2", "R2"), ("L3", "R4")))
    // brute-force equivalence on a randomized corpus
    val rnd = new scala.util.Random(5)
    def mk(n: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(100000)
      (rnd.nextInt(4).toLong, s.toLong, (s + rnd.nextInt(7200)).toLong, i)
    }
    val la = mk(300).toDF("k", "ls", "le", "lid")
    val rb = mk(300).toDF("k", "rs", "re", "rid")
    val fast = Temporal.intervalOverlapJoin(la, rb, "k", "ls", "le", "rs", "re",
        bucketSec = 600L, maxIntervalSec = 7200L)
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    val brute = la.join(rb, la("k") === rb("k") &&
        la("ls") <= rb("re") && rb("rs") <= la("le"))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(fast == brute)
  }

  test("intervalJoin raises on intervals beyond maxIntervalSec") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"), "p")).toDF("k", "at", "pt")
    val spans = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), "wide"))
      .toDF("k", "s", "e", "span")
    val ex = intercept[Exception](
      Temporal.intervalJoin(points, spans, "k", "at", "s", "e",
        bucketSec = 3600, maxIntervalSec = 86400).count())
    assert(ex.getMessage.contains("maxIntervalSec") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxIntervalSec")))
  }

  test("asofJoin rejects output-column collisions") {
    intercept[IllegalArgumentException](
      Temporal.asofJoin(trades, quotes.withColumnRenamed("price", "size"),
        "user", "t_ts", "q_ts", Seq("size")))
  }
}
