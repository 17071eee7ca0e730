package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.sys.process._

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TarSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_tar_$tag").toString

  test("roundtrip: named binary members survive write + read") {
    val base = tmpDir("rt")
    try {
      val rows = (1 to 200).map(i =>
        (f"sample$i%04d.txt", s"content of member $i".getBytes(StandardCharsets.UTF_8)))
      val df = rows.toDF("name", "value").repartition(4)
      val shards = Tar.write(df, s"$base/out")
      assert(shards == 4)
      assert(new java.io.File(s"$base/out/_SUCCESS").exists())
      val back = Tar.read(spark, s"$base/out")
        .select("name", "value").collect()
        .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), StandardCharsets.UTF_8))
        .toMap
      assert(back == rows.map { case (n, b) => n -> new String(b, StandardCharsets.UTF_8) }.toMap)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("STOCK interop: GNU tar lists and extracts graft shards byte-exactly") {
    val base = tmpDir("stock")
    try {
      val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte) // non-512-aligned
      Tar.write(Seq(("a.bin", payload), ("dir.name.txt", "hello tar".getBytes("UTF-8")))
        .toDF("name", "value").coalesce(1), s"$base/out")
      val shard = new java.io.File(s"$base/out").listFiles()
        .filter(_.getName.endsWith(".tar")).head
      val listed = Seq("tar", "-tf", shard.toString).!!.trim.split("\n").toSet
      assert(listed == Set("a.bin", "dir.name.txt"), s"stock tar saw: $listed")
      val ex = new java.io.File(base, "x"); ex.mkdirs()
      assert(Seq("tar", "-xf", shard.toString, "-C", ex.toString).! == 0)
      assert(Files.readAllBytes(Paths.get(s"$ex/a.bin")).sameElements(payload))
      assert(new String(Files.readAllBytes(Paths.get(s"$ex/dir.name.txt")), "UTF-8")
        == "hello tar")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("FOREIGN read: archives written by GNU tar parse, incl. subdir names") {
    val base = tmpDir("foreign")
    try {
      val src = new java.io.File(base, "src/sub"); src.mkdirs()
      Files.write(Paths.get(s"$base/src/top.txt"), "top content".getBytes("UTF-8"))
      Files.write(Paths.get(s"$base/src/sub/inner.bin"), Array[Byte](1, 2, 3, 4, 5))
      assert(Seq("tar", "-cf", s"$base/foreign.tar", "-C", s"$base/src",
        "top.txt", "sub/inner.bin").! == 0)
      val back = Tar.read(spark, s"$base/foreign.tar")
        .select("name", "value").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(back.keySet == Set("top.txt", "sub/inner.bin"))
      assert(new String(back("top.txt"), "UTF-8") == "top content")
      assert(back("sub/inner.bin").toSeq == Seq[Byte](1, 2, 3, 4, 5))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("readSamples groups members into WebDataset samples by key prefix") {
    val base = tmpDir("wds")
    try {
      Tar.write(Seq(
        ("0001.jpg", Array[Byte](1, 1)), ("0001.txt", "cap one".getBytes("UTF-8")),
        ("0001.seg.json", "{}".getBytes("UTF-8")),
        ("0002.jpg", Array[Byte](2, 2)), ("0002.txt", "cap two".getBytes("UTF-8")),
        ("plain", Array[Byte](9)))
        .toDF("name", "value").coalesce(1), s"$base/out")
      val samples = Tar.readSamples(spark, s"$base/out")
        .collect().map(r => r.getString(1) ->
          r.getMap[String, Array[Byte]](2).toMap.view.mapValues(_.toSeq).toMap).toMap
      assert(samples.keySet == Set("0001", "0002", "plain"))
      assert(samples("0001").keySet == Set("jpg", "txt", "seg.json"),
        "multi-dot extension keeps everything after the FIRST dot")
      assert(new String(samples("0001")("txt").toArray, "UTF-8") == "cap one")
      assert(samples("0002")("jpg") == Seq[Byte](2, 2))
      assert(samples("plain").keySet == Set(""))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("fuzz: random byte streams reject loudly, never hang or mis-parse") {
    val base = tmpDir("fuzz")
    try {
      val rnd = new scala.util.Random(42)
      (1 to 10).foreach { i =>
        val junk = new Array[Byte](rnd.nextInt(4000) + 100)
        rnd.nextBytes(junk)
        java.nio.file.Files.write(Paths.get(s"$base/junk$i.tar"), junk)
        try {
          val n = Tar.read(spark, s"$base/junk$i.tar").count()
          // only an all-zero prefix (end-of-archive) may read as empty
          assert(n == 0L, s"fuzz $i parsed $n members from random bytes")
        } catch {
          case _: org.apache.spark.SparkException => () // loud reject — expected
        }
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("corrupt archives fail loudly; guards on names and nulls") {
    val base = tmpDir("bad")
    try {
      // flip a byte inside a valid header → checksum mismatch
      val good = Tar.header("x.txt", 4L) ++ "abcd".getBytes ++
        new Array[Byte](508) ++ new Array[Byte](1024)
      good(0) = 'y'.toByte
      Files.write(Paths.get(s"$base/corrupt.tar"), good)
      val e = intercept[org.apache.spark.SparkException](
        Tar.read(spark, s"$base/corrupt.tar").count())
      assert(e.getMessage.contains("checksum") || e.getCause != null)
      // zero-length and over-long names, null values
      intercept[IllegalArgumentException](Tar.header("", 1L))
      intercept[IllegalArgumentException](Tar.header("a" * 101, 1L))
      val nulls = Seq(("ok.txt", null.asInstanceOf[Array[Byte]])).toDF("name", "value")
      intercept[org.apache.spark.SparkException](Tar.write(nulls, s"$base/nullout"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
