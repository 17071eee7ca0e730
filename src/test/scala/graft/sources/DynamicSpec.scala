package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.io.Source

class DynamicSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_dynamic").toFile
    d.deleteOnExit()
    d
  }

  private def linesUnder(dir: java.io.File): Map[String, Seq[String]] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.startsWith("part-")).groupBy { f =>
      dir.toPath.relativize(f.getParentFile.toPath).toString
    }.map { case (dest, files) =>
      dest -> files.sortBy(_.getName).flatMap { f =>
        val s = Source.fromFile(f, "UTF-8"); try s.getLines().toList finally s.close()
      }
    }
  }

  test("each record lands under its own destination with exact contents") {
    val out = tmpDir()
    val df = Seq(
      ("a", "line-a1"), ("b", "line-b1"), ("a", "line-a2"), ("c", "line-c1")
    ).toDF("dest", "text")
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    val got = linesUnder(out)
    assert(got.keySet == Set("a", "b", "c"))
    assert(got("a").sorted == Seq("line-a1", "line-a2"))
    assert(got("b") == Seq("line-b1"))
    assert(got("c") == Seq("line-c1"))
  }

  test("nested destinations create the full relative tree") {
    val out = tmpDir()
    val df = Seq(("logs/2024/01", "x"), ("logs/2024/02", "y")).toDF("dest", "text")
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    val got = linesUnder(out)
    assert(got.keySet == Set("logs/2024/01", "logs/2024/02"))
    assert(got("logs/2024/01") == Seq("x"))
  }

  test("path escapes and null destinations are rejected") {
    val out = tmpDir()
    val escape = Seq(("../evil", "x")).toDF("dest", "text")
    val e = intercept[org.apache.spark.SparkException] {
      Dynamic.saveAsDynamicText(escape, out.getAbsolutePath, "dest", "text")
    }
    assert(e.getCause.getMessage.contains("must not contain"))
    val nul = Seq((null: String, "x")).toDF("dest", "text")
    intercept[org.apache.spark.SparkException] {
      Dynamic.saveAsDynamicText(nul, out.getAbsolutePath, "dest", "text")
    }
    assert(!new java.io.File(out, "../evil").exists())
  }

  test("fanout spreads a hot destination over several files, contents preserved") {
    val out = tmpDir()
    val df = spark.range(0, 200).select(lit("hot").as("dest"), concat(lit("r"), col("id")).as("text"))
    // AQE correctly coalesces KB-sized salted partitions back into one
    // (at real scale it only merges below the advisory size); disable
    // it here to observe the salting mechanism itself.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text", fanout = 4)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val files = new java.io.File(out, "hot").listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length > 1, "fanout should produce multiple part files for a hot destination")
    assert(linesUnder(out)("hot").sorted == (0L until 200L).map(i => s"r$i").sorted)
  }

  test("fanout spreads even when every hot-destination row has IDENTICAL text") {
    // a content-hash salt would collapse identical rows onto one salt
    // (the advisory finding); the per-row salt must still spread them
    val out = tmpDir()
    val df = spark.range(0, 200).repartition(8)
      .select(lit("hot").as("dest"), lit("same line every time").as("text"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text", fanout = 4)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val files = new java.io.File(out, "hot").listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length > 1,
      s"identical-text hot destination must still fan out, got ${files.length} file(s)")
    assert(linesUnder(out)("hot").size == 200)
  }

  test("re-running over an existing tree replaces it (no stale finals survive)") {
    val out = tmpDir()
    val v1 = Seq(("d", "old1"), ("gone", "old2")).toDF("dest", "text")
    Dynamic.saveAsDynamicText(v1, out.getAbsolutePath, "dest", "text")
    val v2 = Seq(("d", "new1")).toDF("dest", "text")
    Dynamic.saveAsDynamicText(v2, out.getAbsolutePath, "dest", "text")
    assert(linesUnder(out)("d") == Seq("new1"))
    assert(!new java.io.File(out, "gone").exists(), "stale destination dir must not survive")
  }

  test("no uncommitted attempt temp files remain after a clean write") {
    // (Hadoop's LocalFileSystem .crc checksum sidecars are expected;
    // the rename commit must leave no .part-*.attempt-* temps behind)
    val out = tmpDir()
    val df = Seq(("a", "1"), ("b", "2"), ("a", "3")).toDF("dest", "text")
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(out).filter(_.getName.contains(".attempt-")).isEmpty)
  }

  test("null text writes an empty line, row count preserved") {
    val out = tmpDir()
    val df = Seq(("d", "x"), ("d", null: String)).toDF("dest", "text")
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    assert(linesUnder(out)("d").sorted == Seq("", "x"))
  }

  test("a non-empty directory this sink didn't write is NOT wiped (marker guard)") {
    val out = tmpDir()
    val precious = new java.io.File(out, "unrelated.txt")
    java.nio.file.Files.write(precious.toPath, "do not delete".getBytes)
    val df = Seq(("d", "x")).toDF("dest", "text")
    val e = intercept[IllegalArgumentException] {
      Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    }
    assert(e.getMessage.contains("_GRAFT_DYNAMIC"))
    assert(precious.exists, "foreign file must survive the refused write")
    // explicit opt-in wipes and writes
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text",
      overwriteForeign = true)
    assert(!precious.exists)
    assert(linesUnder(out)("d") == Seq("x"))
  }

  test("a tree from a run that died mid-write (marker + partial files) retries cleanly") {
    // the marker is stamped BEFORE writing, so a crashed run leaves
    // marker + committed partials; the retry must recognize its own
    // output and wipe it without overwriteForeign
    val out = tmpDir()
    new java.io.File(out, "_GRAFT_DYNAMIC").createNewFile()
    val partial = new java.io.File(out, "d")
    partial.mkdirs()
    java.nio.file.Files.write(new java.io.File(partial, "part-00000.txt").toPath,
      "stale\n".getBytes)
    val df = Seq(("d", "fresh")).toDF("dest", "text")
    Dynamic.saveAsDynamicText(df, out.getAbsolutePath, "dest", "text")
    assert(linesUnder(out)("d") == Seq("fresh"))
  }
}
