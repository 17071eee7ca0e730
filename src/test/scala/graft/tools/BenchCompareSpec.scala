package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.tools.BenchCompare's normalization arithmetic on
  * synthetic artifacts: the cross-round drift adjudication is now a
  * division, and a division deserves a unit test — a sign error in
  * the calib ratio would flip every future round's verdict reading.
  */
class BenchCompareSpec extends AnyFunSuite {

  private def artifact(calibPre: Double, calibPost: Double,
                       qs: Map[String, Double], total: Double,
                       bw: Option[(Double, Double)] = None,
                       bwThreads: Option[Int] = None): String = {
    val f = java.nio.file.Files.createTempFile("graft_bench", ".json")
    val qJson = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val bwJson = bw.map { case (pre, post) =>
      s""","calib_bw_pre":$pre,"calib_bw_post":$post""" +
        bwThreads.map(t => s""","calib_bw_threads":$t""").getOrElse("")
    }.getOrElse("")
    java.nio.file.Files.writeString(f,
      s"""{"metric":"total","queries_min":$qJson,"queries":$qJson,""" +
        s""""env":{"calib_multi_pre":$calibPre,"calib_multi_post":$calibPost$bwJson},""" +
        s""""value":$total,"unit":"sec"}""")
    f.toFile.deleteOnExit()
    f.toString
  }

  private def parse(json: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)

  test("a machine that slowed 25% with unchanged code normalizes to ratio 1") {
    // reference machine: calib 0.8s; current machine 25% slower:
    // calib 1.0s — every query raw ratio 1.25, normalized exactly 1.0
    val ref = artifact(0.8, 0.8, Map("q_a" -> 2.0, "q_b" -> 0.4), 2.4)
    val cur = artifact(1.0, 1.0, Map("q_a" -> 2.5, "q_b" -> 0.5), 3.0)
    val out = parse(BenchCompare.compare(ref, cur))
    assert(math.abs(out.get("calib_ratio").asDouble - 0.8) < 1e-9)
    val qa = out.get("queries").get("q_a")
    assert(math.abs(qa.get("raw").asDouble - 1.25) < 1e-3)
    assert(math.abs(qa.get("norm").asDouble - 1.0) < 1e-3)
    assert(math.abs(out.get("total_norm_ratio").asDouble - 1.0) < 1e-3)
    assert(out.get("flagged").size() == 0,
      "pure machine drift must flag nothing after normalization")
  }

  test("a real regression survives normalization and is flagged; calib uses min(pre, post)") {
    // same-speed machines (pre spiked by interference — min() must
    // pick the clean 0.8 on both sides); q_slow genuinely 2x slower
    val ref = artifact(0.8, 0.9, Map("q_ok" -> 1.0, "q_slow" -> 1.0), 2.0)
    val cur = artifact(0.9, 0.8, Map("q_ok" -> 1.0, "q_slow" -> 2.0), 3.0)
    val out = parse(BenchCompare.compare(ref, cur))
    assert(math.abs(out.get("calib_ratio").asDouble - 1.0) < 1e-9)
    assert(math.abs(out.get("queries").get("q_slow").get("norm").asDouble - 2.0) < 1e-3)
    assert(out.get("flagged").has("q_slow") && !out.get("flagged").has("q_ok"))
  }

  test("queries present in only one artifact are reported, not silently dropped") {
    val ref = artifact(0.8, 0.8, Map("q_a" -> 1.0, "q_gone" -> 1.0), 2.0)
    val cur = artifact(0.8, 0.8, Map("q_a" -> 1.0, "q_new" -> 1.0), 2.0)
    val out = parse(BenchCompare.compare(ref, cur))
    val dropped = (0 until out.get("not_in_both").size())
      .map(out.get("not_in_both").get(_).asText()).toSet
    assert(dropped == Set("q_gone", "q_new"))
    assert(out.get("queries").has("q_a") && !out.get("queries").has("q_new"))
  }

  test("bw-clean recordings: bw_comparable, bw-normalized total emitted") {
    // both recordings bw-flat (spread 1.0); cur's memory subsystem is
    // 25% slower (0.020 → 0.025) while ALU calib is flat — raw 1.25
    // divides out to exactly 1.0 under the bw ratio
    val ref = artifact(0.8, 0.8, Map("q_a" -> 2.0), 2.0, bw = Some((0.020, 0.020)),
      bwThreads = Some(32))
    val cur = artifact(0.8, 0.8, Map("q_a" -> 2.5), 2.5, bw = Some((0.025, 0.025)),
      bwThreads = Some(32))
    val out = parse(BenchCompare.compare(ref, cur))
    assert(out.get("bw_comparable").asBoolean)
    assert(!out.get("bw_contended_ref").asBoolean && !out.get("bw_contended_cur").asBoolean)
    assert(math.abs(out.get("bw_ratio").asDouble - 0.8) < 1e-9)
    assert(math.abs(out.get("total_bw_norm_ratio").asDouble - 1.0) < 1e-3)
  }

  test("a contended recording (bw spread past the bound) self-rejects") {
    // the r15 sf10 shape: pre 0.0224 → post 0.0340 is spread 1.52 —
    // past BwSpreadBound, so the artifact flags contended and no
    // bw-normalized total is emitted (it would normalize by a number
    // that changed mid-run)
    val ref = artifact(0.8, 0.8, Map("q_a" -> 2.0), 2.0, bw = Some((0.0227, 0.0229)))
    val cur = artifact(0.8, 0.8, Map("q_a" -> 2.5), 2.5, bw = Some((0.0224, 0.0340)))
    val out = parse(BenchCompare.compare(ref, cur))
    assert(!out.get("bw_contended_ref").asBoolean)
    assert(out.get("bw_contended_cur").asBoolean)
    assert(!out.get("bw_comparable").asBoolean)
    assert(!out.has("total_bw_norm_ratio"),
      "a contended recording must not produce a bw-normalized total")
    // the ALU-normalized figures still emit — the reader sees both the
    // ratio and the reason it needs a second recording
    assert(out.has("total_norm_ratio"))
  }

  test("mismatched bw thread counts are not bandwidth-comparable") {
    // the probe is fixed work PER THREAD: a heap-capped recording ran
    // fewer threads, so its seconds measure different total work
    val ref = artifact(0.8, 0.8, Map("q_a" -> 2.0), 2.0, bw = Some((0.020, 0.020)),
      bwThreads = Some(32))
    val cur = artifact(0.8, 0.8, Map("q_a" -> 2.0), 2.0, bw = Some((0.020, 0.020)),
      bwThreads = Some(8))
    val out = parse(BenchCompare.compare(ref, cur))
    assert(!out.get("bw_threads_match").asBoolean)
    assert(!out.get("bw_comparable").asBoolean)
    assert(!out.has("total_bw_norm_ratio"))
  }

  test("a probe-less (pre-r14) artifact is refused, not silently compared") {
    val ref = artifact(0.8, 0.8, Map("q_a" -> 1.0), 1.0)
    val f = java.nio.file.Files.createTempFile("graft_bench", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","queries_min":{"q_a":1.0},"queries":{"q_a":1.0},""" +
        """"env":{"load_avg_start":0.1},"value":1.0,"unit":"sec"}""")
    f.toFile.deleteOnExit()
    val e = intercept[IllegalArgumentException] {
      BenchCompare.compare(ref, f.toString)
    }
    assert(e.getMessage.contains("calibration probe"))
  }
}
