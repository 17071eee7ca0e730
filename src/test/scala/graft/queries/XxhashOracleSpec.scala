package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[XxhashOracle]]'s generated SQL: structural invariants and
  * byte-determinism of the generator (the hash ARITHMETIC itself is
  * validated end-to-end by the gate — the dedup oracles hash-match
  * Spark's output bit-for-bit at sf0.01 and sf1 — and the string path
  * is fully general: UTF8 from codepoints + the ≥32-byte stripe fold,
  * vector-validated against Spark's xxhash64 including 255-byte and
  * astral-plane inputs).
  */
class XxhashOracleSpec extends SparkSpec {

  test("generated oracles are structurally complete and deterministic") {
    val m1 = XxhashOracle.minhashClusters()
    val m2 = XxhashOracle.minhashClusters()
    // CTE prefixes are uniquified per Pipe (x<uid>_) — normalize them
    // away, then generation must be byte-deterministic
    def norm(s: String) = s.replaceAll("x\\d+_", "xN_")
    assert(norm(m1) == norm(m2), "minhash oracle generation is not deterministic")
    for ((sql, frags) <- Seq(
      m1 -> Seq("bandh", "buckets", "ORDER BY x.id"),
      XxhashOracle.transitiveClusters(maxIters = 3) -> Seq("c3", "bm3", "edges"),
      XxhashOracle.simhashClusters() -> Seq("o63", "simhash"),
      XxhashOracle.newVsIndex() -> Seq("ix_bandh", "nw_bandh", "est_jaccard"))) {
      frags.foreach(f => assert(sql.contains(f), s"oracle SQL lost fragment '$f'"))
      // balanced parentheses — a truncated generator would break here
      assert(sql.count(_ == '(') == sql.count(_ == ')'),
        "unbalanced parentheses in generated oracle SQL")
    }
  }
}
