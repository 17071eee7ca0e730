package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards for [[XxhashOracle]]'s stated corpus contract: the DuckDB
  * reimplementation of Spark's xxhash64 covers the < 32-byte
  * single-lane string path over ASCII codepoints. A corpus whose
  * tokens break either bound would make the dedup oracles
  * hash-MISMATCH (loud, never silent) — this spec makes the cause
  * diagnosable before the gate trips, and pins the generated SQL's
  * structural invariants.
  */
class XxhashOracleSpec extends SparkSpec {

  test("gate corpora keep tokens inside the oracle's <32-byte ASCII contract") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val stats = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
        .agg(max(octet_length(col("w"))).as("max_bytes"),
          sum(when(octet_length(col("w")) =!= length(col("w")), 1L)
            .otherwise(0L)).as("non_ascii"))
        .head()
      assert(stats.getInt(0) < 32,
        s"$dir has a token of ${stats.getInt(0)} bytes — XxhashOracle implements only " +
          "the <32-byte XXH64 path; add the 4-accumulator long path before regenerating " +
          "test data with long tokens")
      assert(stats.getLong(1) == 0L,
        s"$dir has non-ASCII tokens — XxhashOracle reads bytes via ascii(substr(...)), " +
          "which equals UTF8 bytes only for ASCII")
    }
  }

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
