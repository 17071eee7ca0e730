package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query suite.
  *
  * The driver hashes result values after sorting columns by name, so:
  *  - every computed column is explicitly aliased identically in the
  *    Spark plan and the DuckDB oracle SQL;
  *  - floating-point aggregates are rounded on BOTH sides (money sums
  *    to 2 dp, means/ratios to 6 dp) so double-associativity noise
  *    across engines cannot flip a hash;
  *  - every query has a total deterministic ORDER BY.
  */
object QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  /** Per-JVM scratch token: two concurrent Verify/Bench runs over the
    * same sf dir must not race on each other's scratch files. Shared
    * across query packs so a STATIC oracle SQL can embed the same
    * scratch path its query writes (one sf dir per Verify JVM — the
    * q_io_dynamic_manifest precedent). Overridable for a stable
    * externally-chosen id; defaults to a per-process unique value.
    */
  val runToken: String =
    sys.env.getOrElse("SPARK_GRAFT_RUN_ID",
      java.lang.Long.toHexString(ProcessHandle.current().pid()) + "_" +
        java.lang.Long.toHexString(System.nanoTime()))
      .replaceAll("[^a-zA-Z0-9_]", "_")

  /** money-style sum: stable to 2 dp */
  def r2(c: Column): Column = round(c, 2)

  /** mean/ratio: stable to 6 dp */
  def r6(c: Column): Column = round(c, 6)

  /** Exact decimal cast for money columns: sums of double products can
    * land exactly on a .xx5 rounding boundary (the inputs have 2 dp),
    * where Spark and DuckDB round differently. DECIMAL arithmetic is
    * exact and engine-independent.
    */
  def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** price * (1 - discount) in exact decimals. */
  def netDec(price: Column, disc: Column): Column = dec(price) * (lit(1) - dec(disc))

  /** Final money aggregate: exact decimal sum → 2 dp → double. */
  def sumMoney(c: Column): Column = round(sum(c), 2).cast("double")

  def tables(s: SparkSession, dir: String): graft.Tables = graft.Tables(s, dir)
}

/** A bundle of queries plus their DuckDB oracles. */
trait QueryPack {
  def queries: Map[String, QueryDsl.Q]
  def oracles: Map[String, String]
}
