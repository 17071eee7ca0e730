package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies mirroring scio's pair-join families, Spark-first.
  *
  * scio offers shuffle joins (PairSCollectionFunctions.join:~L200),
  * map-side hash joins (PairHashSCollectionFunctions.hashJoin),
  * skew-aware joins (PairSkewedSCollectionFunctions.skewedJoin, CMS
  * hot-key split) and Bloom-prefiltered sparse joins
  * (PairSCollectionFunctions.sparseJoin). On Spark the equivalents
  * are: Catalyst SMJ/shuffled-hash (default), `broadcast()` hints,
  * salted joins + AQE skew handling, and a sketch-prefiltered join.
  *
  * All helpers keep the plan declarative so pushdown/pruning/AQE
  * still apply; at 100 TB the decisions below (broadcast vs shuffle,
  * salt fanout, prefilter) are exactly the knobs that matter.
  */
object Joins {

  /** scio hashJoin: replicate the small side to every task — Spark's
    * broadcast hash join. Use when `right` fits comfortably on one
    * executor (dimension tables).
    */
  def hashJoin(left: DataFrame, right: DataFrame, on: Column, how: String = "inner"): DataFrame =
    left.join(broadcast(right), on, how)

  /** scio skewedJoin: decouple hot keys from the shuffle by salting.
    * Left rows get a random salt in [0, fanout); right rows are
    * replicated once per salt. The shuffle key becomes (key, salt) so
    * a hot key spreads over `fanout` reducers. AQE's skew-join split
    * handles residual imbalance at runtime.
    *
    * Use when `right` is too big to broadcast but small enough to
    * replicate `fanout`×, and `left` has known hot keys.
    */
  def skewedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], fanout: Int,
                 how: String = "inner"): DataFrame = {
    require(fanout > 0, s"fanout must be positive, got $fanout")
    val salt = "__graft_salt"
    val l = left.withColumn(salt, (rand(42) * fanout).cast("int"))
    val r = right.withColumn(salt, explode(sequence(lit(0), lit(fanout - 1))))
    l.join(r, keys :+ salt, how).drop(salt)
  }

  /** scio sparseJoin/sparseLookup: when the keyed (right) side is far
    * smaller than the big (left) side but too big to broadcast
    * exactly, prefilter the big side with a Bloom filter over the
    * right keys before the shuffle. False positives only cost shuffle
    * bytes — join semantics are exact.
    */
  def sparseJoin(left: DataFrame, right: DataFrame, key: String,
                 expectedRightKeys: Long = 1000000L, fpp: Double = 0.01,
                 how: String = "inner"): DataFrame = {
    val bf = right.stat.bloomFilter(key, expectedRightKeys, fpp)
    val bcast = left.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => k != null && bcast.value.mightContainLong(k))
    left.filter(mightContain(col(key).cast("long"))).join(right, Seq(key), how)
  }

  /** scio intersectByKey / hashIntersectByKey → left-semi join. */
  def semiJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_semi")

  /** scio subtractByKey / hashSubtractByKey → left-anti join. */
  def antiJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_anti")

  /** scio withHotKeyFanout: two-phase aggregation — pre-aggregate on
    * (key, salt), then merge per key. Spark's hash aggregate is
    * already partial (map-side combine), so this only pays off when a
    * single reducer key overwhelms even the merge phase; exposed for
    * parity and for non-algebraic payloads.
    */
  def fanoutAgg(df: DataFrame, keys: Seq[String], fanout: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salt = "__graft_salt"
    df.withColumn(salt, (rand(42) * fanout).cast("int"))
      .groupBy((keys :+ salt).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** scio cogroup/groupWith for two keyed frames: per key, the sorted
    * list of values from each side, full-outer joined. Arrays are
    * sorted so downstream consumers see deterministic groups.
    */
  def cogroup(left: DataFrame, right: DataFrame, key: String,
              leftVal: String, rightVal: String): DataFrame = {
    val l = left.groupBy(col(key)).agg(sort_array(collect_list(col(leftVal))).as(s"${leftVal}s"))
    val r = right.groupBy(col(key)).agg(sort_array(collect_list(col(rightVal))).as(s"${rightVal}s"))
    l.join(r, Seq(key), "full_outer")
  }
}
