package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-order prefix sums without a single-partition window — the
  * machinery behind training-data export: sequence packing
  * (concatenate every document's tokens in corpus order and split
  * into fixed context windows), global row indexing, deterministic
  * shard assignment. The reference reaches these through user code
  * over scio's keyed verbs; graft ships them as first-class ops
  * because the naive Spark spelling — `sum(...).over(Window.orderBy
  * (id))` — collapses 100 TB into ONE window partition and cannot
  * scale past a single task.
  *
  * Scale shape (the distributed-scan pattern RDD.zipWithIndex uses,
  * lifted to weighted sums and kept in the DataFrame API):
  *   1. bucket each row by a deterministic range split of the
  *      numeric order key (min/max from one cheap agg — no sampling
  *      pass, no nondeterminism);
  *   2. per-bucket totals (map-side partial agg; `numBuckets` rows)
  *      → exclusive bucket prefix offsets, computed on the driver
  *      (bounded: one tuple per bucket, disclosed `.collect()`)
  *      and broadcast back as a join-able literal frame;
  *   3. one shuffle by bucket; within each bucket a per-bucket
  *      window cumsum adds the broadcast offset.
  * Total movement: one balanced exchange of the data + two
  * `numBuckets`-row jobs, vs the naive form's whole-corpus single
  * task.
  *
  * The order key must be unique per row (ties would make the prefix
  * sum nondeterministic); duplicate keys fail the run loudly.
  */
object GlobalOrder {

  /** Adds `offsetCol` = sum of `weight` over all rows with a smaller
    * `orderCol` (exclusive prefix sum in global `orderCol` order).
    * `orderCol` must be numeric and unique; `weight` must be
    * non-null and non-negative (both validated by the probe agg).
    * One balanced shuffle at any corpus size.
    */
  def withGlobalOffset(df: DataFrame, orderCol: String, weight: Column,
                       offsetCol: String = "offset",
                       numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(!df.columns.contains(offsetCol),
      s"input already has a '$offsetCol' column; pass a different offsetCol")
    val k = col(orderCol).cast("double")
    // one probe agg: bounds, uniqueness, and the two key pathologies
    // that would otherwise DROP rows silently (null keys never join a
    // bucket; NaN poisons floor() into a null bucket)
    val Array(mn, mx, n, nd, nNull, nNan, nBadW, nFracW) = df
      .agg(min(k), max(k), count(lit(1)), countDistinct(col(orderCol)),
        count(when(k.isNull, 1)), count(when(isnan(k), 1)),
        count(when(weight.isNull || weight < 0, 1)),
        count(when(weight =!= weight.cast("long"), 1)))
      .collect()(0).toSeq.toArray
    val (lo, hi, total) =
      (Option(mn).map(_.toString.toDouble).getOrElse(0.0),
        Option(mx).map(_.toString.toDouble).getOrElse(0.0),
        n.toString.toLong)
    require(nNull.toString.toLong == 0,
      s"orderCol '$orderCol' has ${nNull} null keys; the global order is undefined for them")
    require(nNan.toString.toLong == 0,
      s"orderCol '$orderCol' has ${nNan} NaN keys; the global order is undefined for them")
    require(nBadW.toString.toLong == 0,
      s"weight is null/negative on ${nBadW} rows; offsets would silently skip or regress")
    require(nFracW.toString.toLong == 0,
      s"weight is fractional on ${nFracW} rows; the long prefix sum would silently " +
        "truncate — scale fractional weights to integers first")
    require(nd.toString.toLong == total,
      s"orderCol '$orderCol' has duplicate values (${total - nd.toString.toLong} collisions); " +
        "the global prefix sum needs a unique order key")
    val width = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(floor((k - lit(lo)) / lit(width)), lit(numBuckets - 1L))
      .cast("long")
    val withB = df.withColumn("__go_bucket", bucket).withColumn("__go_w", weight.cast("long"))
    // numBuckets rows to the driver: exclusive prefix over bucket sums.
    val sums = withB.groupBy(col("__go_bucket")).agg(sum(col("__go_w")).as("__go_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val prefixes = sums.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offsets = broadcast(
      df.sparkSession.createDataFrame(prefixes).toDF("__go_bucket", "__go_off"))
    val w = Window.partitionBy(col("__go_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(offsets, Seq("__go_bucket"))
      .withColumn(offsetCol,
        col("__go_off") + coalesce(sum(col("__go_w")).over(w), lit(0L)))
      .drop("__go_bucket", "__go_w", "__go_off")
  }

  /** [[withGlobalOffset]] for DOUBLE weights — log-space cumulative
    * products (survival curves, probability masses) and other
    * fractional prefix sums. Same balanced bucketed machinery,
    * exclusive prefix accumulated in double. Floating-point caveat,
    * stated plainly: partial-sum ASSOCIATION differs from a
    * sequential fold, so low-order bits depend on partitioning —
    * consumers must round their outputs (relative error here is
    * ~1e-12; every gate that uses this rounds at 1e-6). Null/NaN
    * weights reject loudly; negative weights are ALLOWED (log terms
    * are negative), unlike the long form.
    */
  def withGlobalOffsetDouble(df: DataFrame, orderCol: String, weight: Column,
                             offsetCol: String = "offset",
                             numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(!df.columns.contains(offsetCol),
      s"input already has a '$offsetCol' column; pass a different offsetCol")
    val k = col(orderCol).cast("double")
    val wd = weight.cast("double")
    val Array(mn, mx, n, nd, nNull, nNan, nBadW) = df
      .agg(min(k), max(k), count(lit(1)), countDistinct(col(orderCol)),
        count(when(k.isNull, 1)), count(when(isnan(k), 1)),
        count(when(wd.isNull || isnan(wd), 1)))
      .collect()(0).toSeq.toArray
    val (lo, hi, total) =
      (Option(mn).map(_.toString.toDouble).getOrElse(0.0),
        Option(mx).map(_.toString.toDouble).getOrElse(0.0),
        n.toString.toLong)
    require(nNull.toString.toLong == 0,
      s"orderCol '$orderCol' has ${nNull} null keys; the global order is undefined for them")
    require(nNan.toString.toLong == 0,
      s"orderCol '$orderCol' has ${nNan} NaN keys; the global order is undefined for them")
    require(nBadW.toString.toLong == 0,
      s"weight is null/NaN on ${nBadW} rows; the prefix sum would poison silently")
    require(nd.toString.toLong == total,
      s"orderCol '$orderCol' has duplicate values (${total - nd.toString.toLong} collisions); " +
        "the global prefix sum needs a unique order key")
    val width = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucket = least(floor((k - lit(lo)) / lit(width)), lit(numBuckets - 1L))
      .cast("long")
    val withB = df.withColumn("__go_bucket", bucket).withColumn("__go_w", wd)
    val sums = withB.groupBy(col("__go_bucket")).agg(sum(col("__go_w")).as("__go_s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val prefixes = sums.scanLeft((Long.MinValue, 0.0)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offsets = broadcast(
      df.sparkSession.createDataFrame(prefixes).toDF("__go_bucket", "__go_off"))
    val w = Window.partitionBy(col("__go_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(offsets, Seq("__go_bucket"))
      .withColumn(offsetCol,
        col("__go_off") + coalesce(sum(col("__go_w")).over(w), lit(0.0)))
      .drop("__go_bucket", "__go_w", "__go_off")
  }

  /** Greedy budgeted prefix: the rows of the contiguous ascending-
    * `orderCol` prefix whose cumulative `weight` stays within
    * `budget` — "fill the token budget in priority order", the final
    * step after scoring/ranking a corpus (order by a priority key,
    * weight by token counts). With non-negative weights the inclusive
    * running total is monotone in the order, so the single filter IS
    * the contiguous prefix. Same one-balanced-shuffle machinery and
    * key contract as [[withGlobalOffset]].
    */
  def takePrefixByWeight(df: DataFrame, orderCol: String, weight: Column,
                         budget: Long, numBuckets: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    withGlobalOffset(df, orderCol, weight, "__tp_off", numBuckets)
      .filter(col("__tp_off") + weight.cast("long") <= budget)
      .drop("__tp_off")
  }

  /** Dense 0..n-1 global index in `orderCol` order (scio/RDD
    * zipWithIndex parity, DataFrame-native and balanced).
    */
  def zipWithGlobalIndex(df: DataFrame, orderCol: String,
                         indexCol: String = "index",
                         numBuckets: Int = 1024): DataFrame =
    withGlobalOffset(df, orderCol, lit(1L), indexCol, numBuckets)
}
