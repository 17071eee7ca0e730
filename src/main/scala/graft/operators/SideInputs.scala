package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import scala.reflect.ClassTag

/** Named side-input shapes — graft's counterpart to scio's SideInput
  * family (reference: scio-core/src/main/scala/com/spotify/scio/values/
  * SideInput.scala — asSingleton/asList/asMap/asMultiMap).
  *
  * A side input is by definition materialized: scio ships it to every
  * worker; Spark-first that is `SparkContext.broadcast`. These helpers
  * are the ONLY place graft collects to the driver, and each is
  * guarded by `maxRows` so an accidentally-large frame fails loudly
  * instead of OOMing the driver — at scale, a side bigger than the
  * guard belongs in a `broadcast()` join or [[Joins.hashFilter]],
  * which keep the plan declarative.
  */
object SideInputs {

  private def bounded[T](ds: Dataset[T], maxRows: Int, op: String): Seq[T] = {
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"maxRows must be in [1, ${Int.MaxValue - 1}], got $maxRows")
    val rows = ds.limit(maxRows + 1).collect().toSeq
    require(rows.size <= maxRows,
      s"$op side input exceeds maxRows=$maxRows — use a broadcast join for large sides")
    rows
  }

  /** scio asSingletonSideInput: exactly one row, broadcast. */
  def asSingleton[T: ClassTag](ds: Dataset[T]): Broadcast[T] = {
    val rows = bounded(ds, 2, "asSingleton")
    require(rows.size == 1, s"asSingleton requires exactly one row, got ${rows.size}")
    ds.sparkSession.sparkContext.broadcast(rows.head)
  }

  /** scio asListSideInput: all rows as a broadcast Seq. */
  def asList[T: ClassTag](ds: Dataset[T], maxRows: Int = 1000000): Broadcast[Seq[T]] =
    ds.sparkSession.sparkContext.broadcast(bounded(ds, maxRows, "asList"))

  /** scio asMapSideInput: unique key → single value (duplicate keys
    * are an error, as in scio).
    */
  def asMap[K: ClassTag, V: ClassTag](ds: Dataset[(K, V)], maxRows: Int = 1000000): Broadcast[Map[K, V]] = {
    val rows = bounded(ds, maxRows, "asMap")
    val m = rows.toMap
    require(m.size == rows.size,
      s"asMap requires unique keys (${rows.size - m.size} duplicate(s)) — use asMultiMap")
    ds.sparkSession.sparkContext.broadcast(m)
  }

  /** scio asMultiMapSideInput: key → all values. */
  def asMultiMap[K: ClassTag, V: ClassTag](ds: Dataset[(K, V)], maxRows: Int = 1000000): Broadcast[Map[K, Seq[V]]] =
    ds.sparkSession.sparkContext.broadcast(
      bounded(ds, maxRows, "asMultiMap").groupBy(_._1).map { case (k, kvs) => k -> kvs.map(_._2) })

  /** scio asSetSingletonSideInput: distinct rows as a broadcast Set
    * (membership probes inside closures; for column-level membership
    * prefer a broadcast semi join or [[graft.hash.GraftBloom]]).
    */
  def asSet[T: ClassTag](ds: Dataset[T], maxRows: Int = 1000000): Broadcast[Set[T]] =
    ds.sparkSession.sparkContext.broadcast(bounded(ds.distinct(), maxRows, "asSet").toSet)

  /** Bigger-than-memory side input — scio-extra sparkey's
    * `asLargeMapSideInput`/`largeHashJoin` family (reference:
    * scio-extra/src/main/scala/com/spotify/scio/extra/sparkey/
    * LargeHashSCollectionFunctions.scala, package.scala:281,478 — a
    * DISK-backed map for sides that exceed worker memory). Spark-first
    * that is a sorted+bucketed parquet table ([[graft.sources.Smb]]
    * machinery) written ONCE: every subsequent lookup/join streams the
    * stored side with NO Exchange and NO broadcast — only the probe
    * side moves, and repeated probes amortize the one-time write, the
    * same build-once-probe-many contract as a sparkey file.
    *
    * Unique keys are required (scio's Map semantics); duplicate keys
    * fail the build — use [[asLargeMultiMap]] to keep them.
    */
  def asLargeMap(df: DataFrame, table: String, path: String, keyCols: Seq[String],
                 buckets: Int = 64): LargeMap = {
    val side = build(df, table, path, keyCols, buckets)
    // exchange-free duplicate probe: the groupBy key IS the bucket key
    val dup = side.frame.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"asLargeMap requires unique keys; found duplicate ${dup.headOption.orNull} — " +
        "use asLargeMultiMap to keep multi-valued keys")
    side
  }

  /** [[asLargeMap]] without the unique-key contract — scio's
    * `asLargeMultiMapSideInput`: a key may map to many rows and a
    * lookup returns them all.
    */
  def asLargeMultiMap(df: DataFrame, table: String, path: String, keyCols: Seq[String],
                      buckets: Int = 64): LargeMap =
    build(df, table, path, keyCols, buckets)

  private def build(df: DataFrame, table: String, path: String, keyCols: Seq[String],
                    buckets: Int): LargeMap = {
    require(keyCols.nonEmpty, "asLargeMap needs at least one key column")
    graft.sources.Smb.writeBucketed(df, table, path, buckets, keyCols)
    new LargeMap(df.sparkSession, table, keyCols)
  }
}

/** Handle to a disk-backed large side input written by
  * [[SideInputs.asLargeMap]]: a bucketed+sorted parquet table whose
  * layout every verb reuses — the stored side is never re-shuffled,
  * re-sorted, or broadcast (it is too big to broadcast by premise; the
  * `merge` hint pins the memory-safe sort-merge strategy). Only the
  * probe side shuffles, into the side's own bucket count.
  */
final class LargeMap private[operators] (
    @transient private val spark: SparkSession,
    val table: String, val keyCols: Seq[String]) extends Serializable {

  /** The stored side as a frame (reads the bucketed table). */
  def frame: DataFrame = spark.table(table)

  /** scio largeHashJoin: join `probe` against the stored side on
    * `probeKeys` ↔ the side's key columns.
    */
  def join(probe: DataFrame, probeKeys: Seq[String], how: String = "inner"): DataFrame = {
    require(probeKeys.size == keyCols.size,
      s"probe keys ${probeKeys.mkString(",")} must match side keys ${keyCols.mkString(",")}")
    val side = frame.hint("merge")
    val cond = probeKeys.zip(keyCols)
      .map { case (p, k) => probe(p) === side(k) }.reduce(_ && _)
    probe.join(side, cond, how)
  }

  /** scio largeHashLookup: left join — every probe row survives, side
    * columns null when the key is absent.
    */
  def lookup(probe: DataFrame, probeKeys: Seq[String]): DataFrame =
    join(probe, probeKeys, "left")

  /** scio largeHashIntersectByKey: probe rows whose key IS in the side. */
  def intersectKeys(probe: DataFrame, probeKeys: Seq[String]): DataFrame =
    join(probe, probeKeys, "left_semi")

  /** scio largeHashSubtractByKey: probe rows whose key is NOT in the side. */
  def subtractKeys(probe: DataFrame, probeKeys: Seq[String]): DataFrame =
    join(probe, probeKeys, "left_anti")
}
