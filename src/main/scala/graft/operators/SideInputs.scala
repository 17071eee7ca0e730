package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

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
}
