package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Hadoop-conf broadcast bridge for executor-side FileSystem access
  * (graft's dynamic-path readers). `SerializableConfiguration` is
  * `private[spark]`, yet it is the one supported way to ship the
  * session's Hadoop conf to tasks (a bare `Configuration` is not
  * serializable); every Spark connector does exactly this from inside
  * the spark namespace. Like sql.graft.ColumnBridge, this file only
  * delegates — no behavior lives here.
  */
object ConfBridge {
  def broadcastHadoopConf(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def confOf(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
