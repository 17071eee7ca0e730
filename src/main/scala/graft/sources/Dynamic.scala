package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Dynamic per-record write destinations (reference:
  * scio-core/src/main/scala/com/spotify/scio/io/dynamic/syntax/
  * SCollectionSyntax.scala:54 `saveAsDynamicTextFile` — the output
  * path is a function of record CONTENT, not a static sink path).
  * Spark's `partitionBy` covers the `col=value` layout only; this
  * writes arbitrary relative destinations (`logs/2024/01/`,
  * `tenant-x/`, …) the way Beam's `FileIO.writeDynamic` does.
  *
  * Execution shape, chosen for 100 TB:
  *  - one shuffle: repartition by (dest, salt) — co-locates each
  *    destination into one task (`fanout` salts spread a hot
  *    destination over several);
  *  - sortWithinPartitions(dest): destinations arrive CONTIGUOUSLY,
  *    so exactly ONE output stream is open per task at any moment —
  *    no per-destination writer map to blow the heap at high
  *    destination cardinality (the classic dynamic-write OOM);
  *  - executor-side Hadoop FileSystem writes (local/HDFS/object
  *    store), file name keyed by the shuffle partition id only —
  *    a retried task overwrites its own files, so the output is
  *    idempotent without a commit protocol. (Trade-off vs a rename
  *    commit: a concurrent reader can observe a partial file
  *    mid-job; don't read the tree until the action returns.)
  */
object Dynamic {

  /** Forbid path escapes before anything touches the filesystem: a
    * record must not be able to write outside `basePath`.
    */
  private def validateDest(dest: String): String = {
    require(dest != null && dest.nonEmpty,
      "dynamic destination is null/empty — coalesce a default upstream")
    require(!dest.startsWith("/") && !dest.contains(".."),
      s"dynamic destination '$dest' must be relative and must not contain '..'")
    dest
  }

  /** Write `textCol` lines of each row into
    * `basePath/<destCol>/part-NNNNN.txt`, destination taken from the
    * row. Nested destinations (`a/b/c`) are allowed; absolute paths
    * and `..` are rejected. Null text writes an empty line (the row
    * still counts — same as writing its empty string).
    */
  def saveAsDynamicText(df: DataFrame, basePath: String, destCol: String, textCol: String,
                        fanout: Int = 1): Unit = {
    require(fanout >= 1, s"fanout must be >= 1, got $fanout")
    val prepared = df
      .select(col(destCol).cast("string").as("__dest"),
        coalesce(col(textCol).cast("string"), lit("")).as("__text"))
      .withColumn("__salt",
        if (fanout == 1) lit(0) else pmod(hash(col("__text")), lit(fanout)))
      .repartition(col("__dest"), col("__salt"))
      .sortWithinPartitions(col("__dest"))
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      // executor-side FS handle: picks up the cluster's core-site.xml
      // from the executor classpath, same as every Hadoop output format
      val conf = new Configuration()
      val base = new Path(basePath)
      val fs = FileSystem.get(base.toUri, conf)
      val pid = TaskContext.get().partitionId()
      var currentDest: String = null
      var out: BufferedWriter = null
      def close(): Unit = if (out != null) { out.close(); out = null }
      try {
        rows.foreach { r =>
          val dest = validateDest(r.getString(0))
          if (dest != currentDest) {
            close()
            val file = new Path(base, f"$dest%s/part-$pid%05d.txt")
            out = new BufferedWriter(new OutputStreamWriter(
              fs.create(file, true), StandardCharsets.UTF_8))
            currentDest = dest
          }
          out.write(r.getString(1)); out.write('\n')
        }
      } finally close()
    }
  }
}
