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
  *    store) through a per-file rename commit: each destination file
  *    is written as a dot-prefixed temp named by the task ATTEMPT and
  *    renamed to `part-<partition>.txt` only on a clean stream close.
  *    A failed attempt leaves only hidden dot-temps (ignored by Hadoop
  *    globbing); under speculative execution the first attempt to
  *    finish a file wins the rename and the loser deletes its temp —
  *    the committed tree is always whole files.
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
  /** Stamped at the tree root by every completed write: marks the
    * directory as graft-dynamic OUTPUT, so the pre-write wipe below
    * can tell "stale run of this sink" from "directory that holds
    * someone's unrelated data".
    */
  private val Marker = "_GRAFT_DYNAMIC"

  def saveAsDynamicText(df: DataFrame, basePath: String, destCol: String, textCol: String,
                        fanout: Int = 1, overwriteForeign: Boolean = false): Unit = {
    require(fanout >= 1, s"fanout must be >= 1, got $fanout")
    // fresh output tree (same contract as Avro/TfRecord write): with a
    // per-file rename commit, a pre-existing final from an older run
    // would win every rename and pin stale data. Guarded: refuse to
    // recursively wipe a non-empty tree this sink didn't write (no
    // marker) unless the caller explicitly opts in — a typo'd basePath
    // must not silently erase unrelated data.
    val fs = locally {
      val base = new Path(basePath)
      require(basePath.trim.nonEmpty && base.depth() >= 1,
        s"refusing to write a dynamic tree at '$basePath' (empty or filesystem root)")
      val fs = FileSystem.get(base.toUri,
        df.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(base)) {
        val contents = fs.listStatus(base)
        // hidden (dot/underscore) entries are Hadoop-invisible — a
        // failed attempt's dot-temps must not lock out the retry
        val visible = contents.filterNot { s =>
          val n = s.getPath.getName; n.startsWith(".") || n.startsWith("_")
        }
        val ours = visible.isEmpty || contents.exists(_.getPath.getName == Marker)
        require(ours || overwriteForeign,
          s"$basePath exists with ${visible.length} entries and no $Marker stamp — it was " +
            "not written by this sink; pass overwriteForeign=true to wipe it anyway")
        fs.delete(base, true)
      }
      fs.mkdirs(base)
      // stamp the marker BEFORE writing, not only after: a run that dies
      // mid-write must leave a tree the retry still recognizes as this
      // sink's own output (else the foreign-directory guard above locks
      // out unattended retries and forces overwriteForeign=true)
      fs.create(new Path(base, Marker), true).close()
      fs
    }
    // salt on a per-ROW spread value, not record content: a hot
    // destination whose rows all carry the same text would collapse
    // onto one salt if the salt hashed the payload. partition id +
    // in-partition offset is unique per row (uniform spread) and
    // deterministic for a given upstream partitioning, so a retried
    // stage re-salts identically.
    val prepared = df
      .select(col(destCol).cast("string").as("__dest"),
        coalesce(col(textCol).cast("string"), lit("")).as("__text"))
      .withColumn("__salt",
        if (fanout == 1) lit(0)
        else pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(fanout)))
      .repartition(col("__dest"), col("__salt"))
      .sortWithinPartitions(col("__dest"))
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      // executor-side FS handle: picks up the cluster's core-site.xml
      // from the executor classpath, same as every Hadoop output format
      val conf = new Configuration()
      val base = new Path(basePath)
      val fs = FileSystem.get(base.toUri, conf)
      val ctx = TaskContext.get()
      val pid = ctx.partitionId()
      val attempt = ctx.taskAttemptId()
      var currentDest: String = null
      var out: BufferedWriter = null
      var tempFile: Path = null
      var finalFile: Path = null
      // rename commit: the rename only happens after a clean close, so
      // finals are always whole files. A losing speculative attempt's
      // rename fails against the winner's file; drop the temp.
      def commit(): Unit = if (out != null) {
        out.close(); out = null
        if (!fs.rename(tempFile, finalFile)) fs.delete(tempFile, false)
      }
      def abort(): Unit = if (out != null) {
        out.close(); out = null
        fs.delete(tempFile, false)
      }
      try {
        rows.foreach { r =>
          val dest = validateDest(r.getString(0))
          if (dest != currentDest) {
            commit()
            finalFile = new Path(base, f"$dest%s/part-$pid%05d.txt")
            tempFile = new Path(base, f"$dest%s/.part-$pid%05d.attempt-$attempt%d")
            out = new BufferedWriter(new OutputStreamWriter(
              fs.create(tempFile, true), StandardCharsets.UTF_8))
            currentDest = dest
          }
          out.write(r.getString(1)); out.write('\n')
        }
        commit()
      } catch { case t: Throwable => abort(); throw t }
    }
    // re-stamp at completion: the write succeeded end-to-end (the
    // pre-write stamp above already guarantees retry recognition)
    fs.create(new Path(basePath, Marker), true).close()
  }
}
