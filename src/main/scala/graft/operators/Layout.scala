package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning at lake scale —
  * Z-order (Morton-curve) clustering, the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`: rows close on the curve are
  * close in EVERY listed dimension, so parquet footer min/max ranges
  * per file stay narrow in all of them and point/range predicates on
  * any dimension skip most files. (The reference has no layout
  * optimizer — scio delegates file layout to the sink — but a 100 TB
  * lake lives or dies by it; graft treats it as a first-class
  * operator.)
  *
  * Scale shape: per-dimension bucket boundaries come from ONE driver
  * `approxQuantile` pass (sampled sketch, bounded size 2^bits); rank
  * lookup is a broadcast boundary array folded per row (single-pass
  * HOF per the §4 rule — 2^bits ≤ 256 adds); the z-value is a pure
  * integer bit-interleave (codegen); the final placement is
  * `repartitionByRange(zvalue)` + in-partition sort — one balanced
  * range shuffle, exactly what a sorted write costs anyway.
  */
object Layout {

  /** Morton interleave of per-dimension bucket ids: bit j of dim i
    * lands at position j * nDims + i.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val nDims = buckets.size
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * nDims + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Bucket id in [0, 2^bits) for `c` given sorted inner boundaries
    * (length 2^bits - 1): the count of boundaries ≤ value. Nulls sort
    * to bucket 0 (they carry no range information).
    */
  private def bucketOf(c: Column, boundaries: Array[Double], bits: Int): Column = {
    val arr = array(boundaries.map(lit(_)): _*)
    val folded = aggregate(arr, lit(0L),
      (acc, b) => acc + when(c.isNotNull && c.cast("double") >= b, 1L).otherwise(0L))
    least(folded, lit((1L << bits) - 1))
  }

  /** Hilbert index of a 2-D cell — the classic xy→d walk (one
    * quadrant-rotation step per bit, most significant first),
    * expressed as a single-pass fold with (x, y, d) struct state.
    * Hilbert beats Morton on locality: successive curve positions are
    * always ADJACENT cells (Morton jumps at quadrant boundaries), so
    * range-partition cuts produce tighter per-file bounding boxes.
    */
  private[operators] def hilbertIndex(xb: Column, yb: Column, bits: Int): Column = {
    val svals = (0 until bits).reverse.map(1L << _)
    aggregate(
      array(svals.map(lit(_)): _*),
      struct(xb.cast("long").as("x"), yb.cast("long").as("y"), lit(0L).as("d")),
      (acc, s) => {
        val rx = when(acc("x").bitwiseAND(s) > 0, 1L).otherwise(0L)
        val ry = when(acc("y").bitwiseAND(s) > 0, 1L).otherwise(0L)
        val d2 = acc("d") + s * s * ((lit(3L) * rx).bitwiseXOR(ry))
        // rotate quadrant: ry==0 → (maybe flip) then swap x/y
        val fx = when(rx === 1L, s - 1 - acc("x")).otherwise(acc("x"))
        val fy = when(rx === 1L, s - 1 - acc("y")).otherwise(acc("y"))
        struct(
          when(ry === 0L, fy).otherwise(acc("x")).as("x"),
          when(ry === 0L, fx).otherwise(acc("y")).as("y"),
          d2.as("d"))
      },
      acc => acc("d"))
  }

  /** Hilbert-curve variant of [[zorderBy]] (2 dimensions): same
    * quantile bucketing and range shuffle, better per-file bounding
    * boxes from the curve's strict adjacency. Adds `hvalue`.
    */
  def hilbertBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
                numPartitions: Option[Int] = None): DataFrame = {
    require(cols.size == 2, s"hilbertBy is 2-dimensional, got ${cols.size} columns")
    require(bits >= 1 && bits <= 8, s"bits must be in [1, 8], got $bits")
    require(!df.columns.contains("hvalue"),
      "input already has an 'hvalue' column; rename it before hilbertBy")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val doubled = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__hd$i", col(c).cast("double"))
    }
    val boundaries = doubled.stat.approxQuantile(
      cols.indices.map(i => s"__hd$i").toArray, probs, 0.001)
    val buckets = cols.indices.map(i =>
      bucketOf(col(s"__hd$i"), boundaries(i).distinct.sorted, bits))
    val withH = doubled
      .withColumn("hvalue", hilbertIndex(buckets(0), buckets(1), bits))
      .drop(cols.indices.map(i => s"__hd$i"): _*)
    val parted = numPartitions match {
      case Some(n) => withH.repartitionByRange(n, col("hvalue"))
      case None    => withH.repartitionByRange(col("hvalue"))
    }
    parted.sortWithinPartitions(col("hvalue"))
  }

  /** Result of a [[compactParquet]] run: input file census, the file
    * count the byte budget asked for, and what the write produced.
    */
  final case class CompactStats(filesIn: Long, bytesIn: Long,
                                targetFiles: Int, filesOut: Long)

  /** Small-file compaction — the `OPTIMIZE` half of Delta/Iceberg
    * table maintenance (zorderBy/hilbertBy are the `ZORDER BY` half).
    * Streaming sinks and fine-grained ingests leave thousands of tiny
    * parquet files per partition; at lake scale the scan's task-per-
    * file scheduling and footer reads dominate the query. This rewrites
    * a parquet tree into ≈`targetFileBytes`-sized files: ONE balanced
    * shuffle (round-robin, or a range shuffle + in-partition sort when
    * `orderCols` asks the layout to stay clustered for min/max
    * pruning).
    *
    * The output file count comes from the INPUT's actual byte census
    * (Hadoop FS listing — no data pass), so compressed size estimates
    * stay honest: parquet-in to parquet-out re-compresses at ≈1:1.
    * Writes `outputDir` with overwrite semantics; the read of
    * `inputDir` and write commit are the standard Spark jobs, so a
    * failed run leaves the input untouched.
    */
  def compactParquet(spark: SparkSession, inputDir: String, outputDir: String,
                     targetFileBytes: Long = 128L << 20,
                     orderCols: Seq[String] = Nil): CompactStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    // qualify both paths (scheme + working dir resolved) before the
    // self-overwrite check: "file:///data/t" vs "/data/t" or a
    // relative spelling of the same dir must not slip past the guard —
    // overwrite would destroy the input before the lazy read scans it
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String): Path = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inputDir) != qualified(outputDir),
      "compactParquet cannot overwrite its own input; write to a new dir and swap")
    def census(dir: String): (Long, Long) = {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      require(fs.exists(p), s"input dir does not exist: $dir")
      var files = 0L; var bytes = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) {
          files += 1; bytes += f.getLen
        }
      }
      (files, bytes)
    }
    val (filesIn, bytesIn) = census(inputDir)
    require(filesIn > 0, s"no parquet files under $inputDir")
    val nOut = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inputDir)
    val placed =
      if (orderCols.nonEmpty)
        df.repartitionByRange(nOut, orderCols.map(col): _*)
          .sortWithinPartitions(orderCols.map(col): _*)
      else df.repartition(nOut)
    placed.write.mode("overwrite").parquet(outputDir)
    val (filesOut, _) = census(outputDir)
    CompactStats(filesIn, bytesIn, nOut, filesOut)
  }

  /** Per-FILE manifest of a parquet tree: (file, n_rows, min/max per
    * listed column) — the file-skipping audit table for a clustered
    * layout ([[zorderBy]]/[[hilbertBy]]/[[compactParquet]] with
    * orderCols): disjoint per-file ranges mean a range predicate
    * prunes to few files, overlapping ranges mean the clustering
    * degraded and a re-OPTIMIZE is due (the check Delta/Iceberg run
    * off their manifests; plain parquet trees have no manifest, so
    * graft derives one). One distributed scan grouped by
    * `input_file_name()` — file count rows out, no driver listing.
    */
  def fileManifest(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileManifest needs at least one column")
    val df = spark.read.parquet(dir)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Returns `df` with a `zvalue` column and rows range-clustered +
    * sorted by it — write the result out directly and every listed
    * dimension prunes. `cols` must be numeric/date-like (castable to
    * double for quantile ranking); 2-4 dimensions and bits ≤ 8 is the
    * practical envelope (ranks beyond ~256 buckets stop improving
    * file skipping long before they slow the fold).
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               numPartitions: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(cols.size * bits <= 63, s"cols*bits must fit a long: ${cols.size}*$bits")
    require(bits >= 1 && bits <= 8, s"bits must be in [1, 8], got $bits")
    require(!df.columns.contains("zvalue"),
      "input already has a 'zvalue' column; rename it before zorderBy")
    val nBuckets = 1 << bits
    // inner boundaries at the (1/n … (n-1)/n) quantiles; relativeError
    // trades one sketch pass for boundary precision — file skipping is
    // insensitive to boundary jitter at these widths
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val doubled = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zd$i", col(c).cast("double"))
    }
    val boundaries = doubled.stat.approxQuantile(
      cols.indices.map(i => s"__zd$i").toArray, probs, 0.001)
    val buckets = cols.indices.map(i =>
      bucketOf(col(s"__zd$i"), boundaries(i).distinct.sorted, bits))
    val withZ = doubled
      .withColumn("zvalue", interleave(buckets, bits))
      .drop(cols.indices.map(i => s"__zd$i"): _*)
    val parted = numPartitions match {
      case Some(n) => withZ.repartitionByRange(n, col("zvalue"))
      case None    => withZ.repartitionByRange(col("zvalue"))
    }
    parted.sortWithinPartitions(col("zvalue"))
  }
}
