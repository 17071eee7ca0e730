package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{FreqItemsAgg, FreqMerge, FreqTopItems, KllMerge, KllQuantiles, KllRank, KllSketchAgg, ThetaCombine, ThetaEstimate, ThetaSketchAgg, TupleEstimates, TupleMerge, TupleSketchAgg, VarOptMerge, VarOptSamples, VarOptSketchAgg}

/** Mergeable distinct-count sketches as PERSISTED, incrementally
  * growable artifacts — the cross-crawl accounting layer of a 100 TB
  * curation pipeline.
  *
  * Reference intent: scio's distinct-count surface is
  * `SCollection.countApproxDistinct` backed by the
  * `ApproxDistinctCounter` estimator SPI (scio-core
  * estimators/ApproxDistinctCounter.scala) with zetasketch HLL++ as
  * the production implementation (scio-extra hll/zetasketch) — chosen
  * precisely because its sketches MERGE, so per-shard results
  * combine without recount. Graft re-expresses that design Spark-first:
  *
  *  - per-group HLL sketches via Spark's codegen'd DataSketches
  *    `hll_sketch_agg` (partial-aggregated map-side like any agg);
  *  - the sketch table saved ONCE as a parquet artifact with a
  *    parameter sidecar (`_GRAFT_SKETCH`), the same
  *    train-once-persist-reuse contract as the MinHash / IVF / BPE
  *    artifacts;
  *  - `extendHllIndex`: a new crawl unions its sketches into the
  *    stored ones per group — historical rows are NEVER re-read
  *    (register-max union is lossless and order-independent, so the
  *    extended artifact equals a from-scratch rebuild, spec-pinned);
  *  - theta sketches ([[graft.expressions.ThetaSketchAgg]]) for the
  *    set-ALGEBRA questions HLL cannot answer without error
  *    amplification: crawl-overlap (intersection), novelty
  *    (difference) — `thetaSetEstimates` joins two sketch tables
  *    full-outer per group and emits union/intersection/difference
  *    estimates from sketch-sized inputs only;
  *  - frequent-items sketches ([[graft.expressions.FreqItemsAgg]])
  *    for ONE-pass heavy-hitter discovery with deterministic bounds
  *    (`frequentItems`);
  *  - KLL quantile sketches ([[graft.expressions.KllSketchAgg]]) for
  *    MERGEABLE percentiles — each crawl sketches itself, the stored
  *    distribution extends without re-scanning history (the
  *    incremental counterpart of `Stats.saveQuantileGrid`).
  *
  *  - VarOpt weighted samples ([[graft.expressions.VarOptSketchAgg]])
  *    — a bounded MERGEABLE representative sample (k items, HT
  *    weights) that extends as crawls land, where scio's A-Res
  *    `sampleWeighted` draw cannot be combined after the fact;
  *  - Sum-mode tuple sketches ([[graft.expressions.TupleSketchAgg]])
  *    — aggregation over DISTINCT keys ("revenue per distinct
  *    customer") without deduplicating the stream first.
  *
  * All six kinds share one artifact contract via
  * `saveIndex(kind = "hll" | "theta" | "freq" | "kll" | "varopt" |
  * "tuple")`; the sidecar's `lgK` slot carries each kind's size
  * parameter (hll lgConfigK, theta/tuple lgK, freq log2(maxMapSize),
  * kll k, varopt k), and `weightCol` is non-empty for varopt (the
  * sampling weight) and tuple (the summed value).
  *
  * Everything here moves sketches (≤ ~1 MB), never rows: build is one
  * shuffle of partial sketches per side; set ops join tables whose
  * row count is the number of GROUPS.
  */
object Sketches {

  final case class SketchIndexParams(kind: String, lgK: Int, valueCol: String,
                                     groupCols: Seq[String], weightCol: String = "")

  private val Meta = "_GRAFT_SKETCH"

  // ---------------------------------------------------------------
  // build

  /** Per-group HLL sketch table: groupCols* + `sketch` binary.
    * No groupCols → one global row (group key `_global` omitted).
    */
  def hllSketches(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"hll lgConfigK must be in [4,21], got $lgK")
    val agg = hll_sketch_agg(col(valueCol), lgK).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Per-group theta sketch table: groupCols* + `sketch` binary. */
  def thetaSketches(df: DataFrame, valueCol: String, groupCols: Seq[String],
                    lgK: Int = 14): DataFrame = {
    val agg = ThetaSketchAgg.thetaAggF(col(valueCol), lgK).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Per-group frequent-items sketch table: groupCols* + `sketch`.
    * maxMapSize must be a power of 2; exact while distinct keys per
    * group stay under ~75% of it.
    */
  def freqSketches(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   maxMapSize: Int = 1 << 12): DataFrame = {
    val agg = FreqItemsAgg.freqAggF(col(valueCol), maxMapSize).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** ONE-pass heavy hitters: per group, the items whose frequency
    * estimate meets `threshold`, with the sketch's deterministic
    * bounds (lb ≤ true ≤ ub). Unlike the CMS two-pass heavyHitters
    * (sketch prefilter + exact recount), this never re-reads the
    * data — the discovery and the counts come from the same pass,
    * which is the only option when the source is a stream or a
    * crawl you won't scan twice. Exact (and then identical to the
    * exact groupBy-HAVING answer) while the per-group sketch never
    * purges.
    */
  def frequentItems(df: DataFrame, valueCol: String, groupCols: Seq[String],
                    threshold: Long, maxMapSize: Int = 1 << 12,
                    noFalsePositives: Boolean = true): DataFrame = {
    val sk = freqSketches(df, valueCol, groupCols, maxMapSize)
    sk.select(groupCols.map(col) :+
        explode(FreqTopItems.freqTopItemsF(col("sketch"), threshold, noFalsePositives))
          .as("hit"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("hit.item").as("item"), col("hit.est").as("est"),
        col("hit.lb").as("lb"), col("hit.ub").as("ub")): _*)
  }

  /** Per-group KLL quantile sketch table: groupCols* + `sketch`. */
  def kllSketches(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Int = 200): DataFrame = {
    val agg = KllSketchAgg.kllAggF(col(valueCol), k).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Append per-prob quantile columns (`p50`, `p99`, …; prob 0.5 →
    * "p50", 0.995 → "p99_5") to a KLL sketch table — the read side of
    * a persisted quantile artifact.
    */
  def withQuantiles(sketchTable: DataFrame, probs: Seq[Double]): DataFrame = {
    val qs = KllQuantiles.kllQuantilesF(col("sketch"), probs)
    val named = probs.zipWithIndex.map { case (p, i) =>
      val label = "p" + (BigDecimal(p) * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace(".", "_")
      element_at(col("_q"), i + 1).as(label)
    }
    sketchTable.withColumn("_q", qs)
      .select(sketchTable.columns.map(col).toSeq ++ named: _*)
      .drop("_q")
  }

  /** Percentile rank of each row's `valueCol` against a KLL sketch
    * table's distribution for its group — calibration against a
    * persisted (possibly extended) corpus distribution. Sketch-sized
    * broadcast join, then a pure projection.
    */
  def kllRank(df: DataFrame, valueCol: String, sketchTable: DataFrame,
              groupCols: Seq[String], outCol: String = "pct_rank"): DataFrame = {
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(sketchTable))
      else df.join(broadcast(sketchTable), groupCols, "left")
    joined.withColumn(outCol,
        KllRank.kllRankF(col("sketch"), col(valueCol).cast("double")))
      .drop("sketch")
  }

  /** Per-group VarOpt weighted-sample sketch table: groupCols* +
    * `sketch`. Items render to string; weights must be positive
    * doubles (zero/negative/NaN rows are skipped).
    */
  def varoptSketches(df: DataFrame, itemCol: String, weightCol: String,
                     groupCols: Seq[String], k: Int): DataFrame = {
    val agg = VarOptSketchAgg.varoptAggF(
      col(itemCol).cast("string"), col(weightCol).cast("double"), k).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Per-group bounded weighted sample: one row per retained item with
    * its Horvitz-Thompson adjusted weight (subset-sum estimates over
    * these rows are unbiased; the whole-group sum is exact). With
    * n ≤ k per group this IS the input.
    */
  def weightedSample(df: DataFrame, itemCol: String, weightCol: String,
                     groupCols: Seq[String], k: Int): DataFrame = {
    val sk = varoptSketches(df, itemCol, weightCol, groupCols, k)
    sk.select(groupCols.map(col) :+
        explode(VarOptSamples.varoptSamplesF(col("sketch"))).as("s"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("s.item").as("item"), col("s.weight").as("weight")): _*)
  }

  /** Per-group Sum-mode tuple sketch table: groupCols* + `sketch`
    * over (keyCol, valueCol) — aggregation over DISTINCT keys.
    */
  def tupleSketches(df: DataFrame, keyCol: String, valueCol: String,
                    groupCols: Seq[String], lgK: Int = 14): DataFrame = {
    val agg = TupleSketchAgg.tupleAggF(
      col(keyCol), col(valueCol).cast("double"), lgK).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Per-group (distinct_est, value_est) read off a tuple sketch
    * table: distinct keys and the per-distinct-key value sum — exact
    * while the sketch never sampled.
    */
  def distinctValueEstimates(sketchTable: DataFrame): DataFrame =
    sketchTable
      .withColumn("_e", TupleEstimates.tupleEstimatesF(col("sketch")))
      .withColumn("distinct_est", col("_e.distinct_est"))
      .withColumn("value_est", col("_e.value_est"))
      .drop("_e")

  /** Append a `distinct_est` column to a sketch table (either kind). */
  def withEstimate(sketchTable: DataFrame, kind: String): DataFrame = kind match {
    case "hll" =>
      sketchTable.withColumn("distinct_est", hll_sketch_estimate(col("sketch")))
    case "theta" =>
      sketchTable.withColumn("distinct_est", ThetaEstimate.thetaEstimateF(col("sketch")))
    case other => throw new IllegalArgumentException(s"unknown sketch kind '$other'")
  }

  // ---------------------------------------------------------------
  // artifact

  /** Build and persist a sketch index: parquet sketch table + param
    * sidecar. `kind` ∈ {hll, theta}.
    */
  def saveIndex(df: DataFrame, valueCol: String, groupCols: Seq[String],
                path: String, kind: String = "hll", lgK: Int = 12,
                weightCol: String = ""): Unit = {
    val table = kind match {
      case "hll" => hllSketches(df, valueCol, groupCols, lgK)
      case "theta" => thetaSketches(df, valueCol, groupCols, lgK)
      case "freq" => freqSketches(df, valueCol, groupCols, 1 << lgK)
      case "kll" => kllSketches(df, valueCol, groupCols, lgK)
      case "varopt" =>
        require(weightCol.nonEmpty, "varopt index needs weightCol")
        varoptSketches(df, valueCol, weightCol, groupCols, lgK)
      case "tuple" =>
        require(weightCol.nonEmpty, "tuple index needs weightCol (the summed value)")
        tupleSketches(df, valueCol, weightCol, groupCols, lgK)
      case other => throw new IllegalArgumentException(s"unknown sketch kind '$other'")
    }
    table.write.mode("overwrite").parquet(s"$path/sketches")
    writeMeta(df.sparkSession, path,
      SketchIndexParams(kind, lgK, valueCol, groupCols, weightCol))
  }

  private def writeMeta(spark: SparkSession, path: String,
                        p: SketchIndexParams): Unit = {
    val meta = new org.apache.hadoop.fs.Path(s"$path/$Meta")
    val fs = org.apache.hadoop.fs.FileSystem.get(meta.toUri,
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(meta, true)
    val groups = p.groupCols.map(g => s""""$g"""").mkString(",")
    out.write(
      (s"""{"kind":"${p.kind}","lgK":${p.lgK},"valueCol":"${p.valueCol}",""" +
        s""""weightCol":"${p.weightCol}","groupCols":[$groups]}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Read back an index's parameter sidecar (loud failure when absent —
    * the directory is not a sketch artifact).
    */
  def loadIndexParams(spark: SparkSession, path: String): SketchIndexParams = {
    val meta = new org.apache.hadoop.fs.Path(s"$path/$Meta")
    val fs = org.apache.hadoop.fs.FileSystem.get(meta.toUri,
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(meta), s"$path is not a graft sketch index (no $Meta sidecar)")
    val in = fs.open(meta)
    val raw = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    def str(name: String): String = {
      val m = s""""$name"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(raw)
      require(m.isDefined, s"malformed $Meta sidecar at $path: $raw")
      m.get.group(1)
    }
    val lgK = {
      val m = """"lgK"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
      require(m.isDefined, s"malformed $Meta sidecar at $path: $raw")
      m.get.group(1).toInt
    }
    val groups = {
      val m = """"groupCols"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(raw)
      require(m.isDefined, s"malformed $Meta sidecar at $path: $raw")
      """"([^"]*)"""".r.findAllMatchIn(m.get.group(1)).map(_.group(1)).toSeq
    }
    // weightCol is absent in pre-varopt sidecars → ""
    val weight = """"weightCol"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(raw)
      .map(_.group(1)).getOrElse("")
    SketchIndexParams(str("kind"), lgK, str("valueCol"), groups, weight)
  }

  /** The stored sketch table. */
  def loadIndex(spark: SparkSession, path: String): DataFrame = {
    loadIndexParams(spark, path) // sidecar validation
    spark.read.parquet(s"$path/sketches")
  }

  /** Merge two sketch tables of the SAME params per group (full outer
    * on the group keys; a group absent from one side contributes the
    * empty set).
    */
  private def unionTables(kind: String, lgK: Int, groupCols: Seq[String],
                          a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.withColumnRenamed("sketch", "sk_a")
    val bb = b.withColumnRenamed("sketch", "sk_b")
    val joined =
      if (groupCols.isEmpty) aa.crossJoin(bb) // both single-row global sketches
      else aa.join(bb, groupCols, "full_outer")
    val merged = kind match {
      case "hll" =>
        // hll_union is null-intolerant; coalesce an absent side to the
        // present one (register-max with one side = that side)
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(hll_union(col("sk_a"), col("sk_b")))
      case "theta" => ThetaCombine.thetaUnionF(col("sk_a"), col("sk_b"))
      case "freq" =>
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(FreqMerge.freqMergeF(col("sk_a"), col("sk_b")))
      case "kll" =>
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(KllMerge.kllMergeF(col("sk_a"), col("sk_b")))
      case "varopt" =>
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(VarOptMerge.varoptMergeF(col("sk_a"), col("sk_b")))
      case "tuple" =>
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(TupleMerge.tupleMergeF(col("sk_a"), col("sk_b"), lgK))
      case other => throw new IllegalArgumentException(s"unknown sketch kind '$other'")
    }
    joined.select(groupCols.map(col) :+ merged.as("sketch"): _*)
  }

  /** Grow a persisted sketch index with a new crawl WITHOUT re-reading
    * any historical rows: the new crawl sketches itself, the stored
    * sketches union in as-is (register-max / set union — lossless and
    * order-independent, so extended == from-scratch, spec-pinned).
    * Writes a complete artifact at `outPath` (must differ from
    * `indexPath` — an in-place rewrite of a lazily-read source would
    * destroy the only copy on failure).
    */
  def extendIndex(newDf: DataFrame, indexPath: String, outPath: String): Unit = {
    val spark = newDf.sparkSession
    require(new org.apache.hadoop.fs.Path(outPath).toUri.normalize !=
      new org.apache.hadoop.fs.Path(indexPath).toUri.normalize,
      s"extendIndex cannot rewrite an index in place; write to a new path ($indexPath)")
    val p = loadIndexParams(spark, indexPath)
    val old = spark.read.parquet(s"$indexPath/sketches")
    val fresh = p.kind match {
      case "hll" => hllSketches(newDf, p.valueCol, p.groupCols, p.lgK)
      case "theta" => thetaSketches(newDf, p.valueCol, p.groupCols, p.lgK)
      case "freq" => freqSketches(newDf, p.valueCol, p.groupCols, 1 << p.lgK)
      case "kll" => kllSketches(newDf, p.valueCol, p.groupCols, p.lgK)
      case "tuple" => tupleSketches(newDf, p.valueCol, p.weightCol, p.groupCols, p.lgK)
      case _ => varoptSketches(newDf, p.valueCol, p.weightCol, p.groupCols, p.lgK)
    }
    unionTables(p.kind, p.lgK, p.groupCols, old, fresh)
      .write.mode("overwrite").parquet(s"$outPath/sketches")
    writeMeta(spark, outPath, p)
  }

  // ---------------------------------------------------------------
  // set algebra (theta)

  /** Per-group set-operation estimates between two theta sketch
    * tables: est_a, est_b, est_union, est_intersection, est_a_only,
    * est_b_only (+ ±2σ bounds on the intersection — the op whose
    * error users must see). Inputs are sketch tables from
    * [[thetaSketches]] with the SAME lgK and group columns; groups
    * absent from one side count as empty. Join traffic is
    * groups × sketch bytes — never rows.
    */
  def thetaSetEstimates(a: DataFrame, b: DataFrame,
                        groupCols: Seq[String]): DataFrame = {
    val aa = a.withColumnRenamed("sketch", "sk_a")
    val bb = b.withColumnRenamed("sketch", "sk_b")
    val joined =
      if (groupCols.isEmpty) aa.crossJoin(bb)
      else aa.join(bb, groupCols, "full_outer")
    // a side's sketch column is null for groups it never saw — that is
    // the empty set (estimate 0), matching the combine null contract
    val est = (c: Column) =>
      coalesce(ThetaEstimate.thetaEstimateF(c), lit(0.0))
    val inter = ThetaCombine.thetaIntersectF(col("sk_a"), col("sk_b"))
    joined.select(groupCols.map(col) ++ Seq(
      est(col("sk_a")).as("est_a"),
      est(col("sk_b")).as("est_b"),
      est(ThetaCombine.thetaUnionF(col("sk_a"), col("sk_b"))).as("est_union"),
      est(inter).as("est_intersection"),
      est(ThetaCombine.thetaANotBF(col("sk_a"), col("sk_b"))).as("est_a_only"),
      est(ThetaCombine.thetaANotBF(col("sk_b"), col("sk_a"))).as("est_b_only")): _*)
  }

  /** One-row corpus-overlap summary between two frames: distinct
    * counts per side, union, intersection, difference, and the
    * containment/Jaccard ratios curation planning reads ("how much of
    * crawl B is already in A?"). Exact when lgK exceeds the true
    * distinct cardinality (theta exact mode).
    */
  def overlap(a: DataFrame, b: DataFrame, valueCol: String,
              lgK: Int = 20): DataFrame = {
    val sa = thetaSketches(a, valueCol, Seq.empty, lgK)
    val sb = thetaSketches(b, valueCol, Seq.empty, lgK)
    thetaSetEstimates(sa, sb, Seq.empty)
      .withColumn("jaccard",
        when(col("est_union") > 0, col("est_intersection") / col("est_union"))
          .otherwise(lit(0.0)))
      .withColumn("containment_b_in_a",
        when(col("est_b") > 0, col("est_intersection") / col("est_b"))
          .otherwise(lit(0.0)))
  }
}
