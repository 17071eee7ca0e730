package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines:
  * train/valid/test assignment that is a pure function of
  * (seed, key) — stable under repartitioning, re-runs, and corpus
  * growth (a doc keeps its split when new docs arrive), which
  * `randomSplit`'s partition-dependent RNG cannot promise. The split
  * coordinate is the first 32 bits of md5(seed ":" key), compared
  * against pre-computed INTEGER thresholds — no floating point
  * anywhere, so any engine that can md5 reproduces the assignment
  * bit-for-bit (the correctness oracle does exactly that in SQL).
  * One codegen'd hash per row, no shuffle at all.
  */
object Splits {

  private val Span = 1L << 32

  /** Cumulative integer upper bounds on the 32-bit hash space for
    * `splits` (label → positive weight, normalized internally); the
    * last bound is exactly 2^32 so every row is assigned.
    */
  def thresholds(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    cum.dropRight(1).map(c => math.floor(c * Span).toLong) :+ Span
  }

  /** The 32-bit split coordinate: first 8 md5 hex digits of
    * "seed:key" as an unsigned int in [0, 2^32).
    */
  def hashCoordinate(key: Column, seed: String): Column =
    graft.expressions.Md5Head.md5HeadF(
      concat_ws(":", lit(seed), key.cast("string")), 8)

  /** Deterministic shard id in [0, numShards): the export-sharding
    * companion of [[assignSplit]] — same md5 coordinate, so a row's
    * shard never depends on partitioning or corpus size.
    */
  def assignShard(key: Column, numShards: Int, seed: String): Column = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    pmod(hashCoordinate(key, seed), lit(numShards.toLong))
  }

  /** Deterministic EXACT-quota stratified sample: for each stratum,
    * the `n` rows with the smallest [[hashCoordinate]] (ties broken
    * by key) — a uniform sample that is reproducible, exactly sized
    * per stratum (where the stratum has ≥ n rows), and stable under
    * repartitioning, unlike `sampleBy`'s probabilistic quotas. Adds
    * `rank` (1-based within stratum). Scale shape: the rank filter
    * plans as WindowGroupLimit, so each task prunes to its local
    * top-n BEFORE the stratum shuffle — per-stratum traffic is
    * O(n × tasks), not the stratum size.
    */
  def sampleQuota(df: DataFrame, strataCol: String, keyCol: String, n: Int,
                  seed: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains("rank"),
      "input already has a 'rank' column; rename it before sampleQuota")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashCoordinate(col(keyCol), seed), col(keyCol))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** Temperature-weighted domain-mixture resampling — the
    * multi-domain rebalancing rule from multilingual-pretraining data
    * recipes (sample domain d with probability q_d ∝ p_d^alpha where
    * p_d is the domain's corpus share; alpha < 1 flattens the head so
    * small domains are not drowned): given a row budget
    * `targetRows`, each domain keeps rate_d = min(1, q_d·T / c_d),
    * decided PER ROW by the md5 coordinate — deterministic,
    * repartition-stable, and reproducible by any engine with md5.
    * Domains whose rate caps at 1 keep everything; the `epochs`
    * column reports q_d·T / c_d uncapped so a caller that truly wants
    * >1 epoch can replicate downstream.
    *
    * Output: the kept rows plus `rate` and `epochs` (both rounded to
    * 6 dp). Scale shape: one tiny per-domain count agg broadcast back
    * onto the corpus; the keep decision is a codegen'd integer
    * compare, h·10^6 < ⌊rate·10^6⌋·2^32, so NO floating point crosses
    * the row filter — the only double math is per-DOMAIN (counts →
    * rate), quantized to a 10^-6 grid before it touches row fate.
    * alpha = 0.5 computes via sqrt (IEEE correctly-rounded, so the
    * DuckDB oracle reproduces it bit-for-bit); other alphas use pow.
    */
  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-Res over an md5 coordinate): the top-n rows by
    * u^(1/w), u = (md5head(seed:key) + 0.5) / 2^32 ∈ (0,1). Unlike
    * the rand()-seeded syntax verb this is PARTITIONING-INDEPENDENT —
    * the same rows come back on any cluster layout or rerun — and
    * oracle-reproducible. One TakeOrdered, no reservoir state;
    * non-positive/NaN weights are excluded (they would sort above
    * every valid key and hijack the sample); sort keys tie-break by
    * `keyCol` so even coincidental key collisions stay deterministic.
    */
  def sampleWeightedStable(df: DataFrame, keyCol: String, weightCol: String,
                           n: Int, seed: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = col(weightCol).cast("double")
    val u = (graft.expressions.Md5Head.md5HeadF(
      concat_ws(":", lit(seed), col(keyCol).cast("string")), 8).cast("double") + 0.5) /
      4294967296.0
    df.filter(w > 0.0 && !isnan(w))
      .withColumn("__ws_k", pow(u, lit(1.0) / w))
      .orderBy(col("__ws_k").desc, col(keyCol))
      .limit(n)
      .drop("__ws_k")
  }

  def mixtureSample(df: DataFrame, domainCol: String, keyCol: String,
                    targetRows: Long, alpha: Double = 0.5,
                    seed: String = "mix"): DataFrame = {
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
    def tempWeight(p: Column): Column =
      if (alpha == 0.5) sqrt(p) else pow(p, alpha)
    val rates = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__c"))
      .withColumn("__p", col("__c") / sum(col("__c")).over(all))
      .withColumn("__w", tempWeight(col("__p")))
      .withColumn("__q", col("__w") / sum(col("__w")).over(all))
      .withColumn("__epochs", col("__q") * targetRows / col("__c"))
      .withColumn("__rate", least(lit(1.0), col("__epochs")))
      .select(col(domainCol), col("__rate"), col("__epochs"))
    val h = hashCoordinate(col(keyCol), seed)
    // null-safe join: a null domain is its own stratum (the count agg
    // already groups it); a plain equi-join would silently drop those
    // rows while still counting them into the rate denominators
    val ratesR = rates.withColumnRenamed(domainCol, "__dom")
    df.join(broadcast(ratesR), col(domainCol) <=> col("__dom"))
      .drop("__dom")
      .filter(h * lit(1000000L) < floor(col("__rate") * 1e6).cast("long") * lit(Span))
      .withColumn("rate", round(col("__rate"), 6))
      .withColumn("epochs", round(col("__epochs"), 6))
      .drop("__rate", "__epochs")
  }

  /** Seeded deterministic global training-order shuffle: adds `outCol`
    * = this row's dense position in 0..n-1 when the corpus is ordered
    * by (md5(seed:key), key) — the per-epoch example shuffle a training
    * export needs, reproducible across re-runs and repartitionings
    * (`orderBy(rand())` is neither). A new seed per epoch gives an
    * independent permutation.
    *
    * Scale shape (never a single-partition global window): the 60-bit
    * md5 coordinate is uniform in [0, 2^60) BY CONSTRUCTION, so rows
    * range-bucket evenly with no sampling/probe pass; per-bucket counts
    * (map-side partial agg, `numBuckets` rows to the driver) become
    * exclusive prefix offsets broadcast back; one balanced shuffle by
    * bucket, a per-bucket row_number adds the offset. Hash collisions
    * tie-break on the key itself, so the order is total; `keyCol` must
    * be unique and non-null (validated in the same counts pass —
    * duplicates/nulls would make the permutation nondeterministic).
    */
  def epochOrder(df: DataFrame, keyCol: String, seed: String,
                 outCol: String = "ord", numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    import org.apache.spark.sql.expressions.Window
    val h = graft.expressions.Md5Head.md5HeadF(
      concat_ws(":", lit(seed), col(keyCol).cast("string")), 15)
    val span = 1L << 60
    val width = math.max(span / numBuckets, 1L)
    val bucket = least(floor(h / lit(width)), lit(numBuckets - 1L)).cast("long")
    val withB = df.withColumn("__eo_h", h).withColumn("__eo_bucket", bucket)
    // one probe pass, numBuckets rows to the driver: bucket counts for
    // the prefix offsets AND the key-contract checks (a key always
    // lands in its own bucket, so per-bucket distinct sums see every
    // global duplicate)
    val stats = withB.groupBy(col("__eo_bucket"))
      .agg(count(lit(1)).as("__n"), countDistinct(col(keyCol)).as("__nd"),
        count(when(col(keyCol).isNull, 1)).as("__nn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nNull = stats.map(_._4).sum
    require(nNull == 0,
      s"keyCol '$keyCol' has $nNull null values; the shuffle order is undefined for them")
    val dupes = stats.map(s => s._2 - s._3).sum
    require(dupes == 0,
      s"keyCol '$keyCol' has $dupes duplicate values; epochOrder needs a unique key")
    val prefixes = stats.map(s => (s._1, s._2))
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offsets = broadcast(
      df.sparkSession.createDataFrame(prefixes).toDF("__eo_bucket", "__eo_off"))
    val w = Window.partitionBy(col("__eo_bucket")).orderBy(col("__eo_h"), col(keyCol))
    withB.join(offsets, Seq("__eo_bucket"))
      .withColumn(outCol, col("__eo_off") + row_number().over(w).cast("long") - 1L)
      .drop("__eo_bucket", "__eo_h", "__eo_off")
  }

  /** Adds `outCol` with the split label for each row: the label whose
    * [[thresholds]] interval contains [[hashCoordinate]](key, seed).
    */
  def assignSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                  seed: String, outCol: String = "split"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val h = hashCoordinate(col(keyCol), seed)
    val bounds = thresholds(splits)
    val labeled = splits.map(_._1).zip(bounds).dropRight(1)
      .foldLeft(when(lit(false), lit(""))) { case (c, (label, hi)) =>
        c.when(h < hi, label)
      }
      .otherwise(splits.last._1)
    df.withColumn(outCol, labeled)
  }
}
