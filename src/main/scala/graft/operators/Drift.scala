package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two corpus snapshots — the
  * check a continuously-fed training pipeline runs before admitting a
  * new feed (did the length / score / value distribution move?).
  * scio users assemble this from histogram + aggregate (reference:
  * scio-core values/DoubleSCollectionFunctions.scala histogram);
  * graft ships the standard PSI form as one operator.
  *
  * Population Stability Index over `nBuckets` equi-probable buckets
  * of the REFERENCE distribution (exact interpolated quantiles, so
  * any engine reproduces the boundaries): PSI = Σ (p_cur − p_ref) ·
  * ln(p_cur / p_ref), probabilities floored at 1e-6 so empty buckets
  * contribute a large-but-finite penalty. Conventional reading:
  * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Scale shape: one exact-percentile agg on the reference (single
  * aggregation, no sort of the full data), boundaries broadcast via a
  * 1-row cross join, per-row bucket id = a ≤nBuckets-add fold, one
  * partial-agg count per side, and a tiny nBuckets-row join for the
  * final arithmetic. Neither snapshot is ever collected or sorted.
  */
object Drift {

  /** Per-bucket drift rows: (bucket, n_ref, n_cur, p_ref, p_cur,
    * contrib) with probabilities and contributions rounded to 6 dp;
    * sum(contrib) is the PSI.
    */
  def psiBuckets(ref: DataFrame, cur: DataFrame, colName: String,
                 nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // DISCRETE quantile edges (actual data values), not interpolated:
    // an interpolated edge is floating-point ARITHMETIC whose last ulp
    // differs across engines, and at scale whole duplicate-groups sit
    // exactly on an edge — at sf10 a one-ulp edge difference moved 100
    // replicated rows between buckets. A discrete edge is a SELECTED
    // value: selection is exact, so bucket assignment is deterministic
    // in any engine.
    val boundsRow = ref.agg(
      array(probs.map(p => expr(
        s"percentile_disc($p) WITHIN GROUP (ORDER BY `$colName`)")): _*).as("__bounds"))
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(colName).cast("double").as("__v"))
        .filter(col("__v").isNotNull && !isnan(col("__v")))
        .crossJoin(broadcast(boundsRow))
        .select(aggregate(col("__bounds"), lit(0),
          (acc, b) => acc + when(col("__v") >= b, 1).otherwise(0)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val r = bucketed(ref).withColumnRenamed("n", "n_ref")
    val c = bucketed(cur).select(col("bucket").as("__b2"), col("n").as("n_cur"))
    // all nBuckets rows exist even when a side is empty there
    val all = ref.sparkSession.range(nBuckets).select(col("id").cast("int").as("bucket"))
    val eps = 1e-6
    all
      .join(broadcast(r), Seq("bucket"), "left")
      .join(broadcast(c), col("bucket") === col("__b2"), "left")
      .drop("__b2")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("__tr", sum(col("n_ref")).over())
      .withColumn("__tc", sum(col("n_cur")).over())
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        greatest(col("n_ref") / col("__tr"), lit(eps)).as("__pr"),
        greatest(col("n_cur") / col("__tc"), lit(eps)).as("__pc"))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("__pr"), 6).as("p_ref"), round(col("__pc"), 6).as("p_cur"),
        round((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")), 6)
          .as("contrib"))
      .orderBy(col("bucket"))
  }

  /** The scalar PSI. */
  def psi(ref: DataFrame, cur: DataFrame, colName: String, nBuckets: Int = 10): Double =
    psiBuckets(ref, cur, colName, nBuckets)
      .agg(sum(col("contrib"))).collect()(0).getDouble(0)

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the bucket-free
    * drift test (PSI depends on a bucketing choice; KS is the sup of
    * the empirical-CDF gap and has the classical significance table).
    * Returns one row: (n_ref, n_cur, d_stat, at_value) where d_stat =
    * max_v |F_ref(v) − F_cur(v)| over the pooled support and at_value
    * is the smallest value attaining it (tie-deterministic).
    *
    * Scale shape — never a global sort of the data and never a
    * single-partition window: per-value counts partial-aggregate
    * map-side (support-sized output); the two CDFs are exclusive
    * prefix sums via [[GlobalOrder.withGlobalOffset]]'s balanced
    * bucketed pass; totals ride in as a broadcast 1-row frame. All
    * counts are integers, so cumulative sums are EXACT in any
    * summation order and both engines produce bit-identical CDFs.
    * Null/NaN values carry no order information and are excluded
    * (disclosed, same contract as [[psiBuckets]]).
    */
  def ksStat(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(col(colName).cast("double").as("__v"))
        .filter(col("__v").isNotNull && !isnan(col("__v")))
        .withColumn("__t", lit(tag))
    // support-sized and consumed by ~6 downstream jobs (two prefix-sum
    // probe aggs + bucket collects, the totals agg, the final pass):
    // persist so the union+group shuffle over BOTH corpora runs once
    val counts = side(ref, 0).unionAll(side(cur, 1))
      .groupBy(col("__v"))
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_ref_v"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n_cur_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cdf = GlobalOrder.withGlobalOffset(
      GlobalOrder.withGlobalOffset(counts, "__v", col("n_ref_v"), "__off_ref"),
      "__v", col("n_cur_v"), "__off_cur")
    val totals = broadcast(counts.agg(
      sum(col("n_ref_v")).as("__nr"), sum(col("n_cur_v")).as("__nc")))
    val best = cdf.crossJoin(totals)
      .select(col("__v"), col("__nr"), col("__nc"),
        abs((col("__off_ref") + col("n_ref_v")) / col("__nr") -
          (col("__off_cur") + col("n_cur_v")) / col("__nc")).as("__d"))
      // max d, ties broken to the SMALLEST value: lexicographic struct
      // max on (d, -v) is deterministic under any partitioning
      .agg(max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"),
        max(struct(col("__d"), (-col("__v")).as("__negv"))).as("__best"))
    best.select(col("n_ref"), col("n_cur"),
      col("__best").getField("__d").as("d_stat"),
      (-col("__best").getField("__negv")).as("at_value"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric location
    * test: U_cur counts (ref, cur) pairs where the cur value wins
    * (ties half), computed through midranks; heavy-tailed metrics
    * where Welch's t is unreliable are exactly where monitoring needs
    * this. Same balanced machinery as [[ksStat]]: per-value counts,
    * one bucketed prefix sum over the pooled support, totals
    * broadcast — never a global sort. All rank arithmetic is exact
    * over 2·counts integers (midranks are halves), so both engines
    * agree bit-for-bit; `z` applies the normal approximation with the
    * standard tie-corrected variance (null when either side is empty
    * or every value ties). Output: (n_ref, n_cur, u_cur, z — 6 dp).
    */
  def mannWhitney(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(col(colName).cast("double").as("__v"))
        .filter(col("__v").isNotNull && !isnan(col("__v")))
        .withColumn("__t", lit(tag))
    val counts = side(ref, 0).unionAll(side(cur, 1))
      .groupBy(col("__v"))
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_ref_v"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n_cur_v"))
      .withColumn("__m", col("n_ref_v") + col("n_cur_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted for the prefix-sum probe + totals + final pass, like
    // ksStat (the caller's one action consumes it; Spark evicts LRU)
    val ranked = GlobalOrder.withGlobalOffset(counts, "__v", col("__m"), "__off")
      val totals = broadcast(counts.agg(
        sum(col("n_ref_v")).as("__nr"), sum(col("n_cur_v")).as("__nc"),
        // tie-correction term Σ m·(m²−1) over the support
        sum(col("__m") * (col("__m") * col("__m") - 1)).as("__tiesum")))
      // midrank of value v = off + (m+1)/2; rank sums stay exact as
      // 2×rank integers (every midrank is a half)
      val agg = ranked
        .agg(sum(col("n_cur_v") * (lit(2L) * col("__off") + col("__m") + 1L)).as("__r2cur"))
      agg.crossJoin(totals).select(
        col("__nr").as("n_ref"), col("__nc").as("n_cur"),
        // U_cur = R_cur − n_cur(n_cur+1)/2, with R_cur = __r2cur/2
        (col("__r2cur").cast("double") / 2 -
          col("__nc").cast("double") * (col("__nc") + 1) / 2).as("__u"),
        col("__tiesum"))
        .select(col("n_ref"), col("n_cur"), col("__u").as("u_cur"),
          locally {
            val n = col("n_ref") + col("n_cur")
            val mu = col("n_ref").cast("double") * col("n_cur") / 2
            val varU = col("n_ref").cast("double") * col("n_cur") / 12 *
              ((n + 1) - col("__tiesum").cast("double") / (n * (n - 1)))
            when(col("n_ref") > 0 && col("n_cur") > 0 && varU > 0,
              round((col("__u") - mu) / sqrt(varU), 6))
              .otherwise(lit(null).cast("double")).as("z")
          })
  }

  /** Welch's two-sample t statistic (unequal variances) with the
    * Welch–Satterthwaite degrees of freedom — the mean-shift test an
    * experiment/monitoring readout pairs with the distribution-shape
    * tests above ([[ksStat]] sees shape, this sees location). One
    * count/mean/variance aggregate per side (map-side partial), a
    * 1-row cross join, pure arithmetic after — nothing shuffles.
    * Output: (n_ref, n_cur, mean_ref, mean_cur, t_stat, df), nulls
    * when either side has < 2 rows or both variances are 0 (the
    * statistic is undefined; a monitoring caller treats null as
    * "cannot decide", never as "no drift"). Values rounded to 6 dp.
    */
  def welchT(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    def side(df: DataFrame, tag: String) = df
      .filter(col(colName).isNotNull && !isnan(col(colName).cast("double")))
      .agg(count(lit(1)).as(s"n_$tag"),
        avg(col(colName).cast("double")).as(s"mean_$tag"),
        var_samp(col(colName).cast("double")).as(s"var_$tag"))
    val joined = side(ref, "ref").crossJoin(side(cur, "cur"))
    val se2 = col("var_ref") / col("n_ref") + col("var_cur") / col("n_cur")
    val t = (col("mean_cur") - col("mean_ref")) / sqrt(se2)
    val dfW = (se2 * se2) /
      ((col("var_ref") / col("n_ref")) * (col("var_ref") / col("n_ref")) / (col("n_ref") - 1) +
        (col("var_cur") / col("n_cur")) * (col("var_cur") / col("n_cur")) / (col("n_cur") - 1))
    val defined = col("n_ref") >= 2 && col("n_cur") >= 2 && se2 > 0
    joined.select(col("n_ref"), col("n_cur"),
      round(col("mean_ref"), 6).as("mean_ref"), round(col("mean_cur"), 6).as("mean_cur"),
      when(defined, round(t, 6)).otherwise(lit(null).cast("double")).as("t_stat"),
      when(defined, round(dfW, 6)).otherwise(lit(null).cast("double")).as("df"))
  }

  /** Pearson chi-square statistic between two CATEGORICAL snapshots:
    * Σ over categories of (obs − exp)² / exp where exp scales the
    * reference distribution to the current total — the drift test for
    * label/source/language mixes (PSI's cousin with a classical null
    * distribution: χ²_{k−1}). Categories absent from the reference
    * contribute through `floorCount` pseudo-counts (a zero expected
    * cell would divide by zero exactly when drift is most extreme).
    * One partial-agg census per side, full-outer joined on the
    * category, tiny final agg. Output: (n_categories, n_ref, n_cur,
    * chi2) rounded to 6 dp.
    */
  def chiSquare(ref: DataFrame, cur: DataFrame, colName: String,
                floorCount: Double = 0.5): DataFrame = {
    require(floorCount > 0, s"floorCount must be positive, got $floorCount")
    def census(df: DataFrame, tag: String) = df
      .groupBy(col(colName).cast("string").as("__cat"))
      .agg(count(lit(1)).as(s"__c_$tag"))
    val cells = census(ref, "ref").join(census(cur, "cur"), Seq("__cat"), "full_outer")
      .select(col("__cat"),
        coalesce(col("__c_ref"), lit(0L)).as("__r"),
        coalesce(col("__c_cur"), lit(0L)).as("__c"))
    val tot = cells.agg(sum(col("__r")).as("__tr"), sum(col("__c")).as("__tc"))
    cells.crossJoin(broadcast(tot))
      .select(col("__cat"), col("__r"), col("__c"), col("__tr"), col("__tc"),
        greatest(col("__r").cast("double"), lit(floorCount)).as("__rf"))
      .withColumn("__exp", col("__rf") / col("__tr") * col("__tc"))
      .agg(count(lit(1)).as("n_categories"),
        max(col("__tr")).as("n_ref"), max(col("__tc")).as("n_cur"),
        round(sum((col("__c") - col("__exp")) * (col("__c") - col("__exp")) / col("__exp")),
          6).as("chi2"))
  }
}
