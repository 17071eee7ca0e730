package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Distinct-count-safe hierarchical rollup — the reference's
  * `rollupAndCount` (scio-extra rollup/syntax/SCollectionSyntax.scala:49,
  * semantics pinned by rollup/RollupTest.scala).
  *
  * The problem it solves: COUNT(DISTINCT user) is not summable across
  * rollup levels, so subtotal rows can't be derived from leaf rows.
  * The reference avoids a count-distinct over the full grouping-set
  * fan-out with two streams that sum to the exact answer:
  *
  *  1. "double-counting": pre-aggregate rows per (fixed, leaf-rollup)
  *     — count + summed measure — then fan each tiny aggregated row
  *     out to its rollup variants. The count over-counts a unique key
  *     that reached the same variant through several leaves.
  *  2. "correction": per (uniqueKey, fixed), count how many of that
  *     key's rows map to each variant; every occurrence beyond the
  *     first is subtracted. `final = raw - overcount = distinct keys`.
  *
  * Scale shape (the reason this verb exists at 100 TB): stream 1
  * shuffles only the leaf aggregate (partial-agg'd map-side, bounded
  * by |distinct dims|, never by rows). Stream 2 is the only raw-sized
  * shuffle — (uniqueKey, fixed, variant) with map-side combine, i.e.
  * at most what one COUNT(DISTINCT) grouping set would shuffle, while
  * answering ALL grouping sets; the `k > 1` filter shrinks it before
  * the second exchange. Everything stays in whole-stage codegen (the
  * variant fan-out is an `explode` over a literal-shaped struct
  * array, not a UDF).
  */
object Rollup {

  /** Columnar form. When APPROXIMATE distinct counts suffice, skip
    * the correction stream entirely: HLL sketches ARE mergeable across
    * levels, so plain `df.rollup(dims).agg(approx_count_distinct(u))`
    * (or the persisted [[Sketches]] HLL artifacts for incremental
    * corpora) is the cheaper path; this verb exists for the EXACT
    * counts that sketches can't give.
    *
    * `groupingSets` lists, per output rollup level, the
    * subset of `rollupDims` to KEEP — the rest are nulled (the rolled
    * marker, mirroring the reference's `Option = None` convention).
    * Returns one row per (fixedDims, variant) with `measure_sum`
    * (plain sum of `measure` over contributing rows) and
    * `distinct_count` (exact distinct `uniqueKey`).
    */
  def rollupAndCount(
      df: DataFrame,
      uniqueKey: String,
      fixedDims: Seq[String],
      rollupDims: Seq[String],
      groupingSets: Seq[Seq[String]],
      measure: String): DataFrame = {
    require(rollupDims.nonEmpty, "need at least one rollup dimension")
    require(groupingSets.nonEmpty, "need at least one grouping set")
    groupingSets.foreach { g =>
      require(g.forall(rollupDims.contains),
        s"grouping set ${g.mkString("(", ",", ")")} is not a subset of rollupDims")
    }
    val rollupTypes = rollupDims.map(d => d -> df.schema(d).dataType).toMap
    // __keep_mask (bit i set ⇔ rollupDims(i) KEPT) disambiguates a
    // rolled-up dim from a genuine NULL data value in a kept dim: the
    // SQL GROUPING() bit, carried inside the variant struct. Without
    // it, keep{a,b} with a IS NULL and keep{b} yield identical
    // structs, array_distinct collapses them, and leaf rows silently
    // merge into subtotal rows — distinct_count then diverges from
    // GROUPING SETS (and from the reference's Option semantics, where
    // None and Some(null) are distinct). The mask is a plan-time
    // literal per grouping set and is dropped on output.
    def variantStruct(keep: Set[String]) = {
      val mask = rollupDims.zipWithIndex
        .collect { case (d, i) if keep(d) => 1L << i }.sum
      struct(lit(mask).as("__keep_mask") +: rollupDims.map { d =>
        (if (keep(d)) col(d) else lit(null).cast(rollupTypes(d))).as(d)
      }: _*)
    }
    // identical variants collapse, mirroring the reference's Set[R]
    val variants =
      array_distinct(array(groupingSets.map(g => variantStruct(g.toSet)): _*))
    val keyCols = fixedDims ++ rollupDims

    // stream 1: leaf aggregate -> fan out -> per-variant raw sums
    val fanned = df
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(measure)).as("__m"), count(lit(1)).as("__c"))
      .select(fixedDims.map(col) ++
        Seq(explode(variants).as("__v"), col("__m"), col("__c")): _*)
      .groupBy(fixedDims.map(col) :+ col("__v"): _*)
      .agg(sum(col("__m")).as("measure_sum"), sum(col("__c")).as("__rows"))

    // stream 2: per-key occurrence counts per variant; subtract the
    // beyond-the-first occurrences
    val corr = df
      .select(Seq(col(uniqueKey).as("__u")) ++ fixedDims.map(col) :+
        explode(variants).as("__v"): _*)
      .groupBy(Seq(col("__u")) ++ fixedDims.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__k"))
      .where(col("__k") > 1)
      .groupBy(fixedDims.map(col) :+ col("__v"): _*)
      .agg(sum(col("__k") - 1).as("__over"))

    // null-safe equi-join: rolled dims are null inside the variant
    // struct, but struct equality (<=>) over __v handles them
    val joinCond = fixedDims
      .map(k => fanned(k) <=> corr(k))
      .foldLeft(fanned("__v") <=> corr("__v"))(_ && _)
    fanned
      .join(corr, joinCond, "left")
      .select(fixedDims.map(fanned(_)) ++
        rollupDims.map(d => fanned("__v").getField(d).as(d)) ++
        Seq(fanned("measure_sum"),
          (fanned("__rows") - coalesce(corr("__over"), lit(0L)))
            .as("distinct_count")): _*)
  }

  /** Typed form with the reference's exact signature shape:
    * `(uniqueKey, fixedDims, rollupDims, measure)` tuples plus an
    * arbitrary `R => Set[R]` rollup generator and a measure monoid
    * (the reference's algebird `Group[M]` — only zero/plus are used).
    * This is the generality escape hatch (the generator can do
    * anything); prefer the columnar form when the rollup is
    * expressible as grouping sets, which stays in codegen.
    */
  def rollupAndCount[U, D, R, M](ds: Dataset[(U, D, R, M)])(
      rollupFn: R => Set[R])(zero: M, plus: (M, M) => M)(implicit
      eu: Encoder[U], ed: Encoder[D], er: Encoder[R], em: Encoder[M])
      : Dataset[((D, R), (M, Long))] = {
    implicit val eML: Encoder[(M, Long)] = Encoders.tuple(em, Encoders.scalaLong)
    implicit val eDR: Encoder[(D, R)] = Encoders.tuple(ed, er)
    implicit val eOut: Encoder[((D, R), (M, Long))] = Encoders.tuple(eDR, eML)
    implicit val eUD: Encoder[(U, D)] = Encoders.tuple(eu, ed)
    implicit val eUDR: Encoder[((U, D), R)] = Encoders.tuple(eUD, er)

    val doubleCounting = ds
      .map { case (_, d, r, m) => ((d, r), (m, 1L)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups((a: (M, Long), b: (M, Long)) => (plus(a._1, b._1), a._2 + b._2))
      .flatMap { case ((d, r), mv) => rollupFn(r).iterator.map(r2 => ((d, r2), mv)) }

    val correcting = ds
      .map { case (u, d, r, _) => ((u, d), r) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .flatMapGroups { (key: (U, D), rs: Iterator[R]) =>
        val values = rs.toList
        if (values.sizeIs <= 1) Iterator.empty
        else {
          val overcount = collection.mutable.Map.empty[R, Long]
          for (r <- values; v <- rollupFn(r))
            overcount(v) = overcount.getOrElse(v, 1L) - 1L
          overcount.iterator.collect {
            case (v, neg) if neg < 0L => ((key._2, v), (zero, neg))
          }
        }
      }

    doubleCounting
      .union(correcting)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups((a: (M, Long), b: (M, Long)) => (plus(a._1, b._1), a._2 + b._2))
  }
}
