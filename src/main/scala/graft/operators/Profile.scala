package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the per-column census (nulls, distinct
  * cardinality, min/max) a pipeline runs before trusting a new feed.
  * scio users assemble this from aggregate/countApproxDistinct per
  * column (reference: scio-core values/SCollection.scala aggregate,
  * estimators); graft ships it as one operator that computes EVERY
  * column's stats in a single scan.
  *
  * Returns one row per column: (col_name, n_rows, n_nulls,
  * n_distinct, min_value, max_value) — min/max cast to string so
  * heterogeneous columns share a schema.
  *
  * Scale shape: [[profile]] is exact — multiple count(DISTINCT) in one
  * aggregate plan via Expand, one stream duplication per column;
  * right for gate-sized validation, wrong for a 100 TB census.
  * [[profileApprox]] swaps HLL++ sketches in (map-side partial, no
  * Expand) — the at-scale default, with the 2% HLL error bound.
  */
object Profile {

  private def rows(df: DataFrame, cols: Seq[String], distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            distinctAgg(c).as(s"__dist_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(structs: _*)).as("r"))
      .select(col("r.col_name"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_value"), col("r.max_value"))
      .orderBy(col("col_name"))
  }

  /** Exact profile (count DISTINCT via Expand) — gate-sized data. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    rows(df, cols, c => countDistinct(col(c)))

  /** HLL++ profile — the 100 TB path: one scan, map-side partials,
    * no Expand; n_distinct is approximate (rsd 2%).
    */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    rows(df, cols, c => approx_count_distinct(col(c), 0.02))

  /** The shared violation-count aggregate expressions — the ONE place
    * the null-counts-as-violation contract is stated; [[expect]] and
    * the streaming mirror (graft.streaming.StreamMonitor) both build
    * from here so batch and stream gates cannot drift apart.
    * `coalesce(sum, 0)` keeps an EMPTY frame reporting 0 violations
    * (a day with no rows passes its contracts) instead of nulls.
    */
  private[graft] def violationAggs(expectations: Seq[(String, Column)],
                                   prefix: String): Seq[Column] = {
    require(expectations.nonEmpty, "expect needs at least one expectation")
    require(expectations.map(_._1).distinct.size == expectations.size,
      "expectation names must be unique")
    count(lit(1)).as(s"${prefix}n_rows") +:
      expectations.map { case (n, pred) =>
        coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"$prefix$n")
      }
  }

  /** Data-contract gate (the expectations check a pipeline runs before
    * admitting a feed, Great-Expectations-shaped): each named
    * expectation is a row-level predicate that must hold on every row.
    * Returns one row per expectation — (expectation, n_rows,
    * n_violations, pass) — ALL computed in ONE scan as conditional
    * partial-aggregate counts (no Expand, no per-expectation pass).
    *
    * Null contract: a predicate evaluating to null (e.g. `col > 0` on
    * a null) counts as a VIOLATION — a contract an unknown value
    * cannot be shown to satisfy is not satisfied. Express nullable
    * intent explicitly (`col.isNull || col > 0`).
    */
  def expect(df: DataFrame, expectations: Seq[(String, Column)]): DataFrame = {
    // validate the USER names here — violationAggs below only sees the
    // positional aliases, which are unique by construction
    require(expectations.map(_._1).distinct.size == expectations.size,
      "expectation names must be unique")
    val aggs = violationAggs(
      expectations.zipWithIndex.map { case ((_, p), i) => (s"viol_$i", p) }, "__")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = expectations.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("expectation"), col("__n_rows").as("n_rows"),
        col(s"__viol_$i").as("n_violations"),
        (col(s"__viol_$i") === 0L).as("pass"))
    }
    one.select(explode(array(structs: _*)).as("r"))
      .select(col("r.expectation"), col("r.n_rows"), col("r.n_violations"),
        col("r.pass"))
      .orderBy(col("expectation"))
  }

  /** A bounded sample of rows violating `pred` — the debugging
    * companion to [[expect]] (the gate says HOW MANY, this shows
    * WHICH). `limit` bounds driver/downstream exposure; the filter
    * prunes distributed before the limit.
    */
  def violations(df: DataFrame, pred: Column, limit: Int = 100): DataFrame = {
    require(limit > 0, s"limit must be > 0, got $limit")
    df.filter(!coalesce(pred, lit(false))).limit(limit)
  }

  /** Pairwise Pearson correlations over numeric columns in ONE scan:
    * all n·(n−1)/2 `corr` aggregates run as partial aggs of a single
    * pass (no per-pair jobs, no driver-side matrix assembly beyond
    * the 1-row result), unpivoted to (col_a, col_b, corr) rows.
    * Rounded to 5 dp — correlation accumulates via a one-pass
    * co-moment update in both Spark and the SQL oracle, and 5 digits
    * survives the cross-engine summation-order noise the §5 digit
    * budget warns about. Null pairs are ignored by `corr` itself;
    * a constant column yields a null correlation (kept, disclosed).
    */
  /** Schema drift between two snapshots of a feed — the metadata axis
    * beside [[graft.dedup.Dedup.corpusDiff]] (content) and
    * [[Drift]] (distributions): one row per field name with status
    * `added` (only in `b`), `removed` (only in `a`), `changed`
    * (present in both, different type), or `unchanged`, plus both
    * catalog type strings (null where absent). Pure metadata — no
    * data is scanned; nested types compare by full catalogString.
    */
  def schemaDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ta = a.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val tb = b.schema.map(f => f.name -> f.dataType.catalogString).toMap
    // preserve first-seen field order: a's fields, then b-only fields
    val fields = (a.schema.map(_.name) ++ b.schema.map(_.name)).distinct
    val rows = fields.map { f =>
      val (va, vb) = (ta.get(f), tb.get(f))
      val status = (va, vb) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(x), Some(y)) if x == y => "unchanged"
        case _ => "changed"
      }
      (f, status, va.orNull, vb.orNull)
    }
    import a.sparkSession.implicits._
    rows.toDF("field", "status", "type_a", "type_b")
  }

  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // corr() under ANSI mode raises DIVIDE_BY_ZERO on a zero-variance
    // column; the covar/stddev spelling with try_divide returns the
    // SQL-standard null instead (same one-pass co-moment math, the
    // (n−1) denominators cancel identically)
    val aggs = pairs.map { case (a, b) =>
      round(try_divide(covar_samp(col(a), col(b)),
        stddev_samp(col(a)) * stddev_samp(col(b))), 5).as(s"__corr_${a}__$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__corr_${a}__$b").as("corr"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
