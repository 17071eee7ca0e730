package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — churn/retention
  * curves (Kaplan & Meier 1958), the lifetime analytics scio users
  * hand-roll from groupBy + sorted folds.
  */
object Survival {

  /** Kaplan–Meier product-limit estimator: one row per distinct
    * duration with (duration, n_at_risk, n_events, n_censored,
    * survival) where survival = Π_{t' <= t} (1 − d_t'/n_t').
    * `eventCol` is true for an observed event (churn/death), false
    * for a right-censored subject (still alive at last observation);
    * censored subjects leave the risk set at their duration but take
    * no survival step — the standard treatment.
    *
    * Scale shape: subjects reduce to one row per DISTINCT duration
    * (hash agg, map-side partial); the risk set and the log-space
    * survival product are both exclusive global prefix sums over that
    * reduced table via [[GlobalOrder]]'s balanced bucketed machinery
    * (integer counts for n_at_risk, double log terms for the
    * product) — never a single-partition window, even if every
    * subject has a distinct duration. survival is exp of a double
    * prefix sum: round it (the gate uses 6 dp; error is ~1e-12).
    * A duration where every remaining subject dies yields
    * survival = 0 exactly (ln 0 = −∞ → exp → 0).
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val perT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("duration"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    val total = perT.agg(sum(col("n_events") + col("n_censored")))
      .collect()(0).getLong(0)
    val atRisk = GlobalOrder.withGlobalOffset(perT, "duration",
        col("n_events") + col("n_censored"), "__gone")
      .withColumn("n_at_risk", lit(total) - col("__gone"))
      .drop("__gone")
    // A duration where EVERY remaining subject dies is necessarily
    // the last row (the risk set empties), so its log term can be
    // excluded from the running sum and its survival pinned to 0 —
    // ln(0) is an error in both engines, not -inf.
    val logTerm = when(col("n_events") < col("n_at_risk"),
      log(lit(1.0) -
        col("n_events").cast("double") / col("n_at_risk").cast("double")))
      .otherwise(lit(0.0))
    val hazardTerm = col("n_events").cast("double") / col("n_at_risk").cast("double")
    val withS = GlobalOrder.withGlobalOffsetDouble(
        atRisk.withColumn("__lt", logTerm), "duration", col("__lt"), "__lp")
      .withColumn("survival",
        when(col("n_events") === col("n_at_risk"), lit(0.0))
          .otherwise(exp(col("__lp") + col("__lt"))))
    // Nelson–Aalen cumulative hazard H(t) = Σ_{t'<=t} d/n — the other
    // standard curve, one more prefix sum over the same tiny table
    GlobalOrder.withGlobalOffsetDouble(
        withS.withColumn("__ht", hazardTerm), "duration", col("__ht"), "__hp")
      .withColumn("hazard", col("__hp") + col("__ht"))
      .select(col("duration"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("survival"), col("hazard"))
  }
}
