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
    val boundsRow = ref.agg(
      array(probs.map(p => percentile(col(colName), lit(p))): _*).as("__bounds"))
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
}
