package graft.pipeline

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier half of the GPT-3 /
  * LLaMA data recipes: train a linear classifier to distinguish a
  * high-quality reference corpus (positives) from the raw crawl
  * (negatives), then keep raw documents the model scores
  * reference-like. Complements the rule battery
  * ([[graft.functions.QualityRules]]) and the distribution matcher
  * ([[Dsir]]): rules catch boilerplate, DSIR matches n-gram mass,
  * the classifier learns a decision boundary.
  *
  * Features are the same md5-hashed unigram+bigram buckets as DSIR
  * ([[Dsir.featureRows]]), L1-normalized per document — the
  * fastText-style linear bag-of-n-grams shape. The model is Spark
  * ML's LogisticRegression (distributed LBFGS — one treeAggregate
  * pass per iteration, nothing collected), so training runs on the
  * full corpus, not a driver sample, and scoring is a broadcast of
  * one coefficient vector into a map-side transform.
  *
  * Determinism note: LBFGS gradient sums are floating-point
  * treeAggregates, so coefficients can wiggle in the last ulps under
  * re-partitioning — scores are stable to ~1e-6 but not bit-exact
  * (the reason q_quality_classifier is rows-only; semantics are
  * pinned in QualityClassifierSpec).
  */
object QualityClassifier {

  /** (id, features) rows: L1-normalized hashed n-gram counts as an ML
    * sparse vector. Docs with no tokens keep a row with the zero
    * vector (no silent row loss).
    *
    * `idCol` must be an integral column (the vector assembly is a
    * typed Dataset map keyed by Long) — validated loudly here, because
    * a silent cast would turn uncastable ids into null join keys and
    * hand those docs the zero vector. String-keyed corpora: add a
    * dense surrogate first (GlobalOrder.zipWithGlobalIndex).
    */
  def featurize(df: DataFrame, idCol: String, textCol: String,
                numBuckets: Int): DataFrame = {
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"idCol '$idCol' must be integral for the vector assembly, got $other; " +
          "derive a dense surrogate id first (GlobalOrder.zipWithGlobalIndex)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val feats = Dsir.featureRows(df, idCol, textCol, numBuckets)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(
        col("bucket").cast("int").as("b"), col("cnt").cast("double").as("c"))))
        .as("bc"))
      .as[(Long, Seq[(Int, Double)])]
      .map { case (id, bc) =>
        val total = bc.iterator.map(_._2).sum
        (id, Vectors.sparse(numBuckets,
          bc.iterator.map(_._1).toArray,
          bc.iterator.map(_._2 / total).toArray): Vector)
      }
      .toDF("id", "features")
    df.select(col(idCol).cast("long").as("id")).join(feats, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("features"),
          typedLit(Vectors.sparse(numBuckets, Array.empty[Int], Array.empty[Double])))
          .as("features"))
  }

  /** Train positives-vs-negatives; both frames need (idCol, textCol).
    * Returns the fitted model (persist with `model.save(path)` /
    * reload with `LogisticRegressionModel.load` — the same
    * artifact-once-reuse-many contract as the IVF/BPE/Annoy indexes).
    */
  def train(positive: DataFrame, negative: DataFrame, idCol: String,
            textCol: String, numBuckets: Int = 4096, maxIter: Int = 50,
            regParam: Double = 1e-4): LogisticRegressionModel = {
    val labeled = featurize(positive, idCol, textCol, numBuckets)
      .withColumn("label", lit(1.0))
      .unionByName(featurize(negative, idCol, textCol, numBuckets)
        .withColumn("label", lit(0.0)))
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(labeled)
  }

  /** Score a corpus: (id, quality) with quality = P(reference-like).
    * The model's coefficient vector broadcasts; scoring is map-side.
    */
  def score(df: DataFrame, model: LogisticRegressionModel, idCol: String,
            textCol: String, numBuckets: Int = 4096): DataFrame =
    model.transform(featurize(df, idCol, textCol, numBuckets))
      .select(col("id"), vector_to_array(col("probability"))(1).as("quality"))

  /** Persist the fitted model as an ENGINE-NEUTRAL artifact: one
    * `(bucket, weight)` parquet row per coefficient, the intercept at
    * bucket -1 — so scoring is replayable by pure SQL in any engine
    * (the split the training/scoring boundary deserves: LBFGS
    * coefficients carry fp-summation state that only this engine can
    * reproduce, but once FROZEN, scoring with them is arithmetic).
    */
  def saveWeights(model: LogisticRegressionModel, path: String,
                  spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = model.coefficients.toArray.iterator.zipWithIndex
      .map { case (w, b) => (b.toLong, w) } ++ Iterator((-1L, model.intercept))
    rows.toSeq.toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Score against a PERSISTED [[saveWeights]] artifact — the
    * recurring-pipeline shape (train once offline, score every crawl):
    * per doc, `dot = Σ w_b·cnt_b / Σ cnt_b` (the L1 normalization of
    * [[featurize]] folded into one division), `quality =
    * sigmoid(intercept + dot)`. The ≤ numBuckets+1-row weights table
    * broadcasts into a codegen join; docs with no tokens keep
    * `sigmoid(intercept)` (the zero-vector score, matching
    * [[score]]). No ML-vector assembly on this path at all — it
    * stays whole-stage-codegen end to end.
    *
    * The weights join is a LEFT join with `coalesce(weight, 0)`: the
    * L1 denominator `Σ cnt` must be the document's TRUE token total,
    * so a SPARSE artifact (zero weights trimmed, or a numBuckets
    * mismatch between save and score) drops the missing buckets'
    * contribution from the numerator only — an inner join would
    * silently shrink the denominator too and diverge from [[score]].
    */
  def scoreWithWeights(df: DataFrame, idCol: String, textCol: String,
                       numBuckets: Int, weightsPath: String): DataFrame = {
    val spark = df.sparkSession
    val w = spark.read.parquet(weightsPath)
    val intercept = w.filter(col("bucket") === -1L).head().getAs[Double]("weight")
    val dots = Dsir.featureRows(df, idCol, textCol, numBuckets)
      .join(broadcast(w.filter(col("bucket") >= 0L)), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg((sum(coalesce(col("weight"), lit(0.0)) * col("cnt")) / sum(col("cnt")))
        .as("__dot"))
    df.select(col(idCol).cast("long").as("id")).join(dots, Seq("id"), "left")
      .select(col("id"),
        (lit(1.0) / (lit(1.0) +
          exp(-(lit(intercept) + coalesce(col("__dot"), lit(0.0)))))).as("quality"))
  }
}
