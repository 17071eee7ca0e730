package graft.testing

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scio-test-parity base class for pipeline specs.
  *
  * Mirrors the reference's `PipelineSpec`
  * (scio-test/core/src/main/scala/com/spotify/scio/testing/PipelineSpec.scala)
  * + `PipelineTestUtils.runWithData`
  * (PipelineTestUtils.scala:77,98,121): a ScalaTest base with the
  * Dataset matcher DSL mixed in and helpers that lift in-memory data
  * into Datasets, run a transform, and hand back the materialized
  * result. One shared local session per JVM (`getOrCreate` — coexists
  * with any other session owner in the same test JVM).
  */
trait GraftPipelineSpec extends AnyFunSuite with Matchers with DatasetMatchers {

  /** Shared session; override to supply your own. */
  implicit lazy val spark: SparkSession = GraftPipelineSpec.session

  /** Lift data, apply the transform, materialize the result.
    * Reference: PipelineTestUtils.scala:77 `runWithData`.
    */
  def runWithData[T: Encoder, U](data: Iterable[T])(fn: Dataset[T] => Dataset[U]): Seq[U] =
    fn(spark.createDataset(data.toSeq)).collect().toSeq

  /** Two-input variant. Reference: PipelineTestUtils.scala:98. */
  def runWithData[T1: Encoder, T2: Encoder, U](data1: Iterable[T1], data2: Iterable[T2])(
      fn: (Dataset[T1], Dataset[T2]) => Dataset[U]
  ): Seq[U] =
    fn(spark.createDataset(data1.toSeq), spark.createDataset(data2.toSeq)).collect().toSeq

  /** Three-input variant. Reference: PipelineTestUtils.scala:121. */
  def runWithData[T1: Encoder, T2: Encoder, T3: Encoder, U](
      data1: Iterable[T1],
      data2: Iterable[T2],
      data3: Iterable[T3]
  )(fn: (Dataset[T1], Dataset[T2], Dataset[T3]) => Dataset[U]): Seq[U] =
    fn(
      spark.createDataset(data1.toSeq),
      spark.createDataset(data2.toSeq),
      spark.createDataset(data3.toSeq)
    ).collect().toSeq

  /** Build-but-don't-collect variant for matcher-style assertions.
    * Reference: PipelineTestUtils.scala:215 `runWithLocalOutput` (the
    * lazy half — the Dataset is the pipeline; matchers execute it).
    */
  def datasetOf[T: Encoder](data: Iterable[T]): Dataset[T] =
    spark.createDataset(data.toSeq)
}

object GraftPipelineSpec {
  /** graft-testing must not depend on graft core (scio-test likewise
    * sits beside scio-core, not on top of it) — so the graft Catalyst
    * extensions are picked up REFLECTIVELY when core is on the test
    * classpath (the normal downstream layout) and skipped cleanly when
    * the matchers are used against plain Spark.
    */
  lazy val session: SparkSession = {
    val cpus = math.max(2, math.min(4, Runtime.getRuntime.availableProcessors()))
    var b = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    try {
      val ext = Class.forName("graft.expressions.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      b = b.withExtensions(ext)
    } catch { case _: ClassNotFoundException => }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
