package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query iteration harness: run one `SparkEntry.queries` entry
  * N times against a sf dir, print per-pass seconds and (optionally)
  * the formatted plan. The per-query bench loop without the full
  * headline sweep — for plan/perf iteration on one operator.
  *
  * Usage: runMain graft.tools.Once <queryName> [reps] [--explain]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object Once {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Once <queryName> [reps] [--explain]"))
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val explain = args.contains("--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    if (explain) q(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[once] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
