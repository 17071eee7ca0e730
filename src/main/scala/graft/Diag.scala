package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run one named query (args(0)) on args(1) sf dir, print
  * timing; args(2) = `explain` prints the formatted plan instead, an
  * integer N times the query N times in one session (run 1 = cold,
  * rest warm — codegen/footer caches populated).
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "explain") {
      // built here, not above: IO-query lambdas perform eager writes
      // that must not run (untimed) before the timed branch
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    } else {
      val reps = if (args.length > 2) args(2).toInt else 1
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[diag] $name run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
