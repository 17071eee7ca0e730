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
    } else if (args.length > 2 && args(2) == "profile") {
      // Stage-level attribution (optimization guide §1.1): one warm
      // pass, then a profiled pass recording every stage's wall /
      // task count / shuffle volumes, printed slowest-first — says
      // WHERE a query's seconds go without the (disabled) UI.
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, String, Long, Int, Long, Long, Long, Long, Long)]()
      val submits = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
            .getOrElse(-1L)
          stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(90), wall,
            si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L,
            si.taskMetrics.jvmGCTime))
          si.submissionTime.foreach(t => submits.put(si.stageId, t))
        }
      })
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run() // codegen/footer caches + any train-once artifacts
      stages.clear()
      val timed = run()
      Thread.sleep(500) // let the listener bus drain
      println(f"[diag] $name warm=$warm%.3f s profiled=$timed%.3f s — stages by wall:")
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_._3)
      rows.foreach { case (id, nm, wall, tasks, sr, sw, run, cpu, gc) =>
        println(f"[stage] $wall%6d ms  run=$run%6d ms  cpu=$cpu%6d ms  gc=$gc%5d ms  " +
          f"tasks=$tasks%4d  sread=${sr / 1024}%8d KB  swrite=${sw / 1024}%8d KB  s$id%-5d $nm")
      }
      println(f"[diag] stage wall sum=${rows.map(_._3).sum}%d ms over ${rows.size}%d stages " +
        "(stages overlap; sum > query wall is normal)")
      // timeline: stage submission/completion offsets expose DRIVER
      // gaps (planning, AQE rounds, broadcast builds) between stages
      val t0all = stages.asScala.flatMap(s => submits.asScala.get(s._1)).minOption.getOrElse(0L)
      stages.asScala.toSeq.sortBy(s => submits.asScala.getOrElse(s._1, 0L)).foreach { s =>
        val sub = submits.asScala.getOrElse(s._1, 0L) - t0all
        println(f"[timeline] s${s._1}%-5d submit=+$sub%6d ms  wall=${s._3}%5d ms  tasks=${s._4}%4d")
      }
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
