package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query iteration harness: run one `SparkEntry.queries` entry
  * N times against a sf dir, print per-pass seconds and (optionally)
  * the formatted plan. The per-query bench loop without the full
  * headline sweep — for plan/perf iteration on one operator.
  *
  * Usage: runMain graft.tools.Once <name[,name2,…]> [reps] [--explain]
  * Multiple names interleave BY PASS (A, B, A, B, …) in one JVM — the
  * only timing shape that survives this box's run-to-run noise for an
  * A/B comparison. Prints per-pass seconds and a median line per query.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object Once {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: Once <name[,name2]> [reps] [--explain]"))
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val explain = args.contains("--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n =>
      n -> graft.SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n")))
    if (explain) qs.foreach { case (n, q) =>
      println(s"=== $n ==="); q(spark, sfDir).explain("formatted")
    }
    // untimed warm pass (codegen, footer cache, shuffle machinery)
    qs.foreach { case (_, q) => q(spark, sfDir).write.format("noop").mode("overwrite").save() }
    val samples = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { i =>
      qs.foreach { case (n, q) =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        samples(n) = samples(n) :+ dt
        println(f"[once] $n pass $i: $dt%.3f s")
      }
    }
    qs.foreach { case (n, _) =>
      val s = samples(n).sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"[once] $n median: $med%.3f s min: ${s.head}%.3f s")
    }
  }
}
