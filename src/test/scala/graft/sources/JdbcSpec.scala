package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Against embedded Derby (in-process, on Spark's classpath) — no
  * external service, same Spark JDBC surface as any server URL.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  Jdbc.configureDerby() // keep derby.log out of the project tree

  private def freshUrl(): String =
    s"jdbc:derby:memory:graft_${java.util.UUID.randomUUID().toString.replace("-", "")};create=true"

  test("write → read roundtrip through an embedded database") {
    val url = freshUrl()
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, null: String, 0.25))
      .toDF("id", "name", "score")
    Jdbc.write(df, url, "t_round")
    val back = Jdbc.read(spark, url, "t_round").collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getString(1) == "alpha" && back(0).getDouble(2) == 1.5)
    assert(back(2).isNullAt(1))
  }

  test("readPartitioned splits the scan into concurrent strides, losing no rows") {
    val url = freshUrl()
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
    Jdbc.write(df, url, "t_part")
    val part = Jdbc.readPartitioned(spark, url, "t_part", "id", 0L, 1000L, 8)
    assert(part.rdd.getNumPartitions == 8)
    assert(part.count() == 1000L)
    assert(part.agg(sum("v")).head().getLong(0) ==
      (0L until 1000L).map(_ % 7).sum)
    // bounds control parallelism, not filtering: rows outside survive
    val narrow = Jdbc.readPartitioned(spark, url, "t_part", "id", 400L, 600L, 4)
    assert(narrow.count() == 1000L)
  }

  test("filters and projections push into the remote SQL") {
    val url = freshUrl()
    Jdbc.write(spark.range(0, 100).select(col("id"), (col("id") * 2).as("v")), url, "t_push")
    val q = Jdbc.read(spark, url, "t_push").filter(col("id") < 10).select("v")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L).map(_ * 2))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan"),
      s"filter not pushed into JDBC scan:\n$scan")
  }

  test("write modes: append grows, overwrite replaces, errorifexists raises") {
    val url = freshUrl()
    val df = Seq((1L, "x")).toDF("id", "s")
    Jdbc.write(df, url, "t_modes")
    Jdbc.write(df, url, "t_modes", mode = "append")
    assert(Jdbc.read(spark, url, "t_modes").count() == 2L)
    Jdbc.write(df, url, "t_modes", mode = "overwrite")
    assert(Jdbc.read(spark, url, "t_modes").count() == 1L)
    intercept[Exception](Jdbc.write(df, url, "t_modes"))
  }
}
