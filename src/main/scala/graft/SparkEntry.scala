package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    AnalyticsQueries,
    CoreQueries,
    ExampleQueries,
    IoQueries,
    MaintenanceQueries,
    PairQueries,
    StatsWindowQueries,
    StreamQueries,
    SyntaxQueries,
    TextCleanQueries,
    TextVectorQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
