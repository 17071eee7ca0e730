package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC IO (reference: scio-jdbc/src/main/scala/com/spotify/scio/jdbc/
  * — jdbcSelect / saveAsJdbc). Thin, deliberately: Spark's JDBC
  * source already does the right things (predicate pushdown into the
  * remote WHERE clause, column pruning into the SELECT list, batch
  * writes); graft adds the scio-shaped entry points and pins the
  * SCALE contract in one place:
  *
  *  - [[read]] is a SINGLE-connection scan — fine for dimension
  *    tables, wrong for big ones;
  *  - [[readPartitioned]] is the 100 TB shape: `numPartitions`
  *    concurrent connections, each scanning one stride of
  *    `partitionColumn` ∈ [lowerBound, upperBound) — every executor
  *    pulls its own slice, nothing funnels through the driver.
  *
  * Tested against Derby, the embedded in-process database on Spark's
  * own classpath — the API surface is identical for any server URL.
  */
object Jdbc {

  /** Point embedded Derby's scratch (derby.log, databases) at
    * `home` — by default the JVM temp dir — instead of Derby's own
    * default of user.dir, which would drop scratch into the project
    * tree. EXPLICIT, not a class-load side effect: a library mutating
    * JVM globals on first touch is a surprise; call this (or set
    * `derby.system.home` yourself) before the first embedded-Derby
    * connection. No-op if the property is already set; irrelevant for
    * every non-Derby JDBC driver.
    */
  def configureDerby(home: String = sys.props.getOrElse("java.io.tmpdir", "/tmp")): Unit =
    if (sys.props.get("derby.system.home").isEmpty)
      System.setProperty("derby.system.home", home)

  /** Single-connection read of a table or subquery (alias a subquery:
    * `"(SELECT ...) t"`). Filters/projections on the result push into
    * the remote SQL.
    */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned parallel read: `numPartitions` connections, each
    * scanning one stride of `partitionColumn` (numeric/date/timestamp)
    * between the bounds. Rows outside the bounds are still read (the
    * edge strides are unbounded) — bounds control PARALLELISM, not
    * filtering.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)

  /** Batch write (mode: append/overwrite/ignore/errorifexists).
    * Parallelism = input partitions, one connection each; repartition
    * upstream to respect the database's connection budget.
    */
  def write(df: DataFrame, url: String, table: String, mode: String = "errorifexists",
            props: Properties = new Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
