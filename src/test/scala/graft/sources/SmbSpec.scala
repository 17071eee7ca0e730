package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** scio-smb parity: bucketed+sorted write, then joins on the bucket
  * key must plan WITHOUT any Exchange (the whole point of SMB).
  */
class SmbSpec extends SparkSpec {

  test("co-bucketed join plans with no Exchange and matches plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    Smb.writeBucketed(li, "smb_test_li", "/tmp/graft_test/smb/li", 4, Seq("l_orderkey"))
    Smb.writeBucketed(ord, "smb_test_ord", "/tmp/graft_test/smb/ord", 4, Seq("o_orderkey"))

    // disable broadcast + AQE so the static plan shows the join shape
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Smb.smbJoin(spark, "smb_test_li", "smb_test_ord",
        Seq("l_orderkey"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"SMB join must not shuffle:\n$plan")

      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(sortedRows(joined) == sortedRows(expected))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("smb_test_li").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"bucketed agg must not shuffle:\n$plan")
    } finally conf.set("spark.sql.adaptive.enabled", oldAqe)
  }
}
