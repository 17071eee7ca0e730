package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver's testdata: replicates an
  * existing sf directory N× with key remapping, producing a larger
  * corpus with the SAME relational structure — so the full oracle gate
  * and the bench can run above the largest driver-generated sf and
  * empirically test the scaling claims (SURVEY §5).
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  *
  * Remapping rules (replica i of N):
  *  - region/nation: fixed dimensions, copied once (real corpora grow
  *    facts, not the country list);
  *  - customer/supplier/part/orders/lineitem: primary and foreign keys
  *    shift by i·(max+1) of their base table, so referential joins
  *    stay exact and key cardinality grows N×;
  *  - events: event ids/user ids shift; timestamps keep their range
  *    (more traffic over the same window — the realistic growth mode
  *    for windowed aggregation);
  *  - documents: ids shift and each replica's text gets a one-token
  *    replica prefix — near-dup structure inside a replica is
  *    preserved while cross-replica EXACT-dup explosion (every doc
  *    10 identical copies, which no real corpus growth produces and
  *    which would quadratically distort LSH bucket sizes) is avoided;
  *  - embeddings: ids shift; vectors get a deterministic ±1% per-
  *    element perturbation (hash-seeded, no RNG), preserving the
  *    geometry while avoiding the same exact-dup artifact.
  */
object ScaleUp {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed dimensions: straight copy
    Seq("region", "nation").foreach(t => write(read(t), t))

    val customer = read("customer"); val custBase = maxOf(customer, "c_custkey")
    val supplier = read("supplier"); val suppBase = maxOf(supplier, "s_suppkey")
    val part = read("part"); val partBase = maxOf(part, "p_partkey")
    val orders = read("orders"); val orderBase = maxOf(orders, "o_orderkey")
    // the driver has written events.ts as parquet NANOS (surfaces as a
    // raw long — re-written as-is it would reach DuckDB as BIGINT and
    // break every timestamp oracle) and as tz-less MICROS. Normalize to
    // a real microsecond timestamp so both engines read the same type.
    val events = graft.Tables.normalizeTs(read("events"))
    val eventBase = maxOf(events, "event_id")
    val userBase = maxOf(events, "user_id")
    val docs = read("documents"); val docBase = maxOf(docs, "doc_id")
    val embs = read("embeddings"); val vecBase = maxOf(embs, "vec_id")

    // one replica index column per copy; shift keys by i*base
    def replicate(df: DataFrame)(remap: (DataFrame, Column) => DataFrame): DataFrame = {
      val copies = (0 until factor).map(i => remap(df, lit(i.toLong)))
      copies.reduce(_ unionByName _)
    }

    write(replicate(customer)((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + i * custBase)), "customer")
    write(replicate(supplier)((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + i * suppBase)), "supplier")
    write(replicate(part)((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + i * partBase)), "part")
    write(replicate(orders)((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + i * orderBase)
        .withColumn("o_custkey", col("o_custkey") + i * custBase)), "orders")
    write(replicate(read("lineitem"))((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + i * orderBase)
        .withColumn("l_partkey", col("l_partkey") + i * partBase)
        .withColumn("l_suppkey", col("l_suppkey") + i * suppBase)), "lineitem")
    write(replicate(events)((df, i) =>
      df.withColumn("event_id", col("event_id") + i * eventBase)
        .withColumn("user_id", col("user_id") + i * userBase)), "events")
    write(replicate(docs)((df, i) =>
      df.withColumn("doc_id", col("doc_id") + i * docBase)
        .withColumn("text",
          when(i === 0, col("text"))
            .otherwise(concat(lit("r"), i.cast("string"), lit(" "), col("text"))))
        .withColumn("n_chars", length(col("text")))), "documents")
    // replicas get a cyclic element ROTATION (lag 7i) with hash-seeded
    // sign flips — distinct vectors with the same distribution, NOT
    // near-clones: tiny per-element perturbation would manufacture
    // 10-deep near-tie clusters whose kNN ranks are sensitive to
    // sub-1e-6 arithmetic-order differences between engines (no real
    // corpus growth produces that shape, and it breaks rank oracles)
    // derive the embedding dim from the data (a hardcoded dim would
    // silently corrupt rotated vectors for any other corpus) and
    // require it uniform — the rotation indexes modulo dim
    val dim = embs.select(size(col("embedding")).as("d")).distinct().collect() match {
      case Array(r) => r.getInt(0)
      case many => throw new IllegalArgumentException(
        s"embeddings must share one dim, found ${many.map(_.getInt(0)).sorted.mkString(",")}")
    }
    write(replicate(embs)((df, i) => {
      val rotated = transform(col("embedding"), (_, pos) =>
        (element_at(col("embedding"),
            (pmod(pos + i * 7, lit(dim)) + 1).cast("int")) *
          (lit(1) - lit(2) * pmod(xxhash64(i, pos), lit(2L)).cast("int"))).cast("float"))
      df.withColumn("vec_id", col("vec_id") + i * vecBase)
        .withColumn("embedding", when(i === 0, col("embedding")).otherwise(rotated))
    }), "embeddings")

    val counts = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"[scaleup] wrote $out at ${factor}x: ${counts.mkString(", ")}")
    spark.stop()
  }
}
