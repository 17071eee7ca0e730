package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.{Avro, Protobuf, Smb, Sources, TfExample, TfRecord}
import QueryDsl._

/** IO formats + sort-merge-bucket coverage (SURVEY §2 "IO" and
  * "Sort-merge-bucket"). Each roundtrip query writes the driver's
  * parquet data out through a format and reads it back, so the SAME
  * DuckDB oracle (over the original parquet) hash-checks the format's
  * read+write fidelity, not just rows>0.
  */
object IoQueries extends QueryPack {

  /** Per-JVM scratch token ([[QueryDsl.runToken]] — shared so every
    * pack's static oracle SQL and scratch paths agree), also keyed
    * into SMB metastore table names.
    */
  private val runToken: String = QueryDsl.runToken

  /** Tokenized scratch would otherwise accumulate one dir per run:
    * sweep sibling token dirs untouched for 24h+ (never the live one).
    * The cutoff is far above any plausible run length because a token
    * dir's mtime is only refreshed when that run calls tmp() — a
    * concurrent run that front-loads its IO queries and then does
    * hours of non-IO work must not have its live scratch (including
    * SMB table data) swept out from under it by a younger sibling.
    */
  private lazy val sweepStale: Unit = {
    val root = new java.io.File("/tmp/graft_io")
    val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.getName != runToken && d.lastModified() < cutoff)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** Run-scoped scratch for q_manifest — dir-INDEPENDENT because the
    * static oracle SQL must embed the same path the query writes (one
    * sf dir per Verify JVM, so no collision; concurrent runs are
    * separated by the token like all other scratch).
    */
  private def manifestBase: String = {
    val mine = new java.io.File(s"/tmp/graft_io/$runToken/manifest")
    mine.mkdirs()
    mine.getAbsolutePath
  }

  private def tmp(dir: String, leaf: String): String = {
    sweepStale
    // keep the live token dir's mtime fresh: nested writes don't bump
    // it, and a sibling run's sweep keys off this timestamp
    val mine = new java.io.File(s"/tmp/graft_io/$runToken")
    mine.mkdirs()
    mine.setLastModified(System.currentTimeMillis())
    s"/tmp/graft_io/$runToken/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$leaf"
  }

  /** Write-once SMB layout per (JVM, sf dir): q_smb_join times the
    * exchange-free JOIN, not the one-time bucketed write (q_smb_write
    * carries the write's own number). The two table writes are
    * independent Spark jobs — submitted concurrently so the scheduler
    * interleaves their tasks instead of idling through two sequential
    * write barriers.
    */
  private val smbCache = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def smbJoinTables(s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    smbCache.computeIfAbsent(dir, { _ =>
      val t = tables(s, dir)
      val base = tmp(dir, "smb")
      val (lTable, oTable) = (s"graft_smb_lineitem_$runToken", s"graft_smb_orders_$runToken")
      // 32 buckets = one write task and one join partition per local
      // core; at cluster scale pick buckets ≈ executor-core count ×
      // small multiple for the same reason.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes = Seq(
        Future(Smb.writeBucketed(t.lineitem.select(col("l_orderkey"), col("l_quantity")),
          lTable, s"$base/lineitem", buckets = 32, Seq("l_orderkey"))),
        Future(Smb.writeBucketed(t.orders.select(col("o_orderkey"), col("o_orderpriority")),
          oTable, s"$base/orders", buckets = 32, Seq("o_orderkey"))))
      writes.foreach(Await.result(_, Duration.Inf))
      (lTable, oTable)
    })

  /** Run-once staging for q_stream_dynamic: the AvailableNow stream
    * writes its batch trees once per (JVM, sf dir) — a re-invocation
    * must reuse the finished checkpoint, not re-stage the source
    * (whose fresh part-file names would read as new data and double
    * every row).
    */
  private val streamDynCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def streamDynTree(s: org.apache.spark.sql.SparkSession, dir: String): String =
    streamDynCache.computeIfAbsent(dir, { _ =>
      val src = tmp(dir, "stream_dyn_src")
      val out = tmp(dir, "stream_dyn_out")
      val ckp = tmp(dir, "stream_dyn_ckp")
      // cross-JVM idempotence: with a stable SPARK_GRAFT_RUN_ID these
      // paths survive the JVM, and re-staging fresh part-file names
      // under a SURVIVING checkpoint would read as new data and double
      // every row — wipe all three so each JVM's run is self-contained
      Seq(src, out, ckp).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      // 4-file staging copy → maxFilesPerTrigger(1) yields 4
      // AvailableNow micro-batches; the final cross-batch union is
      // file-assignment-independent, so the staging split needs no
      // determinism of its own
      tables(s, dir).events
        .select(col("event_type").as("dest"),
          concat(col("event_id").cast("long"), lit("|"),
            col("user_id").cast("long")).as("line"))
        .repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val q = graft.streaming.StreamSinks.toDynamicText(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
          out, "dest", "line")
        .option("checkpointLocation", ckp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000)) {
        q.stop() // don't leave it writing scratch + holding cores while Verify continues
        throw new IllegalStateException(
          "q_stream_dynamic: AvailableNow stream did not finish in 300s")
      }
      out
    })

  /** Run-once staging for q_stream_dynamic_parquet — the
    * CARRY-FORWARD fanout variant (r16): same 4-file AvailableNow
    * split, but through StreamSinks.toDynamicParquet with
    * `fanout = Sampled, carryManifest = true`, so batch 0 pays the
    * sampling pass and every later batch sizes its salts from the
    * PREVIOUS batch's manifest (Fanout.FromManifest by construction of
    * StreamSinks.perBatchDynamic — the recurring-export shape on the
    * streaming path). autoTargetRows is pinned low enough that every
    * destination is hot at any sf, and the staging REQUIRES batches
    * 1+ to spread (≥2 shards for some destination): that spread can
    * only have come from the carried manifest.
    */
  private val streamDynParquetCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def streamDynParquetTree(s: org.apache.spark.sql.SparkSession, dir: String): String =
    streamDynParquetCache.computeIfAbsent(dir, { _ =>
      val src = tmp(dir, "stream_dynp_src")
      val out = tmp(dir, "stream_dynp_out")
      val ckp = tmp(dir, "stream_dynp_ckp")
      Seq(src, out, ckp).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      tables(s, dir).events
        .select(col("event_type").as("dest"),
          col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("value").cast("double").as("value"))
        .repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      // streaming queries CLONE the session conf at start: set the
      // fanout sizing before .start() so the clone inherits it,
      // restore after — ~500+ rows per (batch, dest) at the smallest
      // gate sf, so target 200 makes every destination hot
      val prevTarget = s.conf.getOption("spark.graft.dynamic.autoTargetRows")
      s.conf.set("spark.graft.dynamic.autoTargetRows", "200")
      // AQE would re-coalesce the tiny salt partitions at gate sf
      // (real exports sit far past the advisory partition size, where
      // the spread survives — the DynamicSpec/SkewBench precedent);
      // off for the stream so the spread assertion below is meaningful
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = graft.streaming.StreamSinks.toDynamicParquet(
            s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
            out, "dest",
            fanout = graft.sources.Dynamic.Fanout.Sampled, carryManifest = true)
          .option("checkpointLocation", ckp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        if (!q.awaitTermination(300000)) {
          q.stop()
          throw new IllegalStateException(
            "q_stream_dynamic_parquet: AvailableNow stream did not finish in 300s")
        }
      } finally {
        s.conf.set("spark.sql.adaptive.enabled", "true")
        prevTarget match {
          case Some(v) => s.conf.set("spark.graft.dynamic.autoTargetRows", v)
          case None => s.conf.unset("spark.graft.dynamic.autoTargetRows")
        }
      }
      val laterBatches = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
        .sortBy(_.getName).drop(1)
      require(laterBatches.nonEmpty, "q_stream_dynamic_parquet needs >= 2 micro-batches")
      laterBatches.foreach { b =>
        val spread = Option(b.listFiles()).getOrElse(Array.empty)
          .filter(d => d.isDirectory && !d.getName.startsWith("_") && !d.getName.startsWith("."))
          .exists(d => d.listFiles().count(_.getName.startsWith("part-")) >= 2)
        require(spread, s"batch ${b.getName}: no destination spread over >1 shard — " +
          "the carried-manifest fanout did not engage")
      }
      out
    })

  override val queries: Map[String, Q] = Map(

    // csv roundtrip (scio-extra csv): schema-preserving via explicit
    // schema on read (inference would widen ints).
    "q_io_csv" -> { (s, dir) =>
      val nation = tables(s, dir).nation
      val path = tmp(dir, "nation_csv")
      Sources.writeCsv(nation, path)
      Sources.readCsv(s, path, Some(nation.schema))
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    },

    // json-lines roundtrip (scio saveAsJsonFile).
    "q_io_json" -> { (s, dir) =>
      val supplier = tables(s, dir).supplier
      val path = tmp(dir, "supplier_json")
      Sources.writeJson(supplier, path)
      Sources.readJson(s, path, Some(supplier.schema))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("s_acctbal"))).as("sum_bal"))
        .orderBy(col("s_nationkey"))
    },

    // text roundtrip (scio textFile/saveAsTextFile): one line per row.
    "q_io_text" -> { (s, dir) =>
      val path = tmp(dir, "nation_text")
      Sources.writeText(tables(s, dir).nation.select(col("n_name")), path)
      Sources.readText(s, path)
        .agg(count(lit(1)).as("n_lines"), min(col("value")).as("first_name"),
          max(col("value")).as("last_name"))
    },

    // readTextWithPath (scio readTextFilesWithPath): the file
    // provenance column, made deterministic by writing the text
    // partitioned by region so the PATH carries the partition value —
    // the per-region regroup only works if input_file_name() reports
    // the right file for every line.
    "q_io_text_path" -> { (s, dir) =>
      val path = tmp(dir, "nation_text_bydir")
      tables(s, dir).nation.select(col("n_name").as("value"), col("n_regionkey"))
        .write.mode("overwrite").partitionBy("n_regionkey").text(path)
      Sources.readTextWithPath(s, path)
        .withColumn("region",
          regexp_extract(col("path"), "n_regionkey=(\\d+)", 1).cast("int"))
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("first_name"),
          max(col("value")).as("last_name"))
        .orderBy(col("region"))
    },

    // object files (scio objectFile/saveAsObjectFile): typed Dataset
    // roundtrip through the tuple Encoder — schema-preserving parquet,
    // not Kryo blobs, read back AS the same type.
    "q_io_object" -> { (s, dir) =>
      import s.implicits._
      val path = tmp(dir, "supplier_object")
      val ds = tables(s, dir).supplier
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .as[(Long, String, Double)]
      Sources.writeObject(ds, path)
      Sources.readObject[(Long, String, Double)](s, path)
        .toDF("s_suppkey", "s_name", "s_acctbal")
        .agg(count(lit(1)).as("n"), min(col("s_name")).as("first_name"),
          sumMoney(dec(col("s_acctbal"))).as("sum_bal"))
    },

    // binaryFile source (scio binaryFile): whole-file bytes + path
    // metadata over files the query just wrote — per-region byte
    // totals must equal the text content written there.
    "q_io_binary" -> { (s, dir) =>
      val path = tmp(dir, "region_text_bin")
      tables(s, dir).region.select(col("r_name").as("value"), col("r_regionkey"))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("r_regionkey").text(path)
      Sources.readBinary(s, path + "/*/*")
        .withColumn("region",
          regexp_extract(col("path"), "r_regionkey=(\\d+)", 1).cast("int"))
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n_files"),
          sum(length(col("content"))).as("n_bytes"))
        .orderBy(col("region"))
    },

    // orc roundtrip: the second columnar format (pushdown/pruning like
    // parquet; avro connector not shipped in this environment).
    "q_io_orc" -> { (s, dir) =>
      val part = tables(s, dir).part
      val path = tmp(dir, "part_orc")
      Sources.writeOrc(part, path)
      Sources.readOrc(s, path)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), r2(avg(col("p_retailprice"))).as("avg_price"))
        .orderBy(col("p_brand"))
    },

    // TFRecord roundtrip (scio-tensorflow saveAsTfRecordFile): the
    // training-data container format — framed bytes with masked
    // crc32c, one shard per partition, file-per-task read.
    "q_io_tfrecord" -> { (s, dir) =>
      val nation = tables(s, dir).nation
      val path = tmp(dir, "nation_tfrecord")
      TfRecord.write(
        nation.select(encode(col("n_name"), "UTF-8").as("value")), path)
      TfRecord.read(s, path)
        .select(decode(col("value"), "UTF-8").as("name"))
        .agg(count(lit(1)).as("n_records"), min(col("name")).as("first_name"),
          max(col("name")).as("last_name"))
    },

    // Avro container files (scio-avro saveAsAvroFile): written with
    // the core Avro library (the spark-avro CONNECTOR is absent, the
    // format library is not), read back through the same public
    // container format — the oracle over the original parquet checks
    // write+read fidelity.
    "q_io_avro" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "supplier_avro")
      Avro.write(tables(s, dir).supplier
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("s_nationkey"), col("s_acctbal")), path)
      Avro.read(s, path, StructType(Seq(
          StructField("s_suppkey", LongType), StructField("s_name", StringType),
          StructField("s_nationkey", LongType), StructField("s_acctbal", DoubleType))))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("s_acctbal"))).as("sum_bal"),
          min(col("s_name")).as("first_name"))
        .orderBy(col("s_nationkey"))
    },

    // Avro nested records + maps + logical types (scio's GenericRecord
    // breadth): a struct-in-struct, a string map, date/timestamp-µs/
    // decimal logical-typed columns — written through the container
    // format, read back, and every piece folded into the oracle-checked
    // aggregate. The decimal rides an integral-derived value so both
    // engines agree bit-exactly; dates/timestamps format to strings per
    // the cross-engine comparison contract.
    "q_io_avro_nested" -> { (s, dir) =>
      val path = tmp(dir, "orders_avro_nested")
      val src = tables(s, dir).orders.select(
        col("o_orderkey").cast("long").as("key"),
        struct(col("o_orderpriority").as("prio"),
          struct(col("o_totalprice").as("price")).as("deep")).as("info"),
        map(lit("status"), col("o_orderstatus")).as("attrs"),
        to_date(col("o_orderdate")).as("day"),
        col("o_orderdate").cast("timestamp").as("ts"),
        (col("o_orderkey") % 1000).cast("decimal(10,2)").as("dec_val"))
      Avro.write(src, path)
      Avro.read(s, path, src.schema)
        .select(col("info.prio").as("prio"), col("info.deep.price").as("price"),
          element_at(col("attrs"), "status").as("status"),
          col("day"), col("ts"), col("dec_val"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("price"))).as("sum_price"),
          sum(col("dec_val")).cast("string").as("sum_dec"),
          min(col("status")).as("min_status"),
          date_format(min(col("day")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .orderBy(col("prio"))
    },

    // typed TFRecord (scio-tensorflow saveAsTfRecordFile): rows →
    // tf.train.Example protos (hand-rolled public wire format) →
    // TFRecord framing → decoded back through a schema. The oracle
    // over the original parquet checks the full proto+framing
    // roundtrip value-exactly.
    "q_io_tfexample" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "nation_tfexample")
      TfExample.write(
        tables(s, dir).nation.select(
          col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey")), path)
      TfExample.read(s, path, StructType(Seq(
          StructField("n_nationkey", LongType), StructField("n_name", StringType),
          StructField("n_regionkey", LongType))))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          max(col("n_nationkey")).as("max_key"))
        .orderBy(col("n_regionkey"))
    },

    // dynamic-path read (scio readFilesAsString): write one text dir,
    // then read it back through a DISTRIBUTED dataset of its part-file
    // paths — the executors open the files, not the driver. The path
    // listing goes through the Hadoop FileSystem API (globStatus), so
    // the query shape works against HDFS/object-store trees, not just
    // local disk. Oracle = the same lines straight from parquet.
    "q_io_readfiles" -> { (s, dir) =>
      import s.implicits._
      val path = tmp(dir, "nation_readfiles")
      Sources.writeText(tables(s, dir).nation.select(col("n_name")), path)
      val glob = new org.apache.hadoop.fs.Path(s"$path/part-*")
      val fs = glob.getFileSystem(s.sparkContext.hadoopConfiguration)
      val partFiles = fs.globStatus(glob).map(_.getPath.toString).toSeq.sorted
      Sources.readTextFiles(partFiles.toDS().repartition(4)).toDF("n_name")
        .agg(count(lit(1)).as("n_lines"), min(col("n_name")).as("first_name"),
          max(col("n_name")).as("last_name"))
    },

    // scio-smb bucketed+sorted WRITE, timed on its own (the join below
    // reuses a cached write, so BENCH shows each half's own number).
    // The returned aggregation reads the bucketed table back, so the
    // oracle checks the written content, not just completion.
    "q_smb_write" -> { (s, dir) =>
      val t = tables(s, dir)
      val base = tmp(dir, "smb_write")
      val wTable = s"graft_smbw_lineitem_$runToken"
      Smb.writeBucketed(t.lineitem.select(col("l_orderkey"), col("l_quantity")),
        wTable, s"$base/lineitem", buckets = 32, Seq("l_orderkey"))
      s.table(wTable)
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
    },

    // Resume.chain: marker-committed stage checkpointing — the whole
    // two-stage pipeline runs through stage artifacts (first Verify
    // call computes + commits, later calls LOAD the committed parquet),
    // so both the compute and the resume-load path sit on the oracle's
    // critical path.
    "q_resume_chain" -> { (s, dir) =>
      val base = tmp(dir, "resume")
      graft.pipeline.Resume.chain(s, base, tables(s, dir).orders)(
        "project" -> (df => df
          .filter(col("o_orderstatus") =!= "F")
          .select(col("o_orderpriority"), year(col("o_orderdate")).as("yr"),
            col("o_totalprice").cast("decimal(12,2)").as("price"))),
        "agg" -> (df => df
          .groupBy(col("o_orderpriority").as("priority"), col("yr"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("price")), 2).cast("double").as("sum_price"))))
        .orderBy(col("priority"), col("yr"))
    },

    // WebDataset-style tar shards: named binary members through the
    // native USTAR codec (write + read on the critical path; stock
    // GNU-tar interop is pinned in TarSpec).
    "q_io_tar" -> { (s, dir) =>
      val base = tmp(dir, "tar")
      val docs = tables(s, dir).documents
        .select(concat(lit("doc_"), col("doc_id").cast("string"), lit(".txt")).as("name"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("value"))
      graft.sources.Tar.write(docs.repartition(8), s"$base/shards")
      graft.sources.Tar.read(s, s"$base/shards")
        .select(col("name"), decode(col("value"), "UTF-8").as("text"))
        .orderBy(col("name"))
    },

    // small-file compaction: scatter documents into 32 tiny parquet
    // files, rewrite to the byte-budgeted layout (clustered on doc_id
    // for min/max pruning), read the COMPACTED tree back — the oracle
    // checks the rewrite preserved every row.
    "q_compact" -> { (s, dir) =>
      val base = tmp(dir, "compact")
      tables(s, dir).documents.select(col("doc_id"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$base/small")
      graft.operators.Layout.compactParquet(s, s"$base/small", s"$base/compacted",
        targetFileBytes = 4L << 20, orderCols = Seq("doc_id"))
      s.read.parquet(s"$base/compacted")
        .orderBy(col("doc_id"))
    },

    // per-file min/max manifest of a clustered parquet tree: compact
    // documents ordered on doc_id, manifest the result — BOTH engines
    // read the very files the query wrote (oracle via read_parquet
    // filename=true at the run-scoped path), so per-file ranges and
    // counts are facts of the written data; file names (uuid-random)
    // are replaced by the rank in disjoint-range order.
    "q_manifest" -> { (s, dir) =>
      val base = manifestBase
      tables(s, dir).documents.select(col("doc_id"), col("source"))
        .repartition(16)
        .write.mode("overwrite").parquet(s"$base/small")
      graft.operators.Layout.compactParquet(s, s"$base/small", s"$base/t",
        targetFileBytes = 16L << 10, orderCols = Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("min_doc_id"))
      graft.operators.Layout.fileManifest(s, s"$base/t", Seq("doc_id"))
        .withColumn("file_rank", row_number().over(w))
        .select(col("file_rank"), col("n_rows"), col("min_doc_id"), col("max_doc_id"))
        .orderBy(col("file_rank"))
    },

    // deterministic sharded training-data export: md5-stable shard
    // assignment → one shard=K dir per shard → read back and profile.
    // The oracle recomputes every per-shard stat straight from the
    // documents table, so the gate checks the written content.
    "q_export_shards" -> { (s, dir) =>
      val base = tmp(dir, "export_shards")
      graft.pipeline.Pack.writeShards(
        tables(s, dir).documents.select(col("doc_id"), col("text")),
        "doc_id", numShards = 16, seed = "shard", outDir = base)
      s.read.parquet(base)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(graft.functions.TextFunctions.tokens(
            coalesce(col("text"), lit(""))))).cast("long").as("n_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("shard"))
    },

    // scio-smb: exchange-free join over bucketed+sorted tables
    // (bucket-pruned SMJ; no-Exchange plan asserted in SmbSpec). The
    // bucketed tables are written ONCE per (JVM, sf dir) — the bench's
    // warmup pass pays the write, timed passes measure the join
    // itself, which is the number that matters: at scale the bucketed
    // layout is written once and joined against many times.
    "q_smb_join" -> { (s, dir) =>
      val (lTable, oTable) = smbJoinTables(s, dir)
      Smb.smbJoin(s, lTable, oTable,
          Seq("l_orderkey"), Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
        .orderBy(col("o_orderpriority"))
    },

    // scio-smb SMBMultiJoin: THREE co-bucketed tables joined on the
    // shared key — every sort-merge join in the chain exchange-free
    // (plan asserted in SmbSpec). The third table is a per-order
    // pre-aggregate, itself bucketed on the same key.
    "q_smb_multi" -> { (s, dir) =>
      val (lTable, oTable) = smbJoinTables(s, dir)
      val cTable = s"graft_smb_cnt_$runToken"
      val cnt = s.table(lTable).groupBy(col("l_orderkey").as("c_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
      Smb.writeBucketed(cnt, cTable, tmp(dir, "smb_cnt"), buckets = 32, Seq("c_orderkey"))
      Smb.smbJoinMulti(s, Seq(lTable -> Seq("l_orderkey"),
          oTable -> Seq("o_orderkey"), cTable -> Seq("c_orderkey")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"),
          sum(col("n_lines")).cast("long").as("lines"))
        .orderBy(col("o_orderpriority"))
    },

    // scio-smb CoGbk (sortMergeCoGroup): per-key row groups from each
    // co-bucketed source with empty (not null) arrays for missing
    // keys; shuffle-free plan asserted in SmbSpec.
    "q_smb_cogroup" -> { (s, dir) =>
      val (lTable, oTable) = smbJoinTables(s, dir)
      Smb.smbCogroup(s, Seq(lTable -> Seq("l_orderkey"), oTable -> Seq("o_orderkey")),
          Seq("orderkey"))
        .select(col("orderkey"),
          size(col(s"${lTable}_rows")).cast("long").as("n_lines"),
          size(col(s"${oTable}_rows")).cast("long").as("n_orders"))
        .orderBy(col("orderkey"))
    },

    // scio-smb SortMergeTransform: co-bucketed join → per-row
    // transform → bucketed write of the result, zero Exchange end to
    // end (asserted in SmbSpec); the oracle recomputes the transformed
    // table's aggregate from the raw inputs, checking the written
    // artifact's content through a read-back.
    "q_smb_transform" -> { (s, dir) =>
      val (lTable, oTable) = smbJoinTables(s, dir)
      val wTable = s"graft_smb_w_$runToken"
      // the cached lineitem table carries (l_orderkey, l_quantity) and
      // orders (o_orderkey, o_orderpriority): weight = qty in exact
      // decimal so both engines agree bit-for-bit
      Smb.smbTransform(s, Seq(lTable -> Seq("l_orderkey"), oTable -> Seq("o_orderkey")))(
        _.select(col("l_orderkey").as("t_orderkey"), col("o_orderpriority"),
          dec(col("l_quantity")).as("weighted")))(
        wTable, tmp(dir, "smb_w"), buckets = 32, Seq("t_orderkey"))
      s.table(wTable)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumMoney(col("weighted")).as("wsum"))
        .orderBy(col("o_orderpriority"))
    },

    // scio-extra sparkey asLargeMapSideInput/largeHashJoin: a side too
    // big to broadcast, written ONCE as a bucketed+sorted table, then
    // probed shuffle-free on the stored side (only the probe moves —
    // plan asserted in SideInputsSpec). The oracle checks the lookup's
    // content against a plain DuckDB left join.
    "q_large_lookup" -> { (s, dir) =>
      val t = tables(s, dir)
      val base = tmp(dir, "large_side")
      val table = s"graft_large_customer_$runToken"
      val side = graft.operators.SideInputs.asLargeMap(
        t.customer.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        table, s"$base/customer", Seq("c_custkey"), buckets = 32)
      side.lookup(t.orders.select(col("o_custkey"), col("o_totalprice")), Seq("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    },

    // generic protobuf file IO (scio saveAsProtobufFile/protobufFile):
    // rows → schema-driven proto3 wire messages → bytes records in
    // Avro containers (scio's exact layout), read back through the
    // same schema. The oracle over the original parquet checks the
    // full proto-encode + container + proto-decode roundtrip
    // value-exactly.
    "q_io_protobuf" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "orders_proto")
      // priority rides as a PROTO ENUM (varint against the declared
      // symbol table) and status inside a proto map<string,string> —
      // both decode back through the oracle-checked aggregate
      val prioEnum = Protobuf.enumMetadata(Seq(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      Protobuf.write(tables(s, dir).orders
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderpriority").as("o_orderpriority", prioEnum),
          col("o_totalprice"),
          map(lit("status"), col("o_orderstatus")).as("attrs")), path)
      Protobuf.read(s, path, StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_orderpriority", StringType, nullable = true, prioEnum),
          StructField("o_totalprice", DoubleType),
          StructField("attrs", MapType(StringType, StringType)))))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("sum_price"),
          max(col("o_orderkey")).as("max_key"),
          min(element_at(col("attrs"), "status")).as("min_status"))
        .orderBy(col("o_orderpriority"))
    },

    // jdbc roundtrip (scio-jdbc jdbcSelect/saveAsJdbc) against
    // embedded Derby — in-process, no external service, identical
    // Spark JDBC surface as any server URL; read back PARTITIONED
    // (the at-scale shape: one connection per stride).
    "q_io_jdbc" -> { (s, dir) =>
      graft.sources.Jdbc.configureDerby()
      val url = s"jdbc:derby:memory:graft_$runToken;create=true"
      graft.sources.Jdbc.write(
        tables(s, dir).customer.select(
          col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"), col("c_acctbal")),
        url, "customer_jdbc", mode = "overwrite")
      graft.sources.Jdbc.readPartitioned(s, url, "customer_jdbc",
          "c_custkey", 0L, 100000L, 8)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"),
          min(col("c_name")).as("first_name"))
        .orderBy(col("c_nationkey"))
    },

    // dynamic per-record destinations (scio saveAsDynamicTextFile):
    // write nation names into one directory PER REGION KEY taken from
    // each row, then gather the whole tree back through
    // readDynamicText — the completion-checked gather verb (not the
    // stock text reader) recovers the destination, so the marker
    // contract and per-file line decode sit on the oracle's critical
    // path alongside the scatter.
    "q_io_dynamic" -> { (s, dir) =>
      val path = tmp(dir, "nation_dynamic")
      graft.sources.Dynamic.saveAsDynamicText(
        tables(s, dir).nation.select(
          concat(lit("region="), col("n_regionkey")).as("dest"), col("n_name")),
        path, "dest", "n_name")
      // audit = true: the gather REFUSES the tree unless the
      // manifest-vs-listing diff is clean — the opt-in integrity check
      // on the oracle's critical path (r16)
      graft.sources.Dynamic.readDynamicText(s, path, audit = true)
        .select(regexp_extract(col("dest"), "region=(\\d+)", 1)
          .cast("int").as("n_regionkey"), col("text").as("n_name"))
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"),
          max(col("n_name")).as("last_name"))
        .orderBy(col("n_regionkey"))
    },

    // dynamic TAR destinations (WebDataset-style per-domain shards —
    // the multimodal export container): parts scattered into one USTAR
    // archive per brand, members named by part key, payload = the part
    // name's bytes; gathered via readDynamicTar (checksum-verified
    // member walk), so framing, padding and the per-destination tree
    // all sit on the oracle path.
    "q_io_dynamic_tar" -> { (s, dir) =>
      val path = tmp(dir, "part_dynamic_tar")
      graft.sources.Dynamic.saveAsDynamicTar(
        tables(s, dir).part.select(
          col("p_brand").as("dest"),
          concat(lit("part-"), col("p_partkey").cast("long"), lit(".txt")).as("name"),
          encode(col("p_name"), "UTF-8").as("value")),
        path, "dest")
      graft.sources.Dynamic.readDynamicTar(s, path)
        .select(col("dest"), col("name"),
          decode(col("value"), "UTF-8").as("p_name"))
        .groupBy(col("dest"))
        .agg(count(lit(1)).as("n"), min(col("name")).as("first_member"),
          max(col("name")).as("last_member"), min(col("p_name")).as("first_name"),
          sum(length(col("p_name"))).as("name_chars"))
        .orderBy(col("dest"))
    },

    // dynamic-destination MANIFEST: the scatter stamps one hidden TSV
    // line per committed file (dest, file, rows, bytes); for the text
    // codec both ROWS and BYTES are SQL-computable (utf8 line length
    // + newline), and fanout=1 co-locates each destination into
    // exactly one task → exactly one file — so the whole audit record
    // (row counts, byte totals, file counts) is oracle-exact without
    // the oracle ever seeing the tree.
    "q_io_dynamic_manifest" -> { (s, dir) =>
      val path = tmp(dir, "orders_dynamic_manifest")
      graft.sources.Dynamic.saveAsDynamicText(
        tables(s, dir).orders.select(
          col("o_orderpriority").as("dest"),
          concat(col("o_orderkey").cast("long"), lit("|"), col("o_orderstatus"))
            .as("line")),
        path, "dest", "line")
      // r16: the metadata-only AUDIT rides the oracle path too — the
      // manifest-vs-listing diff of the tree just written must be
      // EMPTY, asserted as a zero count the oracle pins to literal 0
      // (a lost rename or stray file would break the hash compare)
      val audit = graft.sources.Dynamic.verifyDynamicTree(s, path)
        .agg(count(lit(1)).as("n_audit_issues"))
      graft.sources.Dynamic.readDynamicManifest(s, path)
        .groupBy(col("dest"))
        .agg(sum(col("rows")).as("n_rows"), sum(col("bytes")).as("n_bytes"),
          count(lit(1)).as("n_files"))
        .crossJoin(audit)
        .orderBy(col("dest"))
    },

    // dynamic PARQUET destinations (scio-parquet types/dynamic
    // saveAsDynamicParquetFile): parts scattered into per-(type,
    // brand) parquet shard-sets — the destination carries a SPACE and
    // a '#' (brand names), so the URL-encoded input_file_name ↔
    // decoded listing normalization is on the oracle's critical path —
    // gathered via readDynamicParquet (stock spark.read.parquet under
    // the hood: interop and the graft verb proven together).
    "q_io_dynamic_parquet" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "part_dynamic_parquet")
      graft.sources.Dynamic.saveAsDynamicParquet(
        tables(s, dir).part.select(
          concat(col("p_type"), lit(" parts/"), col("p_brand")).as("dest"),
          col("p_partkey").cast("long").as("p_partkey"), col("p_name"),
          col("p_size").cast("int").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice")),
        path, "dest")
      graft.sources.Dynamic.readDynamicParquet(s, path, StructType(Seq(
          StructField("p_partkey", LongType), StructField("p_name", StringType),
          StructField("p_size", IntegerType),
          StructField("p_retailprice", DoubleType))))
        .groupBy(col("dest"))
        // decimal money sum: associative, bit-equal at every scale (the
        // round(sum(double)) form straddled a 2dp boundary at sf10 in q1)
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("p_retailprice"))).as("sum_price"),
          min(col("p_name")).as("first_name"), max(col("p_partkey")).as("max_key"),
          r2(avg(col("p_size"))).as("avg_size"))
        .orderBy(col("dest"))
    },

    // dynamic CSV GATHER leg: where q_io_dynamic_csv proves RFC 4180
    // interop through STOCK spark.read.csv, this one puts the graft
    // gather verb (readDynamicCsv — completion check, dialect
    // pre-wiring, dest-recovery join, null vs empty-string sentinel)
    // on the oracle path, including a column that mixes nulls and
    // non-null EMPTY strings.
    "q_io_dynamic_csv_gather" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "customer_dynamic_csv_gather")
      graft.sources.Dynamic.saveAsDynamicCsv(
        tables(s, dir).customer.select(
          concat(lit("nation="), col("c_nationkey").cast("long")).as("dest"),
          col("c_custkey").cast("long").as("c_custkey"),
          when(col("c_acctbal") < 0, lit(""))
            .when(col("c_acctbal") > 9000, lit(null).cast("string"))
            .otherwise(col("c_name")).as("note"),
          col("c_acctbal").cast("double").as("c_acctbal")),
        path, "dest")
      graft.sources.Dynamic.readDynamicCsv(s, path, StructType(Seq(
          StructField("c_custkey", LongType), StructField("note", StringType),
          StructField("c_acctbal", DoubleType))))
        .groupBy(col("dest"))
        .agg(count(lit(1)).as("n"), count(col("note")).as("n_notes"),
          sum(when(col("note") === "", 1L).otherwise(0L)).as("n_empty"),
          min(when(col("note") =!= "", col("note"))).as("first_note"),
          sumMoney(dec(col("c_acctbal"))).as("sum_bal"))
        .orderBy(col("dest"))
    },

    // r15: STREAMING dynamic sink, oracle-gated end to end (the
    // q_windowed_join pattern lifted to the SINK side): a
    // Trigger.AvailableNow stream drives the events table through
    // StreamSinks.toDynamicText in several micro-batches
    // (maxFilesPerTrigger=1 over a 4-file staging copy), each batch
    // scattering into its own per-batch dynamic tree; the graft
    // gather verb then reads EVERY batch dir back (completion check
    // per batch) and the cross-batch union must reproduce the plain
    // batch answer hash-exactly — micro-batch engine, foreachBatch
    // wrapper, per-batch commit protocol and gather all on the
    // oracle's critical path.
    "q_stream_dynamic" -> { (s, dir) =>
      val out = streamDynTree(s, dir)
      val batchDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
        .map(_.getAbsolutePath).sorted.toSeq
      require(batchDirs.size >= 2,
        s"q_stream_dynamic expected >= 2 micro-batch trees, got ${batchDirs.size}")
      batchDirs.map(p => graft.sources.Dynamic.readDynamicText(s, p))
        .reduce(_ unionByName _)
        .select(col("dest"),
          split(col("text"), "\\|").getItem(0).cast("long").as("event_id"),
          split(col("text"), "\\|").getItem(1).cast("long").as("user_id"))
        .groupBy(col("dest"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id")).as("sum_eid"), min(col("event_id")).as("min_eid"),
          max(col("event_id")).as("max_eid"))
        .orderBy(col("dest"))
    },

    // r16: STREAMING dynamic PARQUET sink with CARRY-FORWARD fanout
    // oracle-gated end to end: 4 AvailableNow micro-batches through
    // StreamSinks.toDynamicParquet (fanout = Sampled,
    // carryManifest = true — batch 0 samples, batches 1+ size salts
    // from batch N−1's manifest; staging REQUIRES the later batches to
    // have spread, which only the carried manifest can cause), each
    // batch's per-destination parquet tree gathered back through
    // readDynamicParquet with audit = true (manifest-vs-listing diff
    // clean per batch dir), and the cross-batch union must reproduce
    // the plain batch answer hash-exactly.
    "q_stream_dynamic_parquet" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val out = streamDynParquetTree(s, dir)
      val batchDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
        .map(_.getAbsolutePath).sorted.toSeq
      require(batchDirs.size >= 2,
        s"q_stream_dynamic_parquet expected >= 2 micro-batch trees, got ${batchDirs.size}")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType)))
      batchDirs.map(p =>
          graft.sources.Dynamic.readDynamicParquet(s, p, schema, audit = true))
        .reduce(_ unionByName _)
        .groupBy(col("dest"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id")).as("sum_eid"), max(col("event_id")).as("max_eid"),
          sumMoney(dec(col("value"))).as("sum_val"))
        .orderBy(col("dest"))
    },

    // dynamic AVRO destinations (scio saveAsDynamicAvroFile): scatter
    // suppliers into one Avro-container shard-set PER NATION taken
    // from each row, then gather the whole tree back through
    // readDynamicAvro — the recovered `dest` column (not the original
    // table) drives the group-by, so schema mapping, container
    // write, tree listing and record decode are all on the oracle's
    // critical path.
    "q_io_dynamic_avro" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "supplier_dynamic_avro")
      graft.sources.Dynamic.saveAsDynamicAvro(
        tables(s, dir).supplier.select(
          concat(lit("nation="), col("s_nationkey").cast("long")).as("dest"),
          col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
          col("s_acctbal").cast("double").as("s_acctbal")),
        path, "dest")
      graft.sources.Dynamic.readDynamicAvro(s, path, StructType(Seq(
          StructField("s_suppkey", LongType), StructField("s_name", StringType),
          StructField("s_acctbal", DoubleType))))
        .select(regexp_extract(col("dest"), "nation=(\\d+)", 1).cast("long")
          .as("s_nationkey"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("s_acctbal"))).as("sum_bal"),
          min(col("s_name")).as("first_name"), max(col("s_suppkey")).as("max_key"))
        .orderBy(col("s_nationkey"))
    },

    // dynamic PROTOBUF destinations (scio saveAsDynamicProtobufFile):
    // orders scattered per priority as proto3 messages in scio's
    // bytes-in-Avro container layout, gathered via readDynamicProtobuf
    // — wire encode/decode AND the per-destination tree both sit on
    // the oracle path.
    "q_io_dynamic_proto" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "orders_dynamic_proto")
      graft.sources.Dynamic.saveAsDynamicProtobuf(
        tables(s, dir).orders.select(
          col("o_orderpriority").as("dest"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("o_orderstatus")),
        path, "dest")
      graft.sources.Dynamic.readDynamicProtobuf(s, path, StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType),
          StructField("o_orderstatus", StringType))))
        .groupBy(col("dest").as("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("sum_price"),
          max(col("o_orderkey")).as("max_key"), min(col("o_orderstatus")).as("min_status"))
        .orderBy(col("o_orderpriority"))
    },

    // dynamic CSV destinations (scio-extra dynamic csv): customers
    // scattered per market segment with an embedded-comma note column
    // (RFC 4180 quoting on the critical path), gathered by STOCK
    // spark.read.csv — destination recovered from the file path.
    "q_io_dynamic_csv" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val path = tmp(dir, "customer_dynamic_csv")
      graft.sources.Dynamic.saveAsDynamicCsv(
        tables(s, dir).customer.select(
          col("c_mktsegment").as("dest"),
          col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          concat(col("c_name"), lit(", bal: "),
            col("c_acctbal").cast("decimal(12,2)").cast("string")).as("note"),
          col("c_acctbal").cast("double").as("c_acctbal")),
        path, "dest")
      s.read.option("header", "true").option("escape", "\"")
        .option("recursiveFileLookup", "true")
        .schema(StructType(Seq(
          StructField("c_custkey", LongType), StructField("c_name", StringType),
          StructField("note", StringType), StructField("c_acctbal", DoubleType))))
        .csv(path)
        .select(regexp_extract(input_file_name(), "customer_dynamic_csv/([^/]+)/", 1)
          .as("c_mktsegment"), col("c_custkey"), col("c_name"), col("note"),
          col("c_acctbal"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"),
          min(col("c_name")).as("first_name"), max(col("note")).as("max_note"))
        .orderBy(col("c_mktsegment"))
    },

    // persistent Bloom artifact (scio ApproxFilter): build the filter
    // over orders' customer keys ONCE, persist it, read it back, and
    // prefilter customers with the LOADED artifact before an exact
    // semi join — Bloom-rejected rows are provably orderless and skip
    // the shuffle; the exact join cancels false positives, so the
    // result is oracle-exact while the save/load roundtrip is on the
    // critical path of the answer.
    "q_bloom_persist" -> { (s, dir) =>
      val t = tables(s, dir)
      val path = tmp(dir, "bloom_artifact") + "/orders_custkeys.bloom"
      val bf = graft.hash.GraftBloom.build(
        t.orders.select(col("o_custkey")), "o_custkey", expectedKeys = 500000L, fpp = 0.01)
      graft.hash.GraftBloom.write(s, bf, path)
      val loaded = graft.hash.GraftBloom.read(s, path)
      graft.hash.GraftBloom.filterByBloom(t.customer, "c_custkey", loaded)
        .join(t.orders.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_customers"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_io_csv" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_io_json" ->
      """SELECT s_nationkey, count(*) AS n, CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_io_text" ->
      """SELECT count(*) AS n_lines, min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation""".stripMargin,
    "q_io_text_path" ->
      """SELECT n_regionkey AS region, count(*) AS n, min(n_name) AS first_name,
        |  max(n_name) AS last_name
        |FROM nation GROUP BY 1 ORDER BY region""".stripMargin,
    "q_io_object" ->
      """SELECT count(*) AS n, min(s_name) AS first_name,
        |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM supplier""".stripMargin,
    // one coalesced writer task => exactly one file per region dir;
    // file bytes = name + trailing newline
    "q_io_binary" ->
      """SELECT r_regionkey AS region, CAST(1 AS BIGINT) AS n_files,
        |  CAST(length(r_name) + 1 AS BIGINT) AS n_bytes
        |FROM region ORDER BY region""".stripMargin,
    "q_io_orc" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_io_tfrecord" ->
      """SELECT count(*) AS n_records, min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation""".stripMargin,
    "q_resume_chain" ->
      """SELECT o_orderpriority AS priority, CAST(year(o_orderdate) AS INT) AS yr,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus <> 'F'
        |GROUP BY 1, 2 ORDER BY priority, yr""".stripMargin,
    "q_io_readfiles" ->
      """SELECT count(*) AS n_lines, min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation""".stripMargin,
    "q_smb_join" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_smb_write" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty FROM lineitem""",
    "q_smb_multi" ->
      """WITH cnt AS (
        |  SELECT l_orderkey AS c_orderkey, count(*) AS n_lines
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  CAST(sum(n_lines) AS BIGINT) AS lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cnt ON l_orderkey = c_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_smb_cogroup" ->
      """WITH l AS (SELECT l_orderkey AS k, count(*) AS nl FROM lineitem GROUP BY 1),
        |     o AS (SELECT o_orderkey AS k, count(*) AS no FROM orders GROUP BY 1)
        |SELECT coalesce(l.k, o.k) AS orderkey,
        |  CAST(coalesce(nl, 0) AS BIGINT) AS n_lines,
        |  CAST(coalesce(no, 0) AS BIGINT) AS n_orders
        |FROM l FULL JOIN o ON l.k = o.k ORDER BY orderkey""".stripMargin,
    "q_smb_transform" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS wsum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_compact" ->
      """SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id""",
    "q_manifest" ->
      s"""WITH m AS (
         |  SELECT filename, count(*) AS n_rows,
         |    min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |  FROM read_parquet('$manifestBase/t/*.parquet', filename=true)
         |  GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY min_doc_id) AS INT) AS file_rank,
         |  n_rows, min_doc_id, max_doc_id
         |FROM m ORDER BY file_rank""".stripMargin,
    "q_io_tar" ->
      """SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
        |  coalesce(text, '') AS text
        |FROM documents ORDER BY name""".stripMargin,
    "q_export_shards" ->
      """WITH h AS (
        |  SELECT doc_id, text,
        |    CAST(CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) % 16 AS BIGINT) AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+'))) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,
    "q_large_lookup" ->
      """SELECT c_mktsegment, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_io_protobuf" ->
      """SELECT o_orderpriority, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key, min(o_orderstatus) AS min_status
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_bloom_persist" ->
      """SELECT count(*) AS n_customers, CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q_io_jdbc" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal, min(c_name) AS first_name
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_io_dynamic" ->
      """SELECT CAST(n_regionkey AS INT) AS n_regionkey, count(*) AS n,
        |  min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_io_avro" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
        |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal, min(s_name) AS first_name
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_stream_dynamic" ->
      """SELECT event_type AS dest, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS sum_eid,
        |  CAST(min(event_id) AS BIGINT) AS min_eid,
        |  CAST(max(event_id) AS BIGINT) AS max_eid
        |FROM events GROUP BY 1 ORDER BY dest""".stripMargin,
    "q_stream_dynamic_parquet" ->
      """SELECT event_type AS dest, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(event_id) AS BIGINT) AS sum_eid,
        |  CAST(max(event_id) AS BIGINT) AS max_eid,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1 ORDER BY dest""".stripMargin,
    "q_io_dynamic_avro" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
        |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal, min(s_name) AS first_name,
        |  CAST(max(s_suppkey) AS BIGINT) AS max_key
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_io_dynamic_proto" ->
      """SELECT o_orderpriority, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key, min(o_orderstatus) AS min_status
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_io_dynamic_csv" ->
      """SELECT c_mktsegment, count(*) AS n, CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal,
        |  min(c_name) AS first_name,
        |  max(c_name || ', bal: ' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR))
        |    AS max_note
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_io_dynamic_tar" ->
      """SELECT p_brand AS dest, count(*) AS n,
        |  min('part-' || CAST(CAST(p_partkey AS BIGINT) AS VARCHAR) || '.txt')
        |    AS first_member,
        |  max('part-' || CAST(CAST(p_partkey AS BIGINT) AS VARCHAR) || '.txt')
        |    AS last_member,
        |  min(p_name) AS first_name,
        |  CAST(sum(length(p_name)) AS BIGINT) AS name_chars
        |FROM part GROUP BY 1 ORDER BY dest""".stripMargin,
    "q_io_dynamic_manifest" ->
      """SELECT o_orderpriority AS dest, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(strlen(CAST(CAST(o_orderkey AS BIGINT) AS VARCHAR)
        |    || '|' || o_orderstatus) + 1) AS BIGINT) AS n_bytes,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(0 AS BIGINT) AS n_audit_issues
        |FROM orders GROUP BY 1 ORDER BY dest""".stripMargin,
    "q_io_dynamic_parquet" ->
      """SELECT p_type || ' parts/' || p_brand AS dest, count(*) AS n,
        |  CAST(round(sum(CAST(p_retailprice AS DECIMAL(12,2))), 2) AS DOUBLE)
        |    AS sum_price, min(p_name) AS first_name,
        |  CAST(max(p_partkey) AS BIGINT) AS max_key,
        |  round(avg(p_size), 2) AS avg_size
        |FROM part GROUP BY 1 ORDER BY dest""".stripMargin,
    "q_io_dynamic_csv_gather" ->
      """SELECT dest, count(*) AS n, count(note) AS n_notes,
        |  CAST(sum(CASE WHEN note = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        |  min(nullif(note, '')) AS first_note,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM (
        |  SELECT 'nation=' || CAST(CAST(c_nationkey AS BIGINT) AS VARCHAR) AS dest,
        |    CASE WHEN c_acctbal < 0 THEN ''
        |         WHEN c_acctbal > 9000 THEN NULL
        |         ELSE c_name END AS note,
        |    c_acctbal
        |  FROM customer)
        |GROUP BY dest ORDER BY dest""".stripMargin,
    "q_io_avro_nested" ->
      """SELECT o_orderpriority AS prio, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(o_orderkey % 1000 AS DECIMAL(10,2))) AS VARCHAR) AS sum_dec,
        |  min(o_orderstatus) AS min_status,
        |  strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_day,
        |  strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_io_tfexample" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
        |  min(n_name) AS first_name, CAST(max(n_nationkey) AS BIGINT) AS max_key
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
  )
}
