package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.operators.GlobalOrder

/** Sequence packing for LLM pretraining export: concatenate every
  * document's tokens in corpus (id) order and split the stream into
  * fixed-size context windows — the standard concat-then-chunk
  * packing. Each doc's placement is pure integer arithmetic over its
  * global token offset, which [[GlobalOrder.withGlobalOffset]]
  * computes with one balanced shuffle (never a single-partition
  * window), so the op holds at 100 TB.
  */
object Pack {

  /** Per-doc packing spans: where each document lands in the packed
    * sequence stream. Returns (id, n_tokens, start_offset, first_seq,
    * last_seq, n_seqs): the doc's tokens occupy global positions
    * [start_offset, start_offset + n_tokens) and therefore sequences
    * first_seq..last_seq of size `window`. Token counts follow the
    * whitespace-token contract of [[graft.functions.TextFunctions
    * .tokens]] (an empty/null text is one empty token, so every doc
    * occupies at least one position and none vanishes).
    */
  def sequenceSpans(df: DataFrame, idCol: String, textCol: String,
                    window: Int, numBuckets: Int = 1024): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val counted = df.select(col(idCol).as("id"),
      size(tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))
    GlobalOrder.withGlobalOffset(counted, "id", col("n_tokens"),
        offsetCol = "start_offset", numBuckets = numBuckets)
      .select(col("id"), col("n_tokens"), col("start_offset"),
        // integer `div`, not `/`: long / long is DOUBLE in Spark, and
        // global offsets at corpus scale must not round through it
        expr(s"start_offset div $window").as("first_seq"),
        expr(s"(start_offset + n_tokens - 1) div $window").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** Materialize the packed sequences themselves: every token of
    * every doc, placed at its global position (doc offset + local
    * index) and grouped into fixed `window`-token sequences — the
    * rows a pretraining data loader consumes. The final sequence may
    * be shorter than `window`; no padding (the loader pads).
    *
    * Scale shape: the token array rides THROUGH the prefix-sum (one
    * balanced shuffle) so tokens explode narrowly after it with their
    * doc offset already attached — no second join; then one shuffle
    * groups by sequence id, and sort_array orders tokens in-place
    * (no window function). Sequence rows are bounded by `window`
    * tokens each, so the final aggregation state is small and even.
    */
  def packedSequences(df: DataFrame, idCol: String, textCol: String,
                      window: Int, numBuckets: Int = 1024): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val counted = df.select(col(idCol).as("id"),
      tokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
    GlobalOrder.withGlobalOffset(counted, "id", col("__n"),
        offsetCol = "__off", numBuckets = numBuckets)
      .select(col("__off"), posexplode(col("__toks")).as(Seq("__j", "__tok")))
      .select((col("__off") + col("__j")).as("pos"), col("__tok"))
      .groupBy(expr(s"pos div $window").as("seq_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        array_join(transform(sort_array(collect_list(struct(col("pos"), col("__tok")))),
          s => s.getField("__tok")), " ").as("text"))
  }

  /** Sharded training-data export: each row lands in a deterministic
    * shard ([[graft.operators.Splits.assignShard]] — stable under
    * re-runs and repartitioning, so incremental jobs and their
    * consumers agree on placement forever), written as one Hive-style
    * `shard=K` directory per shard. The pre-write repartition ON the
    * shard id means each shard's files come from one task — without
    * it, every input task would open a writer per shard it touches
    * (tasks × shards small files, the classic partitionBy blowup).
    */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int, seed: String,
                  outDir: String): Unit = {
    df.withColumn("shard",
        graft.operators.Splits.assignShard(col(keyCol), numShards, seed))
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
