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

  /** Whole-document bin packing, length-bucketed: place each doc
    * UNSPLIT into a fixed-capacity bin (SFT / inference batching,
    * where the concat-then-chunk packing above is wrong because a doc
    * must not straddle sequences). Docs group by exact token length;
    * a length-ℓ class packs ⌊capacity/ℓ⌋ docs per bin in id order —
    * the deterministic, shuffle-friendly approximation of first-fit-
    * decreasing (homogeneous-length bins trade some fill for a plan
    * with ONE hash shuffle and a per-class WindowGroupLimit-free
    * rank; the classic greedy is inherently sequential). Bins are
    * identified by (bin_len, bin_seq); `fill_frac` reports the bin's
    * ⌊C/ℓ⌋·ℓ/C packing efficiency. Docs longer than `capacity` get
    * bin_seq −1 (overflow — truncate or split upstream) and
    * zero-token docs get bin_seq −2 (empty): flagged, never silently
    * dropped, never a null bin id.
    *
    * Skew contract: the window key is (n_tokens, salt) — a
    * deterministic md5 salt of the doc id in [0, `salts`) — NOT
    * n_tokens alone. A corpus of uniform document lengths (exactly
    * what a chunked/budget-trimmed corpus looks like) would otherwise
    * route every row into ONE window partition: a single linear
    * straggler task at 100 TB. Bins never span salts — placement
    * within a salt is rank arithmetic in id order, and the global
    * `bin_seq` encodes (in-salt bin, salt) as `bin · salts + salt`,
    * so placement stays deterministic and reshuffle-stable. The cost
    * is at most one underfilled bin per (length, salt) instead of one
    * per length; `salts = 1` recovers the unsalted layout.
    *
    * PLACEMENT-CONTRACT NOTE (r12): the salted default changes
    * `bin_seq` values relative to the pre-r12 unsalted layout.
    * Placement remains deterministic for a given `salts`, but
    * consumers holding bin assignments produced by an earlier version
    * must either re-bin or pass `salts = 1` explicitly. A one-time
    * log line records the active fanout so upgrading callers notice
    * the layout change at runtime, not just in this doc.
    *
    * SIZING (r13): the default 16 is a fixed fanout — at 100 TB a
    * single ultra-hot length class still divides into only 16 window
    * tasks. Size it as `salts ≈ hottestLengthRows / targetRowsPerTask`
    * ([[binPackSaltsFor]] is that formula as code): e.g. 50 M docs of
    * one length at ~2 M rows/task wants salts ≈ 25. Oversizing is
    * cheap — the cost is at most one underfilled bin per
    * (length, salt) — so round up. `salts = 1` keeps the pre-r12
    * layout but accepts one linear task for the hottest length.
    *
    * Returns (id, n_tokens, bin_len, bin_seq, fill_frac).
    */
  def binPack(df: DataFrame, idCol: String, textCol: String,
              capacity: Int, salts: Int = 16): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    if (salts > 1) logSaltsOnce(salts)
    val counted = df.select(col(idCol).as("id"),
      size(tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"),
      graft.operators.Splits.assignShard(col(idCol), salts, "binpack").as("__salt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_tokens"), col("__salt")).orderBy(col("id"))
    counted
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__pb", expr(s"${capacity}L div nullif(n_tokens, 0)"))
      .select(col("id"), col("n_tokens"),
        col("n_tokens").as("bin_len"),
        // zero-token docs would make capacity div n_tokens NULL and the
        // bin id would silently vanish from inner-join consumers — flag
        // them like overflow docs instead (-2: empty, -1: too long)
        when(col("n_tokens") === 0L, lit(-2L))
          .when(col("n_tokens") > capacity, lit(-1L))
          .otherwise(expr("(__rk - 1) div __pb") * salts + col("__salt")).as("bin_seq"),
        when(col("n_tokens") === 0L || col("n_tokens") > capacity, lit(0.0))
          .otherwise(round(col("__pb") * col("n_tokens") / capacity.toDouble, 6))
          .as("fill_frac"))
  }

  /** The [[binPack]] salts sizing formula as code: enough salts that
    * the hottest length class spreads to ~`targetRowsPerTask` rows
    * per window task. Ceil division, floor 1.
    */
  def binPackSaltsFor(hottestLengthRows: Long, targetRowsPerTask: Long): Int = {
    require(hottestLengthRows >= 0, s"hottestLengthRows must be >= 0, got $hottestLengthRows")
    require(targetRowsPerTask >= 1, s"targetRowsPerTask must be >= 1, got $targetRowsPerTask")
    math.max(1L, (hottestLengthRows + targetRowsPerTask - 1) / targetRowsPerTask)
      .min(Int.MaxValue.toLong).toInt
  }

  /** One-time notice that the salted (post-r12) bin layout is active:
    * callers upgrading across the default change get a runtime signal
    * that `bin_seq` values differ from pre-r12 assignments.
    */
  private val saltsLogged = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def logSaltsOnce(salts: Int): Unit =
    if (saltsLogged.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"binPack: salted window layout active (salts=$salts); bin_seq values differ " +
          "from the pre-r12 unsalted layout — pass salts=1 to recover it, see scaladoc")

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

  /** Fill-in-the-middle transformation (Bavarian et al. 2022, the
    * FIM recipe infilling-capable code/text models pretrain with):
    * a deterministic `fimRate` fraction of docs is rewritten into
    * PSM order — prefix, suffix, middle, each introduced by a
    * sentinel — so the model learns to infill; the rest pass through
    * verbatim. Document selection AND both character cut points are
    * pure md5 integer arithmetic over (seed, id): reshuffle-stable,
    * growth-stable, and reproducible by the SQL oracle (no RNG state,
    * unlike the paper's runtime sampling — determinism is what makes
    * the transform auditable at corpus scale). Cuts are character-
    * level (the paper's context-level splitting); sentinels are
    * caller-visible constants. Output adds: `fim` (selected),
    * `fim_text` (PSM rendering, or the original text when not
    * selected). Pure per-row projection — no shuffle, no UDF.
    */
  val FimPrefix = "<|fim_pre|>"
  val FimSuffix = "<|fim_suf|>"
  val FimMiddle = "<|fim_mid|>"

  /** Deterministic masked-LM corruption (BERT-style denoising): each
    * whitespace token masks independently when its md5 coordinate
    * falls under `maskRate`; RUNS of masked tokens collapse to one
    * `<mask>` sentinel (span-corruption shape without sentinel
    * numbering — numbering needs a per-row prefix sum, O(n²) as a
    * HOF, and the unnumbered form is what a masked-LM objective
    * consumes). Adds `masked_text` (sentinel-collapsed rendering),
    * `targets` (the masked tokens, in order), `n_masked`. Selection
    * is md5(seed:id:position) integer arithmetic — reshuffle/growth
    * stable, SQL-reproducible, and a fresh seed per epoch gives
    * independent corruption. Pure per-row builtin array exprs: the
    * run-collapse is a lag compare (mask_i && !mask_{i-1}), never a
    * sequential fold.
    */
  def maskCorrupt(df: DataFrame, idCol: String, textCol: String,
                  maskRate: Double, seed: String,
                  sentinel: String = "<mask>"): DataFrame = {
    require(maskRate >= 0 && maskRate <= 1, s"maskRate must be in [0, 1], got $maskRate")
    val toks = tokens(coalesce(col(textCol).cast("string"), lit("")))
    val idxs = sequence(lit(1), size(toks))
    def maskedAt(i: org.apache.spark.sql.Column) =
      graft.expressions.Md5Head.md5HeadF(concat_ws(":", lit(seed),
        col(idCol).cast("string"), i.cast("string")), 8) * lit(1000000L) <
        lit(math.floor(maskRate * 1e6).toLong * (1L << 32))
    // rendering: keep unmasked tokens; a masked token emits the
    // sentinel only when it STARTS a run (previous token unmasked or
    // absent); empty strings filter out before the join
    val pieces = transform(idxs, i =>
      when(!maskedAt(i), element_at(toks, i))
        .when(i === 1 || !maskedAt(i - 1), lit(sentinel))
        .otherwise(lit("")))
    val targets = filter(transform(idxs, i =>
      when(maskedAt(i), element_at(toks, i)).otherwise(lit(""))), p => p =!= "")
    df.withColumn("masked_text",
        concat_ws(" ", filter(pieces, p => p =!= "")))
      .withColumn("targets", targets)
      .withColumn("n_masked", size(targets).cast("long"))
  }

  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   fimRate: Double, seed: String): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1, s"fimRate must be in [0, 1], got $fimRate")
    def h32(tag: String) = conv(substring(
      md5(concat_ws(":", lit(seed), lit(tag), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val text = coalesce(col(textCol).cast("string"), lit(""))
    val len = length(text).cast("long")
    // rate quantized to a 1e-6 grid, integer threshold compare — the
    // same no-fp-crosses-row-fate rule as Splits.mixtureSample
    val selected = h32("pick") * lit(1000000L) <
      lit(math.floor(fimRate * 1e6).toLong * (1L << 32))
    val cutA = pmod(h32("cutA"), len + 1L)
    val cutB = pmod(h32("cutB"), len + 1L)
    val lo = least(cutA, cutB)
    val hi = greatest(cutA, cutB)
    // substring is 1-based; prefix = [1, lo], middle = (lo, hi], suffix = (hi, len]
    val rendered = concat(
      lit(FimPrefix), text.substr(lit(1), lo.cast("int")),
      lit(FimSuffix), text.substr((hi + 1L).cast("int"), (len - hi).cast("int")),
      lit(FimMiddle), text.substr((lo + 1L).cast("int"), (hi - lo).cast("int")))
    df.withColumn("fim", selected)
      .withColumn("fim_text", when(selected, rendered).otherwise(text))
  }
}
