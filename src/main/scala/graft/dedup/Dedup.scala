package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines.
  *
  * Shapes follow the standard large-corpus dedup playbook: content
  * hashing for exact dups; MinHash+LSH banding for near-dups (shuffle
  * is by band bucket — at 100 TB the only all-to-all movement is the
  * banded candidate join, never an n² comparison); SimHash buckets for
  * cheap structural near-dups; blocked pairwise n-gram Jaccard where
  * an exact similarity is required.
  *
  * Outputs are cluster assignments (doc → cluster, keep-flag), the
  * form a dedup pipeline actually consumes — pair lists are an
  * intermediate.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct content with
    * the deterministic keeper (min id) and multiplicity.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash signatures + LSH band buckets per doc. */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
                         shingleK: Int, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    df.select(col(idCol).as("id"), array_distinct(shingleHashes(col(textCol), shingleK)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("bandhashes", lshBandHashes(col("sig"), bands, rowsPerBand))
  }

  /** MinHash+LSH near-dup clustering (single min-propagation pass):
    * each doc's cluster is the min doc id among all docs sharing any
    * band bucket with it (itself included, so every doc is assigned).
    * For corpora with dense dup chains, iterate to a fixpoint;
    * one pass resolves the common pairwise-dup case.
    */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val sigs = signatures(df, idCol, textCol, shingleK, numHashes, bands)
    val exploded = sigs.select(col("id"),
      posexplode(col("bandhashes")).as(Seq("band", "bh")))
    val bucketMin = exploded.groupBy(col("band"), col("bh"))
      .agg(min(col("id")).as("bucket_min"))
    exploded.join(bucketMin, Seq("band", "bh"))
      .groupBy(col("id"))
      .agg(min(col("bucket_min")).as("cluster"))
      .withColumn("keep", col("id") === col("cluster"))
  }

  /** Candidate near-dup pairs from LSH banding with exact Jaccard
    * verification. `bands`/`numHashes` tune the similarity threshold
    * (collision prob ≈ 1-(1-j^r)^b, r = numHashes/bands).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, numHashes: Int = 128, bands: Int = 64): DataFrame = {
    val sigs = signatures(df, idCol, textCol, shingleK, numHashes, bands)
    val exploded = sigs.select(col("id"), posexplode(col("bandhashes")).as(Seq("band", "bh")))
    val cand = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sh = sigs.select(col("id"), col("sh"))
    cand
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** SimHash clustering: docs sharing the full 64-bit signature are
    * structural near-dups. For hamming-distance-k matching, join on
    * signature chunks (pigeonhole) — exposed via `simhashPairs`.
    */
  def simhashClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      simhash64(transform(tokens(col(textCol)), t => xxhash64(t))).as("simhash"))
    hashed.groupBy(col("simhash")).agg(min(col("id")).as("cluster"), count(lit(1)).as("n"))
      .join(hashed, Seq("simhash"))
      .select(col("id"), col("simhash"), col("cluster"), (col("id") === col("cluster")).as("keep"))
  }

  /** SimHash near-dup pairs within hamming distance `maxDist`,
    * candidate-blocked by 16-bit signature chunks (pigeonhole: any
    * pair within hamming 3 shares at least one of 4 chunks).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      simhash64(transform(tokens(col(textCol)), t => xxhash64(t))).as("simhash"))
    val chunked = hashed.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", hammingDist(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Blocked exact n-gram Jaccard: pairwise similarity within a
    * blocking key (never across the whole corpus). Returns all pairs
    * in a block with their exact shingle-set Jaccard.
    */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCol: String, shingleK: Int = 3): DataFrame = {
    val sh = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      array_distinct(shingleHashes(col(textCol), shingleK)).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.block").as("block"), col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
  }
}
