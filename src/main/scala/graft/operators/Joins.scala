package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies mirroring scio's pair-join families, Spark-first.
  *
  * scio offers shuffle joins (PairSCollectionFunctions.join:~L200),
  * map-side hash joins (PairHashSCollectionFunctions.hashJoin),
  * skew-aware joins (PairSkewedSCollectionFunctions.skewedJoin, CMS
  * hot-key split) and Bloom-prefiltered sparse joins
  * (PairSCollectionFunctions.sparseJoin). On Spark the equivalents
  * are: Catalyst SMJ/shuffled-hash (default), `broadcast()` hints,
  * salted joins + AQE skew handling, and a sketch-prefiltered join.
  *
  * All helpers keep the plan declarative so pushdown/pruning/AQE
  * still apply; at 100 TB the decisions below (broadcast vs shuffle,
  * salt fanout, prefilter) are exactly the knobs that matter.
  */
object Joins {

  /** scio hashJoin: replicate the small side to every task — Spark's
    * broadcast hash join. Use when `right` fits comfortably on one
    * executor (dimension tables).
    */
  def hashJoin(left: DataFrame, right: DataFrame, on: Column, how: String = "inner"): DataFrame =
    left.join(broadcast(right), on, how)

  /** scio skewedJoin: decouple hot keys from the shuffle by salting.
    * Left rows get a random salt in [0, fanout); right rows are
    * replicated once per salt. The shuffle key becomes (key, salt) so
    * a hot key spreads over `fanout` reducers. AQE's skew-join split
    * handles residual imbalance at runtime.
    *
    * Only left-preserving modes are allowed: with the right side
    * replicated `fanout`×, an unmatched right row would survive once
    * per salt under right/full outer — those modes are rejected
    * rather than silently wrong (salt the right side instead by
    * swapping the arguments).
    *
    * Use when `right` is too big to broadcast but small enough to
    * replicate `fanout`×, and `left` has known hot keys.
    */
  def skewedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], fanout: Int,
                 how: String = "inner"): DataFrame = {
    require(fanout > 0, s"fanout must be positive, got $fanout")
    requireLeftPreserving(how, "skewedJoin")
    val salt = "__graft_salt"
    val l = left.withColumn(salt, (rand(42) * fanout).cast("int"))
    val r = right.withColumn(salt, explode(sequence(lit(0), lit(fanout - 1))))
    l.join(r, keys :+ salt, how).drop(salt)
  }

  // no "cross": an equi-join on (keys :+ salt) with Cross type
  // degenerates to inner
  private val leftPreservingModes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  private def requireLeftPreserving(how: String, op: String): Unit =
    require(leftPreservingModes.contains(how.toLowerCase.replace(" ", "")),
      s"$op supports left-preserving modes only (got '$how'): right/full outer " +
        "would duplicate unmatched right rows once per salt — swap the sides instead")

  /** scio's full skewedJoin semantics (PairSkewedSCollectionFunctions
    * .skewedJoin, CMS-based): detect the hot keys first, then fan out
    * ONLY those — cold keys take the plain shuffle join and the right
    * side is replicated solely for the hot-key subset. At 100 TB this
    * is the difference between replicating a dimension table `fanout`×
    * (plain [[skewedJoin]]) and replicating a handful of hot rows.
    *
    * Hot-key detection is a seeded sample of the left side (scio uses
    * a Count-Min Sketch over a sample; a sampled exact groupBy-count
    * is the Spark-declarative equivalent — the sample is tiny, the
    * count partial-aggregates map-side, and the resulting hot-key
    * frame is at most #distinct-sampled-keys rows, broadcast to both
    * sides). Detection is approximate; CORRECTNESS is not: every key
    * lands in exactly one of the hot/cold branches (semi/anti against
    * the same hot-key frame on both sides), and both branches are
    * exact joins, so the union equals the plain join for every
    * supported mode — the same contract JoinsSpec pins for the other
    * strategies.
    *
    * @param hotKeyThreshold estimated left-rows-per-key above which a
    *                        key is treated as hot (scio's default 9000)
    * @param sampleFraction  left-side sample rate for detection
    */
  def skewedJoinSampled(left: DataFrame, right: DataFrame, keys: Seq[String],
                        fanout: Int, how: String = "inner",
                        hotKeyThreshold: Long = 9000L,
                        sampleFraction: Double = 0.01): DataFrame = {
    require(hotKeyThreshold > 0, s"hotKeyThreshold must be positive, got $hotKeyThreshold")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    requireLeftPreserving(how, "skewedJoinSampled") // before the eager detection job
    // ≥1 sampled hit can clear a small threshold×fraction — require ≥2
    // so a single straggler row can't mark its key hot.
    val sampledCut = math.max((hotKeyThreshold * sampleFraction).toLong, 2L)
    // localCheckpoint (eager, like sparseJoin's stat.bloomFilter):
    // the hot-key frame feeds four subtrees (semi/anti on both sides);
    // without materialization Catalyst plans the sample+count scan
    // once per subtree — four extra passes over the big left side.
    val hotKeys = left.select(keys.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= sampledCut)
      .drop("__graft_n")
      .localCheckpoint()
    val leftHot = left.join(broadcast(hotKeys), keys, "left_semi")
    val leftCold = left.join(broadcast(hotKeys), keys, "left_anti")
    val rightHot = right.join(broadcast(hotKeys), keys, "left_semi")
    val rightCold = right.join(broadcast(hotKeys), keys, "left_anti")
    skewedJoin(leftHot, rightHot, keys, fanout, how)
      .unionByName(leftCold.join(rightCold, keys, how))
  }

  /** scio's literal CMS skewedJoin (PairSkewedSCollectionFunctions
    * .skewedJoin builds an Algebird CMS over the left keys): hot-key
    * detection via a Count-Min sketch over the FULL left side, then
    * the hot/cold split is a pure MAP-SIDE codegen filter — no
    * hot-key frame, no broadcast semi/anti joins at all (the four
    * broadcast probes [[skewedJoinSampled]] needs). Both sides
    * classify each key through the same sketch on the same key hash,
    * so the split is consistent; CMS only OVERcounts, so a truly hot
    * key can never be missed — a cold key promoted by collision just
    * takes the (correct) fanout path. Detection costs one extra
    * aggregation pass over the left keys; the sketch rides to
    * executors inside the task binary.
    *
    * MEASURED (SKEW_r16.json, 20M rows, 30% hot): max-task wall 2.2×
    * and max-task shuffle records 11.4× better than the plain join —
    * the identical spread as [[skewedJoinSampled]] — but total wall
    * ABOVE plain at this corpus (5.4 vs 4.2 s): the exact CMS build
    * is a full pass where sampled pays a 1% scan, and the hot/cold
    * split filters the left side twice. Prefer [[skewedJoinSampled]]
    * whenever a sample can see the hot keys (any corpus whose hot
    * shares are percent-scale); this verb's niche is distributions
    * with many keys NEAR `hotKeyThreshold` (sampling variance would
    * misclassify them — CMS is exact-or-overcount) or callers that
    * already own the key histogram from another pass.
    */
  def skewedJoinCms(left: DataFrame, right: DataFrame, keys: Seq[String],
                    fanout: Int, how: String = "inner",
                    hotKeyThreshold: Long = 9000L,
                    eps: Double = 1e-5, confidence: Double = 0.99): DataFrame = {
    require(hotKeyThreshold > 0, s"hotKeyThreshold must be positive, got $hotKeyThreshold")
    requireLeftPreserving(how, "skewedJoinCms") // before the eager build job
    // composed keys → one 64-bit hash (collisions only promote a cold
    // key to the hot path, which stays correct)
    val kh = xxhash64(keys.map(col): _*)
    val cms = graft.hash.GraftCms.build(
      left.select(kh.as("__graft_kh")), "__graft_kh", eps, confidence)
    val isHot = graft.hash.GraftCms.estimate(kh, cms) >= hotKeyThreshold
    skewedJoin(left.filter(isHot), right.filter(isHot), keys, fanout, how)
      .unionByName(left.filter(!isHot).join(right.filter(!isHot), keys, how))
  }

  /** scio sparseJoin/sparseLookup: when the keyed (right) side is far
    * smaller than the big (left) side but too big to broadcast
    * exactly, prefilter the big side with a Bloom filter over the
    * right keys before the shuffle. False positives only cost shuffle
    * bytes; false negatives are impossible — so semantics are exact
    * for every supported mode:
    *   - inner/left_semi: Bloom-rejected left rows cannot match — drop.
    *   - left/full outer: rejected rows are provably unmatched — they
    *     re-enter the result null-padded, without being shuffled.
    *   - left_anti: rejected rows are part of the answer directly.
    * Right-outer modes would need the prefilter on the other side;
    * call with the sides swapped.
    */
  /** Build a Bloom filter over `keysFrom(key)` and return the probe
    * column for `probed(key)`. Build, key-type gate, and probe
    * representation all live in [[graft.hash.GraftBloom]] (the
    * persistent-artifact API — these per-join filters are the
    * build-inline special case); the probe is the native codegen
    * BloomProbe kernel, not a boxed UDF: it runs on the BIG side's
    * every row, inside whole-stage codegen.
    */
  private def bloomPrefilter(keysFrom: DataFrame, probed: DataFrame, key: String,
                             expectedKeys: Long, fpp: Double, op: String): Column = {
    graft.hash.GraftBloom.requireBloomableKey(keysFrom, key, op)
    graft.hash.GraftBloom.requireBloomableKey(probed, key, op) // sole probed-side type gate
    val bf = keysFrom.stat.bloomFilter(key, expectedKeys, fpp)
    graft.hash.GraftBloom.probe(probed, key, bf)
  }

  def sparseJoin(left: DataFrame, right: DataFrame, key: String,
                 expectedRightKeys: Long = 1000000L, fpp: Double = 0.01,
                 how: String = "inner"): DataFrame = {
    val probe = bloomPrefilter(right, left, key, expectedRightKeys, fpp, "sparseJoin")
    how.toLowerCase.replace(" ", "") match {
      case "inner" | "left_semi" | "leftsemi" =>
        left.filter(probe).join(right, Seq(key), how)
      case "left" | "left_outer" | "leftouter" | "full" | "full_outer" | "fullouter" | "outer" =>
        val nullPadded = left.filter(!probe)
          .join(right.limit(0), Seq(key), "left") // null right columns, no shuffle
        left.filter(probe).join(right, Seq(key), how).unionByName(nullPadded)
      case "left_anti" | "leftanti" =>
        left.filter(probe).join(right, Seq(key), "left_anti").unionByName(left.filter(!probe))
      case other =>
        throw new IllegalArgumentException(
          s"sparseJoin supports inner/left/full/left_semi/left_anti (got '$other'); " +
            "for right-preserving modes swap the sides")
    }
  }

  /** scio sparseLookup (PairSCollectionFunctions.sparseLookup:~L438):
    * for each left row, the values from `right` sharing its key —
    * when `left`'s key set is far smaller than `right` but too big to
    * broadcast exactly. The Bloom filter is built over the LEFT keys
    * and prefilters the big right side before its group-shuffle, so
    * right rows that can't match never cross the network. Exact:
    * false positives survive the prefilter but find no left row in
    * the final join; false negatives are impossible.
    *
    * Returns every left row with a sorted `outputCol` array (default
    * `<rightVal>s`; empty when nothing matched — scio's empty
    * Iterable). The output column must not already exist on `left` —
    * a silent coalesce/withColumn over an existing column would
    * overwrite left data. For two rhs sides, apply twice (scio's
    * sparseLookup2 is the same cogroup).
    */
  def sparseLookup(left: DataFrame, right: DataFrame, key: String, rightVal: String,
                   expectedLeftKeys: Long = 1000000L, fpp: Double = 0.01,
                   outputCol: Option[String] = None): DataFrame = {
    val probe = bloomPrefilter(left, right, key, expectedLeftKeys, fpp, "sparseLookup")
    val outCol = outputCol.getOrElse(s"${rightVal}s")
    require(!left.columns.contains(outCol),
      s"sparseLookup output column '$outCol' already exists on the left side; " +
        "pass outputCol to choose a non-colliding name")
    val grouped = right.filter(probe)
      .groupBy(col(key))
      .agg(sort_array(collect_list(col(rightVal))).as(outCol))
    val emptyArr = array().cast(grouped.schema(outCol).dataType)
    left.join(grouped, Seq(key), "left")
      .withColumn(outCol, coalesce(col(outCol), emptyArr))
  }

  /** scio sparseIntersectByKey (PairSCollectionFunctions:~L919): keep
    * left rows whose key appears in `right`, Bloom-prefiltering the
    * big left side before the semi-join shuffle. Exact: the semi join
    * eliminates Bloom false positives; false negatives are impossible.
    */
  def sparseIntersectByKey(left: DataFrame, right: DataFrame, key: String,
                           expectedRightKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val probe = bloomPrefilter(right, left, key, expectedRightKeys, fpp, "sparseIntersectByKey")
    left.filter(probe).join(right, Seq(key), "left_semi")
  }

  /** scio hashFilter (SCollection.scala:~L754): keep left rows whose
    * key is present in the (small, broadcast) right side — a broadcast
    * semi join, the map-side analogue of intersectByKey.
    */
  def hashFilter(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(broadcast(right.select(col(key)).distinct()), Seq(key), "left_semi")

  /** scio intersectByKey / hashIntersectByKey → left-semi join. */
  def semiJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_semi")

  /** scio subtractByKey / hashSubtractByKey → left-anti join. */
  def antiJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left_anti")

  /** scio withHotKeyFanout: two-phase aggregation — pre-aggregate on
    * (key, salt), then merge per key. Spark's hash aggregate is
    * already partial (map-side combine), so this only pays off when a
    * single reducer key overwhelms even the merge phase; exposed for
    * parity and for non-algebraic payloads.
    */
  def fanoutAgg(df: DataFrame, keys: Seq[String], fanout: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salt = "__graft_salt"
    df.withColumn(salt, (rand(42) * fanout).cast("int"))
      .groupBy((keys :+ salt).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** scio cogroup/groupWith for two keyed frames: per key, the sorted
    * list of values from each side, full-outer joined. Arrays are
    * sorted so downstream consumers see deterministic groups.
    */
  def cogroup(left: DataFrame, right: DataFrame, key: String,
              leftVal: String, rightVal: String): DataFrame =
    cogroupN(Seq((left, leftVal), (right, rightVal)), key)

  /** scio cogroup/groupWith (SCollection arity 2–4) and MultiJoin
    * .cogroup up to 22 sides (reference scio-core util/MultiJoin.scala):
    * per key, one sorted value array per input. Every side aggregates
    * to one row per key before joining, so the join fan-out is 1:1 and
    * the full-outer chain stays linear in the number of sides; the
    * using-column join coalesces the key at each step, so a key absent
    * from the first sides still lands on the same output row.
    */
  def cogroupN(sides: Seq[(DataFrame, String)], key: String): DataFrame = {
    require(sides.size >= 2 && sides.size <= 22,
      "cogroupN supports 2-22 sides (as the reference's MultiJoin)")
    require(sides.map(_._2).distinct.size == sides.size,
      s"value column names must be distinct (each becomes a '<name>s' output column); " +
        s"got ${sides.map(_._2).mkString(", ")} — rename the clashing columns first")
    sides.map { case (df, valCol) =>
      df.groupBy(col(key)).agg(sort_array(collect_list(col(valCol))).as(s"${valCol}s"))
    }.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
  }
}
