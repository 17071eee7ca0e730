package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time temporal joins — the enrichment joins a training-data /
  * analytics pipeline needs that Spark's DataFrame API lacks as named
  * operators (reference intent: Beam/scio users hand-roll these with
  * stateful DoFns; DuckDB/kdb expose ASOF JOIN natively).
  *
  * Execution shape is the point. The naive form — an inequality join
  * (`l.ts >= r.ts`) plus row_number — plans a range join whose
  * candidate set is O(left × right-per-key) and goes quadratic on hot
  * keys; at 100 TB that is the job that never finishes. Everything
  * here instead UNIONs the tagged sides and takes ONE keyed
  * last/first-ignoreNulls window pass: one shuffle by key, one linear
  * sort pass, O(left + right) work.
  *
  * Skew bound, stated honestly: WindowExec partitions do NOT
  * AQE-skew-split (only shuffle-join sides do), so one ultra-hot key
  * = one straggler task. The work stays LINEAR in that key's row
  * count (single sort + one running-last pass, spill-backed), which
  * is the survivable kind of straggler — unlike the range join's
  * quadratic blowup — but a key holding a double-digit share of a
  * 100 TB input still serializes on one core. For that corpus shape
  * use [[asofJoinChunked]]: (key, time-chunk) window keys with
  * per-chunk seed carry-forward — same semantics (TemporalSpec pins
  * the equivalence), skew spread by the chunk fan-out.
  */
object Temporal {

  /** Integral floor division for long columns. The Column `/` operator
    * divides in DOUBLE, which misrounds above 2^53 — a nanosecond
    * epoch (~1.7e18) bucketed through double division can land in the
    * wrong chunk and silently drop a valid as-of match. `l - pmod` is
    * the exact floor multiple (pmod keeps negatives floored), and the
    * remaining division is exact by construction, done in `div`
    * (IntegralDivide) so no double ever appears.
    */
  private def floorDiv(c: Column, n: Long): Column = {
    val l = c.cast("long")
    call_function("div", l - pmod(l, lit(n)), lit(n))
  }

  /** As-of join: for every left row, the single most recent right row
    * with `right.ts <= left.ts` (direction `backward`, the default;
    * equality included) or the earliest with `right.ts >= left.ts`
    * (`forward`), matched per `key` — latest-dimension-state
    * enrichment (market data, feature stores, attribution).
    *
    * Left-outer semantics: every left row survives; `valueCols` (and
    * `matchedTsCol` if requested) are null when no right row
    * qualifies. `toleranceSec` additionally nulls matches farther
    * than the bound from the left timestamp (pandas merge_asof
    * tolerance). The gap compares WHOLE seconds (timestamp→long
    * truncation): a 7200.3 s gap passes a 7200 s tolerance — the
    * sub-second part never disqualifies a match (sf1-gate-verified
    * contract; oracles must mirror the truncation).
    *
    * Right-side ties on (key, ts) resolve last-wins in unspecified
    * order — pre-aggregate the right side to unique (key, ts) for
    * deterministic output (TemporalSpec and q_asof_join do).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, valueCols: Seq[String],
               direction: String = "backward",
               toleranceSec: Option[Long] = None,
               matchedTsCol: Option[String] = None): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one right value column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val collisions = (valueCols ++ matchedTsCol).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"output columns [${collisions.mkString(", ")}] already exist on the left side")

    val ts = "__asof_ts"; val side = "__asof_side"; val mts = "__asof_mts"
    // At equal ts the right row must fall INSIDE the left row's frame:
    // backward frames end at current row → right sorts before left;
    // forward frames start at current row → right sorts after.
    val (rightTag, leftTag) = if (direction == "backward") (0, 1) else (2, 1)
    val leftPayload = left.columns.filterNot(_ == key).toSeq
    val rightSide = right.select(
      col(key) +: col(rightTs).as(ts) +: lit(rightTag).as(side) +:
        col(rightTs).as(mts) +: valueCols.map(col) ++:
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      col(key) +: col(leftTs).as(ts) +: lit(leftTag).as(side) +:
        lit(null).cast(right.schema(rightTs).dataType).as(mts) +:
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++:
        leftPayload.map(col): _*)

    val ordered = Window.partitionBy(col(key)).orderBy(col(ts), col(side))
    val (frame, pick) =
      if (direction == "backward")
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          (c: Column) => last(c, ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))

    val matchedTs = pick(col(mts)).over(frame)
    val withinTol = toleranceSec match {
      case None => matchedTs.isNotNull
      case Some(tol) =>
        val gap =
          if (direction == "backward") col(ts).cast("long") - matchedTs.cast("long")
          else matchedTs.cast("long") - col(ts).cast("long")
        matchedTs.isNotNull && gap <= tol
    }
    val enriched = rightSide.unionByName(leftSide)
      .select(
        col(key) +: col(ts) +: col(side) +:
          valueCols.map(c => when(withinTol, pick(col(c)).over(frame)).as(c)) ++:
          matchedTsCol.map(c => when(withinTol, matchedTs).as(c)).toSeq ++:
          leftPayload.map(col): _*)
    // back to the left's shape: original columns in order (the left
    // payload still carries leftTs), then the enrichment columns
    enriched.filter(col(side) === leftTag)
      .select(left.columns.map(col) ++: valueCols.map(col) ++:
        matchedTsCol.map(col).toSeq: _*)
  }

  /** Hot-key as-of join: identical semantics to [[asofJoin]] (both
    * `direction`s), but the window key is (key, time-chunk) instead of
    * key — an ultra-hot key's rows spread over (time-range /
    * chunkSize) tasks instead of serializing on one core (the
    * straggler bound documented on [[asofJoin]]).
    *
    * Mechanics: each chunk needs the nearest right row from OUTSIDE
    * the chunk as a seed (backward: the latest right row from earlier
    * chunks; forward: the earliest from later ones). Seeds are
    * computed at CHUNK granularity — per (key, chunk) the right side
    * reduces to its edge row (one window pass, linear), and seed
    * assignment is a recursive [[asofJoin]] over the tiny chunk-level
    * table (rows = distinct (key, chunk), independent of row skew).
    * A backward seed sorts before every real row in its chunk
    * (chunk-start sort ts, side tag −1); a forward seed sorts after
    * every real row (next-chunk-start sort ts — strictly greater than
    * any in-chunk timestamp, including fractional seconds that a
    * chunk-end marker would tie with). Any in-chunk right row closer
    * to the left row still wins.
    *
    * `chunkSize` is in the timestamp column's units after a long cast
    * (seconds for timestamp columns). Pick it so a hot key's densest
    * chunk fits one task comfortably: smaller chunks = more spread,
    * more seed rows. Right-side (key, ts) ties resolve as in
    * [[asofJoin]].
    */
  def asofJoinChunked(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, valueCols: Seq[String],
                      chunkSize: Long,
                      direction: String = "backward",
                      toleranceSec: Option[Long] = None,
                      matchedTsCol: Option[String] = None): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(valueCols.nonEmpty, "asofJoinChunked needs at least one right value column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val backward = direction == "backward"
    val collisions = (valueCols ++ matchedTsCol).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"output columns [${collisions.mkString(", ")}] already exist on the left side")

    val ts = "__asof_ts"; val side = "__asof_side"; val mts = "__asof_mts"
    val chunk = "__asof_chunk"
    val tsType = right.schema(rightTs).dataType
    def chunkOf(c: Column): Column = floorDiv(c, chunkSize)

    // edge right row per (key, chunk) — linear window pass; backward
    // keeps the chunk's LAST row, forward its FIRST. The original
    // right ts rides along as __seed_ts (a distinct name: it becomes a
    // VALUE column of the chunk-level as-of below, whose own sort
    // column is the chunk index).
    val seedTs = "__seed_ts"
    val rw = Window.partitionBy(col(key), col(chunk))
      .orderBy(if (backward) col(seedTs).desc else col(seedTs).asc)
    val rightChunkEdge = right
      .select(col(key) +: col(rightTs).as(seedTs) +: valueCols.map(col): _*)
      .withColumn(chunk, chunkOf(col(seedTs)))
      .withColumn("__rn", row_number().over(rw))
      .filter(col("__rn") === 1).drop("__rn")

    // seed per left-present (key, chunk): the edge row from the
    // nearest STRICTLY earlier (backward) / later (forward) chunk — a
    // chunk-level as-of join in the same direction (a right chunk c
    // becomes available to left chunks past it: c±1)
    val leftChunks = left
      .select(col(key), chunkOf(col(leftTs)).as(chunk)).distinct()
    val seeds = asofJoin(
      leftChunks.withColumn("__cts", col(chunk)),
      rightChunkEdge.withColumn("__cts",
        if (backward) col(chunk) + 1 else col(chunk) - 1).drop(chunk),
      key, "__cts", "__cts", valueCols :+ seedTs,
      direction = direction,
      matchedTsCol = None)
      .filter(col(seedTs).isNotNull) // chunks with no out-of-chunk right data get no seed
      .drop("__cts")

    val leftPayload = left.columns.filterNot(_ == key).toSeq
    def nulls(cols: Seq[String], schema: org.apache.spark.sql.types.StructType) =
      cols.map(c => lit(null).cast(schema(c).dataType).as(c))

    // tagged sides. Backward sort order: seed (−1) < right (0) <
    // left (1), seed pinned at chunk start. Forward: left (1) <
    // right (2) < seed (3), seed pinned at the NEXT chunk's start —
    // strictly after every real in-chunk row.
    val (rightTag, leftTag, seedTag) = if (backward) (0, 1, -1) else (2, 1, 3)
    val seedSortTs =
      if (backward) (col(chunk) * chunkSize).cast(tsType)
      else ((col(chunk) + 1) * chunkSize).cast(tsType)
    val seedSide = seeds.select(
      col(key) +: seedSortTs.as(ts) +: lit(seedTag).as(side) +:
        col(chunk) +: col(seedTs).cast(tsType).as(mts) +: valueCols.map(col) ++:
        nulls(leftPayload, left.schema): _*)
    val rightSide = right.select(
      col(key) +: col(rightTs).as(ts) +: lit(rightTag).as(side) +:
        chunkOf(col(rightTs)).as(chunk) +: col(rightTs).as(mts) +: valueCols.map(col) ++:
        nulls(leftPayload, left.schema): _*)
    val leftSide = left.select(
      col(key) +: col(leftTs).as(ts) +: lit(leftTag).as(side) +:
        chunkOf(col(leftTs)).as(chunk) +: lit(null).cast(tsType).as(mts) +:
        nulls(valueCols, right.schema) ++: leftPayload.map(col): _*)

    val ordered = Window.partitionBy(col(key), col(chunk)).orderBy(col(ts), col(side))
    val frame =
      if (backward) ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def pick(c: Column): Column =
      (if (backward) last(c, ignoreNulls = true) else first(c, ignoreNulls = true)).over(frame)
    val matchedTs = pick(col(mts))
    val withinTol = toleranceSec match {
      case None => matchedTs.isNotNull
      case Some(tol) =>
        val gap =
          if (backward) col(ts).cast("long") - matchedTs.cast("long")
          else matchedTs.cast("long") - col(ts).cast("long")
        matchedTs.isNotNull && gap <= tol
    }
    seedSide.unionByName(rightSide).unionByName(leftSide)
      .select(
        col(key) +: col(ts) +: col(side) +:
          valueCols.map(c => when(withinTol, pick(col(c))).as(c)) ++:
          matchedTsCol.map(c => when(withinTol, matchedTs).as(c)).toSeq ++:
          leftPayload.map(col): _*)
      .filter(col(side) === 1)
      .select(left.columns.map(col) ++: valueCols.map(col) ++:
        matchedTsCol.map(col).toSeq: _*)
  }

  /** Interval (range-overlap) join: left rows paired with every right
    * row whose [start, end] interval contains the left timestamp,
    * bucketed so it never plans an open-ended range join: both sides
    * are assigned to fixed `bucketSec`-wide time buckets (an interval
    * explodes to each bucket it overlaps), the join runs on
    * (key, bucket) equality — candidate pairs are bounded by bucket
    * co-residency, not key cardinality — and the exact containment
    * predicate filters after. Intervals longer than `maxIntervalSec`
    * are rejected up front: each interval fans out to at most
    * maxIntervalSec/bucketSec + 1 bucket rows (the explode factor is
    * the knob, same contract as Dedup's maxBucket — bounded, stated,
    * never silent).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightStart: String, rightEnd: String,
                   bucketSec: Long = 3600L, maxIntervalSec: Long = 86400L): DataFrame = {
    require(bucketSec > 0 && maxIntervalSec >= bucketSec,
      s"need bucketSec > 0 and maxIntervalSec >= bucketSec (got $bucketSec/$maxIntervalSec)")
    val b = "__iv_bucket"
    val leftB = left.withColumn(b, floorDiv(col(leftTs), bucketSec))
    // the length guard raises AT RUNTIME inside the bucket expression
    // (not as a driver-side pre-scan, which would eagerly execute the
    // right side twice) and cannot be pruned because it feeds the
    // sequence bound
    val endSec = when(
      col(rightEnd).cast("long") - col(rightStart).cast("long") > maxIntervalSec,
      raise_error(concat(
        lit(s"intervalJoin: right interval longer than maxIntervalSec=$maxIntervalSec at "),
        col(rightStart).cast("string"),
        lit("; widen maxIntervalSec (accepting the larger explode factor) or split it")))
        .cast("long"))
      .otherwise(col(rightEnd).cast("long"))
    val rightB = right.withColumn(b, explode(sequence(
      floorDiv(col(rightStart), bucketSec), floorDiv(endSec, bucketSec))))
    leftB.join(rightB, Seq(key, b))
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop(b)
  }

  /** Interval-OVERLAP join: BOTH sides carry [start, end] intervals
    * and a pair matches when they overlap (inclusive endpoints:
    * lStart <= rEnd AND rStart <= lEnd) on the same key — the
    * sessions-overlap / co-occurrence shape [[intervalJoin]]'s
    * point-in-interval form can't express. Same bucketing contract:
    * both sides explode to `bucketSec` buckets, the join runs on
    * (key, bucket) equality, and intervals longer than
    * `maxIntervalSec` are rejected at runtime.
    *
    * An overlapping pair co-resides in EVERY bucket their
    * intersection spans, so the join keeps only the CANONICAL bucket
    * — the one containing max(lStart, rStart), the intersection's
    * first instant, which both intervals necessarily contain. Each
    * overlapping pair therefore emits exactly once with no
    * dedup/distinct pass after the join.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          bucketSec: Long = 3600L,
                          maxIntervalSec: Long = 86400L): DataFrame = {
    require(bucketSec > 0 && maxIntervalSec >= bucketSec,
      s"need bucketSec > 0 and maxIntervalSec >= bucketSec (got $bucketSec/$maxIntervalSec)")
    val b = "__ivo_bucket"
    def guarded(start: String, end: String): Column = when(
      col(end).cast("long") - col(start).cast("long") > maxIntervalSec,
      raise_error(concat(
        lit(s"intervalOverlapJoin: interval longer than maxIntervalSec=$maxIntervalSec at "),
        col(start).cast("string"),
        lit("; widen maxIntervalSec (accepting the larger explode factor) or split it")))
        .cast("long"))
      .otherwise(col(end).cast("long"))
    val leftB = left.withColumn(b, explode(sequence(
      floorDiv(col(leftStart), bucketSec),
      floorDiv(guarded(leftStart, leftEnd), bucketSec))))
    val rightB = right.withColumn(b, explode(sequence(
      floorDiv(col(rightStart), bucketSec),
      floorDiv(guarded(rightStart, rightEnd), bucketSec))))
    leftB.join(rightB, Seq(key, b))
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col(b) === floorDiv(greatest(col(leftStart), col(rightStart)), bucketSec))
      .drop(b)
  }
}
