package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fuzzy record linkage / entity resolution: edit-distance matching of
  * short strings (names, titles, addresses) under a cheap blocking
  * key — the classic blocking-then-verify shape scio pipelines build
  * from groupBy + flatMap (and graft's text dedup uses for documents;
  * this is the record-field counterpart of Dedup.blockedJaccardPairs).
  *
  * Scale shape: candidates only ever form WITHIN a block, blocks
  * above `maxBlock` are excluded from pair generation (the size check
  * is a window count inside the blocking shuffle, not a join) so no
  * degenerate key goes quadratic, and the Levenshtein verify runs on
  * the blocked candidates only — never all pairs. Same hot-bucket
  * contract as Dedup.minhashPairs.
  */
object Linkage {

  /** Default blocker: (length band, first char) — cheap, null-safe,
    * and edit-distance-compatible only as a HEURISTIC (a first-char
    * edit escapes the block; callers needing recall guarantees pass a
    * stronger blocker set via `blockers`).
    */
  def lengthPrefixBlock(c: Column): Column =
    concat_ws("|", (length(c) / lit(4)).cast("int"), substring(c, 1, 1))

  /** Near-match pairs within one table: (id_a, id_b, str_a, str_b,
    * dist) with id_a < id_b and Levenshtein distance ≤ `maxDist`,
    * candidate-blocked by `blocker(strCol)`. Rows with null strings
    * drop; `maxBlock` caps pathological blocks (dropped blocks trade
    * recall for a bound, the disclosed contract).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
                 blocker: Column => Column = lengthPrefixBlock,
                 maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val base = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"), blocker(col(strCol)).as("__blk"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .filter(col("__bn") <= maxBlock)
      .drop("__bn")
    base.as("a").join(base.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      // cheap length prefilter before the O(len²) edit-distance verify
      .filter(abs(length(col("a.__s")) - length(col("b.__s"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a.__s"), col("b.__s")))
      .filter(col("dist") <= maxDist)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__s").as("str_a"), col("b.__s").as("str_b"), col("dist"))
  }

  /** Fuzzy lookup join: each left row matched to right rows whose
    * `rightStr` is within `maxDist` edits of `leftStr`, blocked the
    * same way on both sides. Unmatched left rows are NOT retained
    * (inner semantics); compose with a left_anti for the residue.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftStr: String, rightStr: String,
                maxDist: Int, blocker: Column => Column = lengthPrefixBlock,
                maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val l = left.filter(col(leftStr).isNotNull)
      .withColumn("__blk", blocker(col(leftStr)))
    val r = right.filter(col(rightStr).isNotNull)
      .withColumn("__blk", blocker(col(rightStr)))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .filter(col("__bn") <= maxBlock)
      .drop("__bn")
    l.join(r, Seq("__blk"))
      .filter(abs(length(col(leftStr)) - length(col(rightStr))) <= maxDist)
      .withColumn("dist", levenshtein(col(leftStr), col(rightStr)))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }
}
