package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the co-purchase / co-occurrence
  * analytics scio users compose from groupBy + flatMap (reference:
  * scio-core SCollection groupBy/flatMap verbs): which item pairs
  * appear in the same basket more often than independence predicts.
  */
object Baskets {

  /** Pairwise association rules over (basket, item) rows:
    * (item_a, item_b, support, conf_a_b, conf_b_a, lift) for every
    * unordered pair with `support >= minSupport`, where support is
    * the number of baskets containing BOTH items,
    * conf_a_b = P(b | a basket), and
    * lift = P(a,b) / (P(a)·P(b)) over the basket universe.
    *
    * Scale shape mirrors collocations: items dedup per basket and
    * collect into one SORTED in-task array, pairs generate inside
    * the task via nested array HOFs (quadratic only in the per-basket
    * item count — cap wide baskets upstream), and everything after is
    * hash aggregation + vocabulary-sized marginal joins (AQE
    * broadcast). The basket total is one scalar to the driver.
    * Ordering item_a < item_b makes every pair canonical, so no
    * dedup pass follows the explode.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
      .persist()
    val nBaskets = items.select(col("__b")).distinct().count()
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val arr = col("__items")
    val baskets = items.groupBy(col("__b"))
      .agg(array_sort(collect_set(col("__i"))).as("__items"))
      .filter(size(arr) >= 2)
    val pairRows = baskets.select(explode(flatten(
      transform(sequence(lit(0), size(arr) - 2), i =>
        transform(slice(arr, i + lit(2), size(arr) - i - 1), b =>
          struct(element_at(arr, i + 1).as("a"), b.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
    val pairCounts = pairRows.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairCounts
      .join(itemCounts.select(col("__i").as("a"), col("__ci").as("__ca")), Seq("a"))
      .join(itemCounts.select(col("__i").as("b"), col("__ci").as("__cb")), Seq("b"))
      .select(col("a").as("item_a"), col("b").as("item_b"), col("support"),
        (col("support").cast("double") / col("__ca")).as("conf_a_b"),
        (col("support").cast("double") / col("__cb")).as("conf_b_a"),
        (col("support").cast("double") * nBaskets.toDouble /
          (col("__ca").cast("double") * col("__cb").cast("double"))).as("lift"))
  }
}
