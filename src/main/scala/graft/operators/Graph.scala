package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General graph connectivity over edge lists — the public form of the
  * min-label machinery graft's transitive dedup uses internally
  * (dedup/Dedup.scala minhashClustersTransitive propagates through a
  * vertex–bucket bipartite graph; this operator takes an arbitrary
  * undirected edge list). scio pipelines hand-roll exactly this loop
  * from joins + reduceByKey (reference: scio-core
  * PairSCollectionFunctions.scala building blocks).
  */
object Graph {

  /** Connected components by iterative min-label propagation: each
    * vertex's component is the minimum vertex id it can reach —
    * canonical and DETERMINISTIC (unlike hash-partitioned union-find),
    * so results are stable across partitionings and reruns. Returns
    * (vertex, component, converged): `converged` is a frame-constant
    * flag — false means `maxIters` bounded the walk before labels
    * stabilized (components may still be split; the label is then the
    * min within maxIters hops, still deterministic).
    *
    * Scale shape: each iteration is two keyed joins + a partial-agg
    * min — no collect, no driver-side frontier. Iterations needed =
    * graph diameter; `maxIters` bounds cost on adversarial chains
    * (the same contract as the dedup cluster walk). Each iteration
    * `localCheckpoint`s its labels: persist alone is NOT enough here —
    * it caches execution but the LOGICAL plan still nests, and by a
    * few dozen iterations plan stringification alone OOMs the driver
    * (found by GraphSpec's 25-iteration chain). Checkpointing
    * truncates lineage so the plan stays one iteration deep no matter
    * how many rounds run.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 10): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val und = edges.select(col(srcCol).as("__v"), col(dstCol).as("__n"))
      .union(edges.select(col(dstCol).as("__v"), col(srcCol).as("__n")))
      .filter(col("__v").isNotNull && col("__n").isNotNull)
      .distinct()
      .persist()
    try {
      var labels = und.select(col("__v")).distinct()
        .withColumn("component", col("__v"))
        .localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val nbrMin = und
          .join(labels.select(col("__v").as("__n"), col("component").as("__nc")), Seq("__n"))
          .groupBy(col("__v")).agg(min(col("__nc")).as("__nbr"))
        val next = labels.join(nbrMin, Seq("__v"), "left")
          .select(col("__v"),
            least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"))
          .localCheckpoint(true)
        val changed = next
          .join(labels.select(col("__v"), col("component").as("__prev")), Seq("__v"))
          .filter(col("component") =!= col("__prev")).limit(1).count()
        labels = next
        converged = changed == 0L
        iter += 1
      }
      labels.select(col("__v").as("vertex"), col("component"),
        lit(converged).as("converged"))
    } finally { und.unpersist() }
  }
}
