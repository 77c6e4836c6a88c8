package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER resolution: candidate pairs (id_a, id_b) from any
  * of the Dedup blockers only say "these two are alike" — choosing which
  * documents to keep needs the transitive closure (A~B, B~C ⇒ one cluster).
  *
  * `components` is smallest-id label propagation: every vertex starts as
  * its own label; each round every vertex takes the min label among itself
  * and its neighbours; fixpoint = connected components. Rounds are pure
  * (join + groupBy min) — no driver-side graph state, executors never hold
  * more than a partition of edges — and the iteration count is the graph
  * DIAMETER, which for near-dup graphs is tiny (dup clusters are cliques
  * or short chains; 3-5 rounds in practice). The driver loop only checks a
  * convergence count per round. Label propagation is the standard
  * Spark/Pregel CC formulation — O(diameter) shuffles of (edge) size.
  */
object Clusters {

  /** Connected components over an undirected pair list.
    *
    * @param pairs    (id_a, id_b) candidate/verified duplicate pairs
    * @param vertices one-column DataFrame of ALL vertex ids (documents
    *                 with no pair become singleton clusters)
    * @return (id, cluster) — cluster = smallest id in the component
    */
  def components(pairs: DataFrame, vertices: DataFrame,
                 idCol: String = "id", maxIters: Int = 30): DataFrame = {
    // undirected edge list, both directions, deduplicated; materialized
    // once (localCheckpoint) — every round re-reads it
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // Each round MUST truncate lineage (eager localCheckpoint): chaining
    // round N's plan onto round N-1's makes the logical plan — and its
    // analysis/planning cost — grow exponentially with the iteration
    // count (observed as an OOM in plan stringification long before any
    // data pressure). On a production cluster with unreliable executors,
    // swap for reliable checkpoint(dir) at a cadence.
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("cluster"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // candidate label per vertex: min over (own, neighbours' labels)
      val fromNbrs = edges
        .join(labels.select(col("id").as("src"), col("cluster")), Seq("src"))
        .select(col("dst").as("id"), col("cluster"))
      val next = labels.select(col("id"), col("cluster"))
        .union(fromNbrs)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("id"))
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Keep-list from clusters: the smallest id per cluster survives —
    * composes `components` with the same keep-smallest convention as
    * `Dedup.exactGroups`.
    */
  def keepSet(pairs: DataFrame, vertices: DataFrame,
              idCol: String = "id"): DataFrame =
    components(pairs, vertices, idCol)
      .groupBy(col("cluster"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_members"))
}
