package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate PAIRS into dedup DECISIONS: every
  * document in a component keeps one canonical representative (the
  * minimum id), everything else is a duplicate to drop.
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum of its
  * own and its neighbors' labels; fixpoint = components. Each round is
  * one join + one partial-aggregated groupBy on the (small) edge list —
  * rounds needed = component diameter. Near-dup components are dense
  * little cliques (diameter 1-2), so this converges in 2-3 rounds; for
  * general graphs with long paths swap in the large-star/small-star
  * contraction (Kiveris et al.) for O(log n) rounds.
  */
object Components {

  /** (id, rep) for every node that appears in `edges`; `rep` is the
    * minimum id of the node's component.
    */
  def components(edges: DataFrame, aCol: String = "a", bCol: String = "b",
                 maxIters: Int = 25): DataFrame = {
    // Eager localCheckpoint, not persist: each round's plan embeds TWO
    // copies of the previous round's (labels joins a groupBy over labels),
    // so without lineage TRUNCATION the logical plan doubles per round and
    // Catalyst analysis goes exponential — the classic iterative-DataFrame
    // trap. Checkpointing materializes the round and replaces its plan
    // with a flat scan, keeping every round O(edges).
    val sym = edges
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .union(edges.select(col(bCol).cast("long").as("x"), col(aCol).cast("long").as("y")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("x").as("id")).distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("y"), col("rep").as("nrep")), "y")
        .groupBy("x").agg(min("nrep").as("cand"))
        .withColumnRenamed("x", "id")
      val next = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("rep"), coalesce(col("cand"), col("rep"))).as("rep"),
          col("rep").as("prev"))
        .localCheckpoint(true)
      converged = next.filter(col("rep") < col("prev")).count() == 0
      labels = next.select("id", "rep")
      it += 1
    }
    labels
  }

  /** Near-duplicate dedup end-to-end: LSH candidate pairs → exact-Jaccard
    * verify → components → keep only each component's minimum-id
    * representative (plus every document with no near-duplicate at all).
    */
  def nearDupKeep(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double,
                  shingleFn: Column => Column = MinHashLSH.wordShingles(_, 3)): DataFrame = {
    val pairs = MinHashLSH.nearDupPairs(df, idCol, textCol, threshold,
      shingleFn = shingleFn)
    val drop = components(pairs)
      .filter(col("rep") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }
}
