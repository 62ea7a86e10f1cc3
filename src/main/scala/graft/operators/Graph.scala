package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities for the dedup pipeline. Near-dup pair
  * finding (MinHash/SimHash/embedding LSH) yields EDGES; an actual
  * dedup sweep needs the transitive closure — one canonical document per
  * connected component — because near-duplication chains (A~B, B~C ⇒
  * {A,B,C} is one cluster even when A~C scores below threshold).
  */
object Graph {

  /** Connected components by iterative hash-min label propagation:
    * every node repeatedly adopts the minimum component id among itself
    * and its neighbors until fixpoint. Each iteration is one equi-join +
    * one aggregation, both hash-partitioned on node id — no single-task
    * funnels. Converges in O(graph diameter) iterations; near-dup
    * clusters are short chains, so the practical count is ~3-5. (For
    * adversarial long-path graphs at extreme scale the large-star/
    * small-star variant [Kiveris et al., "Connected Components in
    * MapReduce"] halves diameter per round; hash-min is the right
    * simplicity/perf point for dedup workloads.)
    *
    * Lineage is truncated every iteration with an eager localCheckpoint —
    * an iterative DataFrame loop otherwise compounds the plan and
    * re-executes every prior round at each action.
    *
    * @return (id, component) for every node appearing in `edges`, where
    *   component = the minimum node id in the connected component.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // min component among neighbors, then keep own if smaller
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      // comp values only ever decrease; fixpoint ⇔ no row changed
      converged = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labels = next
      it += 1
    }
    labels.withColumnRenamed("id", srcCol).withColumnRenamed("comp", "component")
  }
}
