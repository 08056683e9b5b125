package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * every near-dup pipeline runs after pair generation (MinHash/SimHash
  * pairs → duplicate GROUPS → keep one canonical doc per group).
  *
  * Algorithm: iterative min-label propagation (the DataFrame form of
  * Pregel-style CC, same as the reference implementations in GraphX and
  * the large-star/small-star literature). Every node starts labeled with
  * itself; each round every node takes the min of its own label and its
  * neighbors' labels; fixpoint = component = min node id reachable.
  *
  * 100 TB posture:
  *  - each round is ONE equi-join + hash aggregate, both key-parallel;
  *    rounds needed = graph diameter, and near-dup clusters are
  *    shallow (dozens of docs, diameter a handful) — not web-graph deep.
  *  - the edge table is shuffled ONCE: it is repartitioned by the join key
  *    and cached, so every round's join reuses its layout and only the
  *    (node, label) table — one row per node — moves.
  *  - lineage is truncated each round with localCheckpoint, otherwise the
  *    plan doubles per iteration and the driver ooms on plan analysis long
  *    before the data is the problem. (A production run on an unreliable
  *    cluster would use reliable checkpoint(dir) instead; same call shape.)
  *  - the per-round driver action is a 1-row existence check (did any
  *    label change), i.e. metadata-scale, not a collect of data.
  */
object ConnectedComponents {

  /** Returns (node, component): one row per distinct node in the edge list,
    * component = smallest node id in its connected component. Self-loops
    * and duplicate/reversed edges are tolerated.
    */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(src).as("e_src"), col(dst).as("e_dst"))
      .union(edges.select(col(dst).as("e_src"), col(src).as("e_dst")))
      .filter(col("e_src") =!= col("e_dst"))
      .distinct()
      .repartition(col("e_dst"))
      .cache()

    var labels = sym.select(col("e_src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, col("e_dst") === col("node"))
        .groupBy(col("e_src"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, col("node") === col("e_src"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      converged = next.as("n").join(labels.as("o"), "node")
        .filter(col("n.lbl") =!= col("o.lbl"))
        .head(1).isEmpty
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("lbl", "component")
  }
}
