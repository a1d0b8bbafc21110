package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA community detection, Raghavan
  * et al. 2007) with a fully deterministic update rule: each round,
  * every node adopts the MINIMUM label among the labels of maximal
  * count over its neighbor multiset (classic LPA breaks ties
  * randomly — the min tie-break makes every round, and therefore the
  * oracle, exact). A fixed round count is part of the contract:
  * synchronous LPA can oscillate on bipartite structures, so the
  * output is "labels after exactly R rounds", deterministic whether
  * or not a fixpoint was reached.
  *
  * Scale shape: per round one join of the (undirected) neighbor list
  * against the label table keyed on node id (high cardinality, no
  * funnel), a map-side-combined (node, label) count, and a
  * WindowGroupLimit-prunable row_number pick per node. Lineage is cut
  * EVERY round (the r7 KCore lesson: multi-self-reference rounds grow
  * driver-side analysis 3^r between cuts).
  *
  * `edges` needs columns `a`/`b` (any direction, loops/dups ignored);
  * `nodes` one column `node` (extra isolated nodes keep their own
  * label). Returns `(node, community)`.
  */
object LabelProp {

  def communities(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val s = edges.sparkSession
    import s.implicits._
    val canon = edges.select(
        least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").distinct()
    val nbrs = canon.select($"a".as("src"), $"b".as("dst"))
      .union(canon.select($"b".as("src"), $"a".as("dst")))
      .persist()
    val allNodes = nodes.select($"node")
      .union(nbrs.select($"src".as("node"))).distinct()
      .persist()
    var lab = allNodes.withColumn("lbl", $"node").localCheckpoint(true)
    try {
      for (_ <- 1 to rounds) {
        val counts = nbrs.as("n")
          .join(lab.as("l"), $"n.dst" === $"l.node")
          .groupBy($"n.src".as("cnode"), $"l.lbl".as("clbl"))
          .agg(count(lit(1)).as("c"))
        val pick = counts
          .withColumn("rn", row_number().over(
            Window.partitionBy($"cnode").orderBy($"c".desc, $"clbl")))
          .filter($"rn" === 1)
          .select($"cnode".as("node"), $"clbl".as("newl"))
        val next = lab.join(pick, Seq("node"), "left")
          .select($"node", coalesce($"newl", $"lbl").as("lbl"))
          .localCheckpoint(true)
        lab = next
      }
      lab.select($"node", $"lbl".as("community"))
    } finally {
      nbrs.unpersist(false)
      allNodes.unpersist(false)
    }
  }
}
