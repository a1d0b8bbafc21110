package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting + local clustering coefficients over an
  * undirected edge list — the degree-ordered edge-iterator algorithm
  * (Schank & Wagner 2005; the MapReduce form is Suri & Vassilvitskii
  * 2011's "Counting triangles and the curse of the last reducer").
  *
  * Every edge is ORIENTED from its lower-(degree, id) endpoint to the
  * higher one; wedges are built only from each node's outgoing
  * (higher-ranked) neighbors and closed against the canonical edge
  * set. The orientation is the scale property: Σ d⁺(u)² is
  * O(m^{3/2}) regardless of skew — a hub of degree D contributes
  * O(m) wedges, not O(D²), so the "last reducer" hot key the naive
  * wedge join creates cannot form. All joins key on node/edge ids
  * (high-cardinality); counts are exact integers; the coefficient
  * 2t/(d(d−1)) is ONE double division of exact integers (bit-portable
  * across engines, the q44 rational pattern).
  *
  * Intermediates are persisted for the call only (each feeds 2-3 plan
  * branches); the per-node result is eagerly localCheckpoint'ed and
  * every cache entry is released before return.
  */
object Triangles {

  /** One row per node: `(node, deg, tri, coeff)` — degree in the
    * canonicalized simple graph, exact triangle membership count, and
    * local clustering coefficient (0.0 where deg < 2). */
  def perNode(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // canonical simple undirected edges: a < b, no loops, no dups
    val ce = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter($"a" =!= $"b").distinct().persist()
    try {
      val deg = ce.select($"a".as("node")).union(ce.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg")).persist()
      try {
        val or = ce
          .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
          .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
          .select(
            when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"a").otherwise($"b").as("u"),
            when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), $"b").otherwise($"a").as("v"))
          .persist()
        try {
          // wedges from each node's outgoing pairs; id-ordered so each
          // unordered pair forms once; closed against canonical edges
          val tri = or.select($"u", $"v".as("v1"))
            .join(or.select($"u", $"v".as("v2")), "u")
            .filter($"v1" < $"v2")
            .join(ce, least($"v1", $"v2") === $"a" && greatest($"v1", $"v2") === $"b")
            .select($"u", $"v1", $"v2")
          val tc = tri.select($"u".as("node"))
            .union(tri.select($"v1".as("node")))
            .union(tri.select($"v2".as("node")))
            .groupBy($"node").agg(count(lit(1)).as("tri"))
          val out = deg.join(tc, Seq("node"), "left")
            .withColumn("tri", coalesce($"tri", lit(0L)))
            .withColumn("coeff", when($"deg" >= 2,
                ($"tri" * 2).cast("double") / ($"deg" * ($"deg" - 1)).cast("double"))
              .otherwise(lit(0.0)))
            .select($"node", $"deg", $"tri", $"coeff")
          out.localCheckpoint(true)
        } finally or.unpersist()
      } finally deg.unpersist()
    } finally ce.unpersist()
  }
}
