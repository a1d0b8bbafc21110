package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point column joined to
  * right rows with `[start, end)` interval columns, on point ∈
  * interval (plus optional equi-keys).
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin —
  * quadratic work and a broadcast of a whole side, which collapses at
  * scale. `bucketed` makes it an equi-join: each interval explodes
  * into the fixed-width buckets it overlaps, the point maps to one
  * bucket, the join key becomes `(bucket [, equiKeys…])`, and the
  * exact predicate re-filters the bucket-collisions. Work scales with
  * actual overlaps × (interval span / bucketWidth), shuffles hash by
  * bucket, and AQE handles bucket skew — the standard distributed
  * interval-join shape.
  *
  * `bucketWidth` should be on the order of the typical interval span:
  * too small explodes the right side, too large degrades toward
  * cross-product within buckets.
  */
object RangeJoin {

  def bucketed(left: DataFrame, right: DataFrame,
               pointCol: String, startCol: String, endCol: String,
               bucketWidth: Long, equiKeys: Seq[(String, String)] = Seq.empty,
               joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket", col(pointCol).cast("long") / bucketWidth cast "long")
    val rb = right.withColumn("__bucket", explode(sequence(
      (col(startCol).cast("long") / bucketWidth).cast("long"),
      // end is exclusive: a range ending exactly on a bucket boundary
      // does not overlap the next bucket
      ((col(endCol).cast("long") - 1) / bucketWidth).cast("long"))))
    val keys = Seq(lb("__bucket") === rb("__bucket")) ++
      equiKeys.map { case (l, r) => lb(l) === rb(r) }
    val cond = keys.reduce(_ && _) &&
      lb(pointCol) >= rb(startCol) && lb(pointCol) < rb(endCol)
    lb.join(rb, cond, joinType)
      .drop(lb("__bucket")).drop(rb("__bucket"))
  }
}
