package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) joins: for every left row, attach the payload
  * of the nearest right row with the same key —
  *  - `backward`: latest right with `rightTs <= leftTs`
  *  - `forward`:  earliest right with `rightTs >= leftTs`
  * optionally bounded by a `tolerance` (max time distance; matches
  * farther away yield null payload, the row is kept).
  *
  * Implemented as the union-and-carry pattern rather than an equi-join +
  * per-left-row extremum: both sides are tagged, unioned, and a single
  * window `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY
  * ts[, reversed], side)` carries the nearest right payload onto each
  * left row.
  *
  * Scale rationale: this costs exactly ONE shuffle (by key) over
  * left+right and a per-partition sort — it never materializes the
  * (left × candidate-rights) blow-up of the naive join + filter + window
  * plan. This is the standard scalable formulation of as-of/point-in-time
  * joins.
  *
  * Skew caveat: AQE splits skewed JOIN partitions, not window/sort
  * partitions — one pathological key (say 10⁷ rows) still sorts on a
  * single task here. That sort is O(n log n) with no pair blow-up, so
  * correctness and memory hold far past normal skew (pinned by the
  * hot-key spec); for keys too large for one task, pre-bucket the key
  * by a coarse time range (each bucket seeded with the latest prior
  * right row) or reach for [[Salting]] on an equi-join reformulation.
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param leftKey   join key column name on `left`
    * @param rightKey  join key column name on `right`
    * @param leftTs    event-time column name on `left`
    * @param rightTs   event-time column name on `right`
    * @param payload   right columns to carry onto left rows
    * @param tolerance max |leftTs - rightTs| as a Column (e.g.
    *                  `lit(3600000000L)` for µs longs); farther matches
    *                  null out
    * @return left columns + carried payload columns (null when no right
    *         row qualifies)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String],
               tolerance: Option[Column] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      forwardDir = false, tolerance)

  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTs: String, rightTs: String,
              payload: Seq[String],
              tolerance: Option[Column] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      forwardDir = true, tolerance)

  private def asof(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   payload: Seq[String],
                   forwardDir: Boolean, tolerance: Option[Column]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload travels inside ONE struct that is non-null for every right
    // row — so a right row whose payload VALUES are null still wins the
    // as-of race (ignoreNulls only skips "no right row here" markers,
    // never a genuine null payload value). The right timestamp rides
    // along for tolerance filtering.
    val payloadStruct = struct(
      (col(rightTs).as("__rts") +: payload.map(col)): _*)
    val nullStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts", right.schema(rightTs).dataType) +:
        payload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))

    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(nullStructType).as("__p") +: leftCols.map(col)): _*)

    // Right rows sort before left rows at equal ts (side 0 < 1), so the
    // join is inclusive in both directions: rightTs == leftTs matches.
    val ord = if (forwardDir) Seq(col("__ts").desc, col("__side"))
              else Seq(col("__ts"), col("__side"))
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
    val within = tolerance match {
      case None => lit(true)
      case Some(t) =>
        if (forwardDir) col("__c.__rts") <= col("__ts") + t
        else col("__c.__rts") >= col("__ts") - t
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => when(within, col(s"__c.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
