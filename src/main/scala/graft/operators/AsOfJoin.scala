package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row with the same key and `rightTs <= leftTs`.
  *
  * Implemented as the union-and-carry pattern rather than an equi-join +
  * per-left-row max: both sides are tagged, unioned, and a single window
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`
  * carries the most recent right payload forward onto each left row.
  *
  * Scale rationale: this costs exactly ONE shuffle (by key) over
  * left+right and a per-partition sort — it never materializes the
  * (left × candidate-rights) blow-up of the naive join + filter + window
  * plan, and skewed keys are handled by AQE like any other shuffle. This
  * is the standard scalable formulation of as-of/point-in-time joins.
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param leftKey   join key column name on `left`
    * @param rightKey  join key column name on `right`
    * @param leftTs    event-time column name on `left`
    * @param rightTs   event-time column name on `right`
    * @param payload   right columns to carry onto left rows
    * @return left columns + carried payload columns (null when no right
    *         row at-or-before the left timestamp exists)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload travels inside ONE struct that is non-null for every right
    // row — so a right row whose payload VALUES are null still wins the
    // as-of race (ignoreNulls only skips "no right row here" markers,
    // never a genuine null payload value).
    val payloadStruct = struct(payload.map(col): _*)
    val nullStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))

    val taggedRight = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(nullStructType).as("__p") +: leftCols.map(col)): _*)

    // Right rows sort before left rows at equal ts (side 0 < 1), so the
    // join is inclusive: rightTs == leftTs matches.
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__c.$c").as(c)): _*)
  }
}
