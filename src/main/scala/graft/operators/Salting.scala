package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (large) side into
  * `saltFactor` sub-keys and replicate the small side across all salts,
  * so one hot key spreads over `saltFactor` reducers instead of one.
  *
  * Deterministic (salt = hash of a stable tiebreaker column, no RNG) —
  * results are reproducible run to run. AQE's skew-join handles many
  * cases at runtime; explicit salting is the declarative fallback for
  * extreme single-key skew (e.g. one page with millions of revisions,
  * `README.rst:18-21`).
  */
object Salting {

  /** Equi-join `large ⋈ small` on `key`, salted. `tiebreak` is any
    * large-side column with per-row variation (an id, an offset). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 tiebreak: String, saltFactor: Int = 16): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(col(tiebreak)), lit(saltFactor)))
    val replicated = small.crossJoin(
      small.sparkSession.range(saltFactor).toDF("__salt").hint("broadcast"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation: only needed when a
    * non-algebraic aggregate meets a hot key; algebraic aggregates get
    * map-side partials from Catalyst for free. Provided for collect-like
    * aggregations. */
  def twoPhaseCollectSet(df: DataFrame, key: String, valueCol: String,
                         tiebreak: String, saltFactor: Int = 16): DataFrame = {
    df.withColumn("__salt", pmod(hash(col(tiebreak)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial"))))).as(s"${valueCol}_set"))
  }
}
