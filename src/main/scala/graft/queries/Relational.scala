package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface over the driver-provided TPC-H-ish tables.
  *
  * Design notes for oracle (DuckDB) parity:
  *   - Aggregated money amounts are cast per-row to DECIMAL before SUM so
  *     the aggregation is exact and order-independent, then cast back to
  *     DOUBLE (deterministic nearest-double) — a plain SUM(DOUBLE) is
  *     order-dependent and would hash-mismatch between engines.
  *   - `events.ts` is nanosecond parquet; Spark reads microseconds. Raw ts
  *     values are never emitted — only epoch-micros or derived values.
  *   - Every query has a total deterministic ORDER BY so row order is
  *     stable in both engines.
  *
  * Scale notes (100 TB):
  *   - Dimension tables (nation, region, part at TPC-H proportions) are
  *     broadcast; fact-fact joins shuffle on the join key and rely on AQE
  *     for skew handling.
  *   - Aggregations are expressed as groupBy().agg() → Catalyst plans
  *     partial (map-side) + final aggregation automatically.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** events with a microsecond-epoch `ts_us` long column, whatever the
    * parquet encoding of `ts`: raw nanos long (TIMESTAMP(NANOS) under
    * spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ
    * (µs parquet with no timezone — what the current generator writes;
    * unix_micros rejects NTZ, so cast through TIMESTAMP under the UTC
    * session zone first). Source ns values are µs-aligned, so
    * `div 1000` is exact. */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "events")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("ts_us", tsUs)
  }

  /** Two-decimal money value as exact decimal (source data has exactly
    * two decimal digits, so this cast is lossless). */
  private def m2(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact, order-independent sum of a decimal expression, surfaced as
    * DOUBLE (the exact-decimal → nearest-double cast is deterministic
    * and identical across engines, unlike a SUM over doubles). */
  private def dsum(c: Column): Column = sum(c).cast("double")

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1 style pricing summary: scan + filter + hash agg.
    * Partial agg happens map-side; only 4-ish groups shuffle. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum(m2($"l_extendedprice")).as("sum_base_price"),
        dsum(m2($"l_extendedprice") * m2(lit(1) - $"l_discount")).as("sum_disc_price"),
        dsum(m2($"l_extendedprice") * m2(lit(1) - $"l_discount") * m2(lit(1) + $"l_tax")).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2)) * CAST(1+l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Revenue by nation: fact-fact shuffle joins + broadcast dims.
    * customer/supplier joins shuffle on keys; nation is broadcast. */
  def q2RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lineitem = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        dsum(m2($"l_extendedprice") * m2(lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  val q2Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Shipping-priority top-10: join + agg + total-order top-k.
    * Catalyst plans TakeOrderedAndProject — no full sort at scale. */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lineitem = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    // aggregation pushed below the join: o_orderpriority is
    // functionally dependent on o_orderkey, so revenue can be fully
    // aggregated per order BEFORE joining — the join then carries one
    // row per order instead of one per line item (≈4× less shuffle),
    // and the final orderBy+limit plans as TakeOrderedAndProject.
    lineitem
      .groupBy($"l_orderkey".as("o_orderkey"))
      .agg(dsum(m2($"l_extendedprice") * m2(lit(1) - $"l_discount")).as("revenue"))
      .join(orders.select($"o_orderkey", $"o_orderpriority"), Seq("o_orderkey"))
      .select($"o_orderkey", $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** Order-priority count via EXISTS (left-semi join). */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val big = t(s, dir, "lineitem").filter($"l_quantity" > 45)
    orders
      .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Customers with no recent order (left-anti join) per market segment. */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = t(s, dir, "customer")
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
    customer
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           dsum(m2($"c_acctbal")).as("total_acctbal"))
      .orderBy($"c_mktsegment")
  }

  val q5Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6 style forecast-revenue: highly selective filter fully
    * pushed to the parquet scan, single global agg. */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"l_shipdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
              $"l_discount" >= 0.03 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(dsum(m2($"l_extendedprice") * m2($"l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Per-user event sequence: lag + row_number — the relational analog of
    * the reference's previous-revision pairing (SURVEY §2.5 W1:
    * lag(revision) OVER (PARTITION BY page ORDER BY position)). */
  def q7WindowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .select($"event_id", $"user_id", $"rn", $"prev_value", $"prev_type")
      .orderBy($"event_id")
  }

  val q7Sql: String =
    """SELECT event_id, user_id,
      |  ROW_NUMBER() OVER w AS rn,
      |  LAG(value) OVER w AS prev_value,
      |  LAG(event_type) OVER w AS prev_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Set operations: UNION / INTERSECT / EXCEPT over customer keys. */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val active = orders.select($"o_custkey".as("custkey")).distinct()
    val rich = customer.filter($"c_acctbal" > 7500).select($"c_custkey".as("custkey"))
    val building = customer.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
    rich.intersect(active).except(building)
      .union(building.except(active))
      .distinct()
      .orderBy($"custkey")
  }

  val q8Sql: String =
    """SELECT custkey FROM (
      |  (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7500
      |   INTERSECT SELECT DISTINCT o_custkey FROM orders
      |   EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |  UNION
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |   EXCEPT SELECT DISTINCT o_custkey FROM orders)
      |)
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q9
  /** ROLLUP aggregation (grouping sets); null group keys coalesced to
    * 'ALL' so both engines emit identical, null-free rows. */
  def q9Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           dsum(m2($"o_totalprice")).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
              coalesce($"o_orderpriority", lit("ALL")).as("priority"),
              $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  val q9Sql: String =
    """SELECT COALESCE(o_orderstatus,'ALL') AS status,
      |  COALESCE(o_orderpriority,'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Distinct aggregation: distinct users + event counts per type. */
  def q10Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val q10Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Ranking window: top-3 parts per brand by retail price. */
  def q11RankPerBrand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    t(s, dir, "part")
      .withColumn("rank_in_brand", row_number().over(w).cast("long"))
      .filter($"rank_in_brand" <= 3)
      .select($"p_brand", $"rank_in_brand", $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"rank_in_brand")
  }

  val q11Sql: String =
    """SELECT p_brand, rank_in_brand, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |                       ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
      |  FROM part) t
      |WHERE rank_in_brand <= 3
      |ORDER BY p_brand, rank_in_brand""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Sessionization (gaps-and-islands): a new session starts after a
    * >30-minute silence; counts sessions and events per user. Exercises
    * lag + conditional + running-sum window composition. */
  def q12Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    events(s, dir)
      .withColumn("prev_ts_us", lag($"ts_us", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts_us".isNull ||
             $"ts_us" - $"prev_ts_us" > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id")
      .agg(max($"session_id").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val q12Sql: String =
    """SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN prev_ts IS NULL
      |                OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |      FROM events) a) b) c
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Backward as-of join: each event picks up the user's most recent
    * order at-or-before the event time (see [[graft.operators.AsOfJoin]]).
    * The right side is pre-deduped to one row per (custkey, orderdate) so
    * tie-breaking is deterministic in both engines. */
  def q13AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).drop("ts")
    val orders = t(s, dir, "orders")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
      // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so this cast is
      // the identity wall-clock mapping.
      .withColumn("odate_us", unix_micros($"o_orderdate".cast("timestamp")))
    graft.operators.AsOfJoin.backward(
      ev, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTs = "ts_us", rightTs = "odate_us",
      payload = Seq("o_orderkey"))
      .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"))
      .orderBy($"event_id")
  }

  val q13Sql: String =
    """SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
      |FROM events e
      |ASOF LEFT JOIN (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate) o
      |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q30
  /** TPC-H Q17-style correlated aggregate: revenue from small-quantity
    * line items (quantity below 20% of the part's average). Expressed as
    * a join against the per-part average (what Catalyst de-correlates a
    * scalar subquery into); sums are integral-exact. */
  def q30SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val avgQty = li.groupBy($"l_partkey".as("pk"))
      .agg((sum($"l_quantity") / count(lit(1))).as("avg_qty"))
    li.join(avgQty, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"avg_qty" * 0.2)
      .agg(dsum(m2($"l_extendedprice")).as("total_price"),
           count(lit(1)).as("n_items"))
  }

  val q30Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |WHERE l_quantity < (SELECT SUM(l_quantity)/COUNT(*) * 0.2
      |                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Salted join (skew path) — must equal the plain join bit-for-bit;
    * the oracle is the unsalted formulation. */
  def q31SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    val part = t(s, dir, "part").select($"p_partkey", $"p_brand")
    graft.operators.Salting.saltedJoin(
        li, part, key = "p_partkey", tiebreak = "l_orderkey", saltFactor = 8)
      .groupBy($"p_brand")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  val q31Sql: String =
    """SELECT p_brand, SUM(l_quantity) AS sum_qty, COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Pivot / crosstab: events per user × event type (explicit value
    * list so the output schema is static and oracle-matchable). */
  def q34Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  val q34Sql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q35
  /** JSON extraction from the events.props payload column. */
  def q35Json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count($"k").as("n_with_k"),
           sum($"k").as("sum_k"),
           max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q35Sql: String =
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Multiset set operations: INTERSECT ALL / EXCEPT ALL with
    * cardinality accounting. */
  def q32SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val liKeys = t(s, dir, "lineitem").select($"l_orderkey".as("k"))
    val ordKeys = t(s, dir, "orders").select($"o_orderkey".as("k"))
    val surplus = liKeys.exceptAll(ordKeys)   // lineitem multiplicity - 1 per key
    val both = liKeys.intersectAll(ordKeys)   // min(multiplicity) = 1 per key
    surplus.groupBy($"k").agg(count(lit(1)).as("n_surplus"))
      .join(both.groupBy($"k").agg(count(lit(1)).as("n_common")), Seq("k"))
      .orderBy($"k")
      .limit(1000)
  }

  val q32Sql: String =
    """WITH surplus AS (
      |  SELECT l_orderkey AS k FROM lineitem
      |  EXCEPT ALL
      |  SELECT o_orderkey FROM orders),
      |both_keys AS (
      |  SELECT l_orderkey AS k FROM lineitem
      |  INTERSECT ALL
      |  SELECT o_orderkey FROM orders)
      |SELECT s.k, s.n_surplus, b.n_common
      |FROM (SELECT k, COUNT(*) n_surplus FROM surplus GROUP BY k) s
      |JOIN (SELECT k, COUNT(*) n_common FROM both_keys GROUP BY k) b USING (k)
      |ORDER BY k
      |LIMIT 1000""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Sketch aggregates (HLL distinct, approximate percentile): Spark's
    * implementations differ from any oracle engine's → rows-only check.
    * Both are merge-order-independent, so results are deterministic. */
  def q33ApproxSketches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"),
           percentile_approx($"value", lit(0.5), lit(1000)).as("p50_value"),
           percentile_approx($"value", lit(0.99), lit(1000)).as("p99_value"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q29
  /** CUBE grouping sets over order status × priority (all four grouping
    * combinations), null keys coalesced like q9. */
  def q29Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           dsum(m2($"o_totalprice")).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
              coalesce($"o_orderpriority", lit("ALL")).as("priority"),
              $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  val q29Sql: String =
    """SELECT COALESCE(o_orderstatus,'ALL') AS status,
      |  COALESCE(o_orderpriority,'ALL') AS priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Tumbling 1-hour window aggregation over events — the batch
    * equivalent of StreamOps.windowedEventCounts (same grouping keys,
    * exact decimal sums), oracle-checkable via epoch bucketing. */
  def q28TimeWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .withColumn("bucket_us", $"ts_us" - ($"ts_us" % 3600000000L))
      .groupBy($"bucket_us", $"event_type")
      .agg(count(lit(1)).as("n_events"),
           dsum(m2($"value")).as("total_value"))
      .orderBy($"bucket_us", $"event_type")
  }

  val q28Sql: String =
    """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY bucket_us, event_type""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Interval join via [[graft.operators.RangeJoin]]: every `error`
    * event opens a 30-minute incident window; count same-user events
    * landing inside any window, per event type (bucketed equi-join on
    * 10-minute buckets — never a BroadcastNestedLoopJoin). */
  def q39RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"event_id", $"user_id", $"event_type", $"ts_us")
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"), $"user_id".as("iuser"),
        $"ts_us".as("start_us"), ($"ts_us" + 1800000000L).as("end_us"))
    graft.operators.RangeJoin.bucketed(
        ev, incidents, pointCol = "ts_us", startCol = "start_us", endCol = "end_us",
        bucketWidth = 600000000L, equiKeys = Seq("user_id" -> "iuser"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_matches"),
           countDistinct($"incident_id").as("n_incidents"),
           countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  val q39Sql: String =
    """SELECT e.event_type, COUNT(*) AS n_matches,
      |  COUNT(DISTINCT i.event_id) AS n_incidents,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN events i
      |  ON i.event_type = 'error'
      | AND e.user_id = i.user_id
      | AND epoch_us(e.ts) >= epoch_us(i.ts)
      | AND epoch_us(e.ts) < epoch_us(i.ts) + 1800000000
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Forward as-of join: each event picks up the user's NEXT purchase
    * at-or-after the event time (mirror of q13's backward direction;
    * right side pre-deduped per (user, ts) for deterministic ties). */
  def q40AsofForward(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"event_id", $"user_id", $"event_type", $"ts_us")
    val purch = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id".as("pu"), $"ts_us".as("pts"))
      .agg(min($"event_id").as("purchase_id"))
    graft.operators.AsOfJoin.forward(
        ev.drop("event_type"), purch,
        leftKey = "user_id", rightKey = "pu",
        leftTs = "ts_us", rightTs = "pts",
        payload = Seq("purchase_id"))
      .select($"event_id", $"user_id", $"purchase_id".as("next_purchase"))
      .orderBy($"event_id")
  }

  val q40Sql: String =
    """SELECT e.event_id, e.user_id, p.purchase_id AS next_purchase
      |FROM events e
      |ASOF LEFT JOIN (
      |  SELECT user_id AS pu, ts AS pts, MIN(event_id) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
      |ON e.user_id = p.pu AND e.ts <= p.pts
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Retention cohorts: users grouped by the epoch-week of their first
    * event; for each (cohort week, week offset) the number of distinct
    * users still active. Two map-side-combined aggregations joined on
    * user_id (high-cardinality) — the classic product-analytics query,
    * all integer week arithmetic. */
  def q93RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wkUs = 604800L * 1000000L
    val ev = events(s, dir).select($"user_id", $"ts_us")
    val cohort = ev.groupBy($"user_id")
      .agg(expr(s"min(ts_us) div $wkUs").as("cohort_week"))
    ev.join(cohort, "user_id")
      .withColumn("week_offset", expr(s"ts_us div $wkUs") - $"cohort_week")
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val q93Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1)
      |SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN cohort c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Conversion funnel view → click → purchase: each stage must follow
    * the user's previous-stage anchor within one hour; users counted at
    * the FURTHEST stage reached. Three filtered min-aggregations
    * chained by left joins on user_id — no window over the whole event
    * stream, each stage shrinks the frontier. */
  def q94Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hrUs = 3600L * 1000000L
    val ev = events(s, dir).select($"user_id", $"event_type", $"ts_us")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_us").as("v_ts"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts_us" > $"v_ts" && $"ts_us" <= $"v_ts" + hrUs)
      .groupBy($"user_id").agg(min($"ts_us").as("c_ts"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts_us" > $"c_ts" && $"ts_us" <= $"c_ts" + hrUs)
      .groupBy($"user_id").agg(min($"ts_us").as("p_ts"))
    v.join(c.select($"user_id", $"c_ts"), Seq("user_id"), "left")
      .join(p.select($"user_id", $"p_ts"), Seq("user_id"), "left")
      .withColumn("stage",
        when($"p_ts".isNotNull, 3L).when($"c_ts".isNotNull, 2L).otherwise(1L))
      .groupBy($"stage").agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"stage")
  }

  val q94Sql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts_us) AS c_ts
      |      FROM ev e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click'
      |        AND e.ts_us > v.v_ts AND e.ts_us <= v.v_ts + 3600000000
      |      GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts_us) AS p_ts
      |      FROM ev e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase'
      |        AND e.ts_us > c.c_ts AND e.ts_us <= c.c_ts + 3600000000
      |      GROUP BY 1)
      |SELECT CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
      |            WHEN c.c_ts IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
      |  COUNT(DISTINCT v.user_id) AS n_users
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q103
  /** The full session TABLE via Spark's native `session_window`
    * ([[graft.streaming.StreamOps.sessionWindows]] — the exact code
    * that runs streaming, applied to the batch frame): one row per
    * (user, inactivity-gap session) with start, end (= last event +
    * gap), event count, and exact-decimal value total. q12 counts
    * sessions per user with a hand-rolled gaps-and-islands window;
    * this emits the sessions themselves through the native operator
    * (map-side partial session merge, shuffle keyed by user_id), and
    * the oracle re-derives them as islands SQL — pinning the built-in
    * operator's boundary semantics (break at gap ≥ 1800s) against an
    * independent formulation. */
  def q103SessionWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id",
      timestamp_micros($"ts_us").as("ts"), $"value")
    graft.streaming.StreamOps.sessionWindows(ev)
      .orderBy($"user_id", $"session_start_us")
  }

  val q103Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      |x AS (SELECT user_id, ts_us, value,
      |        LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_ts
      |      FROM ev),
      |y AS (SELECT user_id, ts_us, value,
      |        CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= 1800000000
      |             THEN 1 ELSE 0 END AS brk
      |      FROM x),
      |z AS (SELECT user_id, ts_us, value,
      |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
      |                       ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM y)
      |SELECT user_id, MIN(ts_us) AS session_start_us,
      |  MAX(ts_us) + 1800000000 AS session_end_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM z GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  // ---------------------------------------------------------------- q155
  /** Click attribution — the EXACT batch twin of
    * [[graft.streaming.StreamOps.attributeClicks]] (the operator code
    * itself on the batch frame; `withWatermark` is a no-op in batch):
    * every (view, click) pair of one user with the click within 1800 s
    * after the view. Streaming, the same plan is Spark's genuine
    * stream-stream interval join with watermark-bounded state;
    * StreamingSpec pins stream ≡ batch pair sets, and this row pins
    * the batch side to an independent SQL formulation — closing the
    * chain for the interval-join operator. Shuffle is keyed by
    * user_id (high cardinality); the interval predicate prunes within
    * each key. */
  def q155ClickAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id", $"event_id",
      timestamp_micros($"ts_us").as("ts"), $"event_type")
    graft.streaming.StreamOps.attributeClicks(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "click"))
      .select($"user_id", $"view_id", $"click_id",
        unix_micros($"view_ts").as("view_ts_us"),
        unix_micros($"click_ts").as("click_ts_us"))
      .orderBy($"user_id", $"view_id", $"click_id")
  }

  // ---------------------------------------------------------------- q156
  /** Tumbling-window event aggregation — the EXACT batch twin of
    * [[graft.streaming.StreamOps.windowedEventCounts]] (the operator
    * code on the batch frame; the watermark is a batch no-op): hourly
    * windows × event_type with exact-decimal value totals. Streaming,
    * the same plan runs with watermark-bounded state and append-mode
    * window emission; this row pins the window boundary + decimal-sum
    * semantics against an independent epoch-arithmetic SQL
    * formulation. */
  def q156WindowedCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select(
      timestamp_micros($"ts_us").as("ts"), $"event_type", $"value")
    graft.streaming.StreamOps.windowedEventCounts(ev)
      .select(unix_micros($"window_start").as("window_start_us"),
        $"event_type", $"n_events", $"total_value")
      .orderBy($"window_start_us", $"event_type")
  }

  val q156Sql: String =
    """WITH ev AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events)
      |SELECT CAST((ts_us // 3600000000) * 3600000000 AS BIGINT) AS window_start_us,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM ev GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q157
  /** Stream-static broadcast enrichment — the EXACT batch twin of
    * [[graft.streaming.StreamOps.enrichStream]]: events left-joined
    * against a small per-user dimension (each user's lifetime view
    * count, kept only for users with ≥ 3 views so ABSENT KEYS are
    * exercised — the left join must keep their rows with NULL
    * enrichment, the r6 sparse-model lesson). The dimension rides a
    * broadcast; the stream side never shuffles. */
  def q157EnrichedEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
    val dim = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(count(lit(1)).as("n_views"))
      .filter($"n_views" >= 3)
    graft.streaming.StreamOps.enrichStream(
        ev.select($"event_id", $"user_id", $"event_type"),
        dim, Seq("user_id"))
      .select($"event_id", $"user_id", $"event_type", $"n_views")
      .orderBy($"event_id")
  }

  val q157Sql: String =
    """WITH dim AS (SELECT user_id, COUNT(*) AS n_views FROM events
      |             WHERE event_type = 'view' GROUP BY 1
      |             HAVING COUNT(*) >= 3)
      |SELECT e.event_id, e.user_id, e.event_type, d.n_views
      |FROM events e LEFT JOIN dim d USING (user_id)
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Watermarked streaming dedup driven through an ACTUAL stream run
    * inside the query (the q165 pattern): Spark 4 rejects
    * `dropDuplicatesWithinWatermark` on batch frames, so the only way
    * to put [[graft.streaming.StreamOps.dedupStream]] in the oracle
    * gate is to run the real micro-batch op. Events plus exact
    * duplicate copies of every 5th event land as TWO source files
    * (originals, then duplicates), read one file per trigger through a
    * parquet file stream; dedup keys on event_id with a huge watermark
    * delay (no state eviction → exact global dedup), AvailableNow,
    * parquet sink, read back. Duplicates are exact row copies, so the
    * kept set is deterministic regardless of arrival/batch order; the
    * oracle is SELECT DISTINCT over the same union. */
  def q168DedupStream(s: SparkSession, dir: String): DataFrame =
    StreamOracle.withFixtureShuffle(s) {
    import s.implicits._
    val ev = events(s, dir).select($"event_id",
      timestamp_micros($"ts_us").as("ts"), $"user_id", $"event_type")
    val inDir = OracleTmp.fresh("graft_q168_in")
    val ckpt = OracleTmp.fresh("graft_q168_ckpt")
    val out = OracleTmp.fresh("graft_q168_out")
    OracleTmp.writeOne(ev, inDir, "a_orig.parquet")
    OracleTmp.writeOne(ev.filter($"event_id" % 5 === 0), inDir, "b_dups.parquet")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    // dedup on ALL columns, not just event_id: per-key dedup keeps an
    // arbitrary first-arrival row, which only matches SELECT DISTINCT
    // while event_id happens to be a unique key of the (driver-
    // regenerated!) events table — full-row keys make the twin
    // regeneration-proof and the ORDER BY total
    val dd = graft.streaming.StreamOps.dedupStream(
      stream, Seq("event_id", "ts", "user_id", "event_type"), "ts", "3650 days")
    val q = dd.writeStream.format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val finished = try q.awaitTermination(300000) finally q.stop()
    if (!finished) throw new IllegalStateException(
      "q168: streaming query did not terminate within 300 s")
    s.read.parquet(out.toString)
      .select($"event_id", unix_micros($"ts").as("ts_us"),
        $"user_id", $"event_type")
      .orderBy($"event_id", $"ts_us", $"user_id", $"event_type")
  }

  val q168Sql: String =
    """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
      |            FROM events),
      |uni AS (SELECT * FROM ev
      |        UNION ALL SELECT * FROM ev WHERE event_id % 5 = 0)
      |SELECT DISTINCT event_id, ts_us, user_id, event_type
      |FROM uni ORDER BY event_id, ts_us, user_id, event_type""".stripMargin

  val q155Sql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |v AS (SELECT user_id, event_id AS view_id, ts_us AS view_ts_us
      |      FROM ev WHERE event_type = 'view'),
      |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_ts_us
      |      FROM ev WHERE event_type = 'click')
      |SELECT v.user_id, view_id, click_id, view_ts_us, click_ts_us
      |FROM v JOIN c ON v.user_id = c.user_id
      |  AND click_ts_us > view_ts_us
      |  AND click_ts_us <= view_ts_us + 1800000000
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q110
  /** Z-order layout audit: Morton-interleave (o_custkey, order-day)
    * via [[graft.operators.ZOrder]] and report per-z-bucket rectangle
    * stats (row count + min/max of BOTH dimensions). The point of the
    * layout is visible in the output: every bucket of the z-range
    * bounds a small rectangle in (custkey, day) space, which is
    * exactly what makes parquet footer min/max stats prune scans with
    * predicates on either column after `ZOrder.cluster` writes the
    * layout. All arithmetic is integer bit manipulation — identical in
    * any engine, so the audit is hash-exact. Day anchor 1995-01-01
    * (epoch µs 788918400000000) keeps the second coordinate in 12
    * bits. */
  def q110ZOrderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .withColumn("day", expr(
        "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) - 788918400000000) div 86400000000"))
      .withColumn("zkey",
        graft.operators.ZOrder.zkey($"o_custkey", $"day", bits = 12))
    o.groupBy(shiftright($"zkey", 18).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"o_custkey").as("min_ck"), max($"o_custkey").as("max_ck"),
        min($"day").as("min_day"), max($"day").as("max_day"))
      .orderBy($"bucket")
  }

  val q110Sql: String = {
    val zk = graft.operators.ZOrder.sqlZkey("o_custkey", "day", 12)
    s"""WITH o AS (SELECT o_custkey,
       |  (epoch_us(o_orderdate) - 788918400000000) // 86400000000 AS day FROM orders),
       |z AS (SELECT o_custkey, day, $zk AS zkey FROM o)
       |SELECT zkey >> 18 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
       |  MIN(day) AS min_day, MAX(day) AS max_day
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q148
  /** N-dimensional Z-order layout audit — q110's rectangle check in
    * THREE dimensions via [[graft.operators.ZOrder.zkeyN]] (round-
    * robin bit interleave, the Delta/Iceberg multi-column clustering
    * form): (custkey, order-day, whole-dollar price) interleave into
    * one 36-bit key; every 64th-of-z-range bucket bounds a small box
    * in all three dimensions at once, which is what multi-column
    * min/max file skipping buys. Integer bit arithmetic end to end —
    * hash-exact in any engine. */
  def q148ZOrder3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .withColumn("day", expr(
        "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) - 788918400000000) div 86400000000"))
      // floor on BOTH engines: DuckDB's decimal→bigint cast ROUNDS
      // while Spark's truncates — an explicit floor of the exact
      // decimal is identical everywhere (prices are positive)
      .withColumn("usd", expr(
        "CAST(floor(CAST(o_totalprice AS DECIMAL(12,2))) AS BIGINT)"))
      .withColumn("zkey", graft.operators.ZOrder.zkeyN(
        Seq($"o_custkey", $"day", $"usd"), bits = 12))
    o.groupBy(shiftright($"zkey", 30).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"o_custkey").as("min_ck"), max($"o_custkey").as("max_ck"),
        min($"day").as("min_day"), max($"day").as("max_day"),
        min($"usd").as("min_usd"), max($"usd").as("max_usd"))
      .orderBy($"bucket")
  }

  val q148Sql: String = {
    val zk = graft.operators.ZOrder.sqlZkeyN(Seq("o_custkey", "day", "usd"), 12)
    s"""WITH o AS (SELECT o_custkey,
       |  (epoch_us(o_orderdate) - 788918400000000) // 86400000000 AS day,
       |  CAST(FLOOR(CAST(o_totalprice AS DECIMAL(12,2))) AS BIGINT) AS usd FROM orders),
       |z AS (SELECT o_custkey, day, usd, $zk AS zkey FROM o)
       |SELECT zkey >> 30 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
       |  MIN(day) AS min_day, MAX(day) AS max_day,
       |  MIN(usd) AS min_usd, MAX(usd) AS max_usd
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q150
  /** Robust daily-volume anomaly detection per event type — median /
    * MAD instead of mean / stddev, so a burst day cannot drag its own
    * baseline (the reason ops monitoring uses MAD): daily counts →
    * per-type exact median (ceil-rank order statistic via
    * [[graft.operators.ExactQuantiles.byGroup]] — histogram shuffle,
    * never a sort) → median absolute deviation the same way → flag
    * days with |c − med| > 3·MAD. Every quantity is an exact integer;
    * the oracle repeats the identical ceil-rank arithmetic. */
  def q150MadAnomalies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .groupBy($"event_type", expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val med = graft.operators.ExactQuantiles
      .byGroup(daily, Seq("event_type"), "c", Seq(50))
      .select($"event_type", $"p50".as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("adev", abs($"c" - $"med"))
    val mad = graft.operators.ExactQuantiles
      .byGroup(dev, Seq("event_type"), "adev", Seq(50))
      .select($"event_type", $"p50".as("mad"))
    dev.join(mad, "event_type")
      .select($"event_type", $"day", $"c", $"med", $"mad",
        when($"adev" > $"mad" * 3, 1L).otherwise(0L).as("is_anom"))
      .orderBy($"event_type", $"day")
  }

  val q150Sql: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |h1 AS (SELECT event_type, c, COUNT(*) AS k FROM daily GROUP BY 1, 2),
      |w1 AS (SELECT event_type, c,
      |    SUM(k) OVER (PARTITION BY event_type ORDER BY c) AS cum,
      |    SUM(k) OVER (PARTITION BY event_type) AS total FROM h1),
      |med AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= (total*50+99)//100 THEN c END) AS med
      |  FROM w1 GROUP BY 1),
      |dev AS (SELECT d.event_type, d.day, d.c, m.med, abs(d.c - m.med) AS adev
      |  FROM daily d JOIN med m USING (event_type)),
      |h2 AS (SELECT event_type, adev, COUNT(*) AS k FROM dev GROUP BY 1, 2),
      |w2 AS (SELECT event_type, adev,
      |    SUM(k) OVER (PARTITION BY event_type ORDER BY adev) AS cum,
      |    SUM(k) OVER (PARTITION BY event_type) AS total FROM h2),
      |mad AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= (total*50+99)//100 THEN adev END) AS mad
      |  FROM w2 GROUP BY 1)
      |SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.c, d.med, a.mad,
      |  CAST(CASE WHEN d.adev > a.mad * 3 THEN 1 ELSE 0 END AS BIGINT) AS is_anom
      |FROM dev d JOIN mad a USING (event_type)
      |ORDER BY d.event_type, d.day""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Markov transition matrix over each user's event sequence: counts
    * and row-normalized probabilities of event_type → next event_type
    * (the session-modeling / next-action-prediction primitive; also
    * the bot-vs-human fingerprint behavioral analytics reads). LAG
    * partitions by user_id (high cardinality, parallel), ordered by
    * (ts_us, event_id) so timestamp ties are deterministic; the
    * probability is one double division of exact longs. */
  def q120MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    events(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      // row totals as a window over the ALREADY-aggregated frame (one
      // row per transition pair) — a groupBy+join would re-execute the
      // whole scan+window subtree (column pruning defeats
      // ReuseExchange; verified in the plan)
      .withColumn("row_total",
        sum($"cnt").over(Window.partitionBy($"prev_type")))
      .select($"prev_type", $"event_type", $"cnt",
        ($"cnt" / $"row_total").as("prob"))
      .orderBy($"prev_type", $"event_type")
  }

  val q120Sql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |lg AS (SELECT event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      |       FROM ev),
      |tr AS (SELECT prev_type, event_type, COUNT(*) AS cnt
      |       FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev_type, SUM(cnt) AS row_total FROM tr GROUP BY 1)
      |SELECT t.prev_type, t.event_type, CAST(t.cnt AS BIGINT) AS cnt,
      |  t.cnt * 1.0 / tot.row_total AS prob
      |FROM tr t JOIN tot USING (prev_type)
      |ORDER BY prev_type, event_type""".stripMargin

  // ---------------------------------------------------------------- q122
  /** Market-basket co-purchase pairs: for every unordered pair of
    * distinct parts appearing in the same order, the number of orders
    * containing both — the association-rule / recommendation
    * primitive. The self-join is keyed by l_orderkey, so fan-out is
    * bounded by basket size squared (baskets are small by nature),
    * never corpus-quadratic; per-order part lists are deduped BEFORE
    * pairing so quantities/line splits don't inflate counts. Support
    * filter >= 3, top 50 by support with pair tiebreak. */
  def q122CoPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r17 (guide §2.3/§2.4): ONE scan + one exchange keyed l_orderkey
    // with a map-side-combined collect_set, then the native long_pairs
    // generator emits each basket's unordered (min, max) pairs — the
    // former shape scanned lineitem TWICE (two separate distinct
    // subtrees feeding a self-join) and re-materialized the Σ·b² pair
    // stream through a join. Pair VALUES are a pure function of the
    // basket SET, so collect_set's nondeterministic order is
    // aggregated away; support counts are unchanged (pinned by the
    // oracle hash).
    t(s, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .groupBy($"ok").agg(collect_set($"pk").as("ps"))
      .select(explode(expr("long_pairs(ps)")).as("p"))
      .groupBy($"p.a".as("part_a"), $"p.b".as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= 3L)
      .orderBy($"support".desc, $"part_a", $"part_b")
      .limit(50)
  }

  val q122Sql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      |SELECT x.pk AS part_a, y.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS support
      |FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
      |GROUP BY x.pk, y.pk
      |HAVING COUNT(*) >= 3
      |ORDER BY support DESC, part_a, part_b
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q125
  /** Integer-exact CUSUM changepoint scan over the daily event-count
    * series: deviation of each day from the global mean without any
    * division (dev_d = n_days·c_d − total — the mean scaled by
    * n_days), cumulative-summed in day order; the day where |cusum|
    * peaks is the level-shift changepoint estimate (classic CUSUM).
    * All integers end-to-end, so the scan is hash-exact. The series is
    * one row per DAY (calendar-bounded, tiny by design) — the global
    * windows run on that reduced frame, never on raw events; the raw
    * scan reduces map-side into the per-day counts. */
  def q125Changepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = events(s, dir)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val wRun = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byDay
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum($"c").over(wAll))
      .withColumn("dev", $"n_days" * $"c" - $"total")
      .withColumn("cusum", sum($"dev").over(wRun))
      .withColumn("is_peak",
        (abs($"cusum") === max(abs($"cusum")).over(wAll)).cast("long"))
      .select($"day", $"c", $"dev", $"cusum", $"is_peak")
      .orderBy($"day")
  }

  val q125Sql: String =
    """WITH byday AS (SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1),
      |w AS (SELECT day, c,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_days,
      |    CAST(SUM(c) OVER () AS BIGINT) AS total
      |  FROM byday),
      |d AS (SELECT day, c, n_days * c - total AS dev FROM w),
      |cs AS (SELECT day, c, dev,
      |    CAST(SUM(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
      |  FROM d)
      |SELECT CAST(day AS BIGINT) AS day, CAST(c AS BIGINT) AS c,
      |  CAST(dev AS BIGINT) AS dev, cusum,
      |  CAST(CASE WHEN abs(cusum) = MAX(abs(cusum)) OVER () THEN 1 ELSE 0 END AS BIGINT) AS is_peak
      |FROM cs ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Daily-revenue trend slope — ordinary-least-squares over the
    * (day, revenue-in-cents) series with q121's exact-sum discipline:
    * revenue is summed per day in DECIMAL then scaled to integer
    * cents, the five OLS sums are exact integers, products of sums go
    * through DECIMAL(38,0) (≡ HUGEIT exact), and the slope is ONE
    * double division — no per-row floats, no libm. The series is one
    * row per day; the raw scan reduces map-side. */
  def q126TrendSlope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = t(s, dir, "orders")
      .groupBy(expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
      .agg((sum(m2($"o_totalprice")) * 100).cast("long").as("cents"))
    val sums = byDay.agg(
      count(lit(1)).as("n"),
      sum($"day").as("sx"), sum($"cents").as("sy"),
      // sxy is the one sum that can wrap: day*cents is ~3.9e16 at
      // sf0.1, so ~200× that revenue volume overflows a BIGINT sum —
      // accumulate in DECIMAL(38,0) (≡ the oracle's HUGEINT). The
      // day*day and plain sums stay far inside long range.
      sum(($"day" * $"cents").cast("decimal(38,0)")).as("sxy"),
      sum($"day" * $"day").as("sxx"))
    def d(c: Column) = c.cast("decimal(38,0)")
    sums.select($"n", $"sx", $"sy",
      ((d($"n") * d($"sxy") - d($"sx") * d($"sy")).cast("double")
        / (d($"n") * d($"sxx") - d($"sx") * d($"sx")).cast("double"))
        .as("slope_cents_per_day"))
  }

  val q126Sql: String =
    """WITH byday AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy,
      |    CAST(SUM(day * cents) AS HUGEINT) AS sxy,
      |    CAST(SUM(day * day) AS BIGINT) AS sxx
      |  FROM byday)
      |SELECT n, sx, sy,
      |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |  AS slope_cents_per_day
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q127
  /** Column profiler over `orders` — the data-quality primitive every
    * warehouse runs first: per profiled column its null count, exact
    * distinct count, and min/max rendered as text (one scan; the
    * per-column stats stack into rows so adding a column is one map
    * entry, and distinct counts use Spark's exact count_distinct
    * under map-side partial aggregation). */
  def q127Profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .withColumn("odate_us", unix_micros($"o_orderdate".cast("timestamp")))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "odate_us")
    val aggCols = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")) }
    o.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col"), col(s"${c}__nn").as("n_null"),
        col(s"${c}__nd").as("n_distinct"), col(s"${c}__mn").as("min_repr"),
        col(s"${c}__mx").as("max_repr"))): _*)).as("s"))
      .select($"s.col", $"s.n_null", $"s.n_distinct", $"s.min_repr", $"s.max_repr")
      .orderBy($"col")
  }

  val q127Sql: String =
    """WITH o AS (SELECT *, epoch_us(o_orderdate) AS odate_us FROM orders),
      |s AS (
      |  SELECT 'o_orderkey' AS col, CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr, CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr FROM o
      |  UNION ALL
      |  SELECT 'o_custkey', CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
      |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM o
      |  UNION ALL
      |  SELECT 'o_orderstatus', CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
      |    MIN(o_orderstatus), MAX(o_orderstatus) FROM o
      |  UNION ALL
      |  SELECT 'o_orderpriority', CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
      |    MIN(o_orderpriority), MAX(o_orderpriority) FROM o
      |  UNION ALL
      |  SELECT 'odate_us', CAST(SUM(CASE WHEN odate_us IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(DISTINCT odate_us) AS BIGINT),
      |    CAST(MIN(odate_us) AS VARCHAR), CAST(MAX(odate_us) AS VARCHAR) FROM o)
      |SELECT * FROM s ORDER BY col""".stripMargin

  // ---------------------------------------------------------------- q128
  /** Referential-integrity audit: orphaned foreign keys across the
    * star schema (lineitem→orders, lineitem→part, lineitem→supplier,
    * orders→customer) — each check is one left-anti join on the key
    * (shuffle on a high-cardinality key; at 100 TB the dimension side
    * of small dims broadcasts). One row per relationship with child
    * row count and orphan count. */
  def q128FkAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def audit(rel: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String): DataFrame = {
      val total = child.agg(count(lit(1)).as("n_child"))
      val orphans = child.join(parent, child(fk) === parent(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      total.crossJoin(orphans).select(lit(rel).as("rel"), $"n_child", $"n_orphan")
    }
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .union(audit("lineitem.l_partkey->part", li, "l_partkey",
        t(s, dir, "part"), "p_partkey"))
      .union(audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey"))
      .union(audit("orders.o_custkey->customer", o, "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .orderBy($"rel")
  }

  val q128Sql: String =
    """SELECT 'lineitem.l_orderkey->orders' AS rel,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphan
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |   WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |   WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey))
      |UNION ALL
      |SELECT 'orders.o_custkey->customer',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |   WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |ORDER BY rel""".stripMargin

  // ---------------------------------------------------------------- q129
  /** Market share (the TPC-H Q8 shape): per order-year, the fraction
    * of total revenue contributed by customers of one nation — a
    * conditional-sum-over-sum with the full join tree (lineitem ⋈
    * orders ⋈ customer ⋈ broadcast nation). Both sums are exact
    * decimals; the share is one double division. Exercises the
    * multi-join + conditional aggregation path Catalyst reorders. */
  def q129MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .withColumn("yr", year($"o_orderdate".cast("timestamp")))
      .withColumn("amt", m2($"l_extendedprice") * m2(lit(1) - $"l_discount"))
    rev.groupBy($"yr")
      .agg(
        sum(when($"n_name" === "NATION_1", $"amt")
          .otherwise(lit(0).cast("decimal(12,2)"))).as("nat"),
        sum($"amt").as("tot"))
      .select($"yr".cast("long").as("yr"),
        $"nat".cast("double").as("nation_revenue"),
        $"tot".cast("double").as("total_revenue"),
        ($"nat".cast("double") / $"tot".cast("double")).as("share"))
      .orderBy($"yr")
  }

  val q129Sql: String =
    """WITH rev AS (
      |  SELECT year(o_orderdate) AS yr, n_name,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2)) AS amt
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |a AS (SELECT yr,
      |    SUM(CASE WHEN n_name = 'NATION_1' THEN amt ELSE CAST(0 AS DECIMAL(12,2)) END) AS nat,
      |    SUM(amt) AS tot
      |  FROM rev GROUP BY yr)
      |SELECT CAST(yr AS BIGINT) AS yr, CAST(nat AS DOUBLE) AS nation_revenue,
      |  CAST(tot AS DOUBLE) AS total_revenue,
      |  CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      |FROM a ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- q130
  /** Suppliers who kept multi-supplier orders waiting (the TPC-H Q21
    * shape): line items shipped after 1999-06-01 ("late") where the
    * order has ANOTHER supplier's line item (EXISTS / semi-join) but
    * no OTHER supplier shipped late (NOT EXISTS / anti-join) — the
    * correlated multi-quantifier pattern, compiled to one semi and one
    * anti join on (orderkey) with a supplier inequality. Count per
    * supplier, top 20. */
  def q130WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val cutoff = lit(java.sql.Timestamp.valueOf("1999-06-01 00:00:00"))
    val late = li.filter($"l_shipdate" > cutoff)
    val others = li.select($"l_orderkey".as("o_ok"), $"l_suppkey".as("o_sk"))
    val lateOthers = late.select($"l_orderkey".as("lo_ok"), $"l_suppkey".as("lo_sk"))
    late
      .join(others,
        $"l_orderkey" === $"o_ok" && $"l_suppkey" =!= $"o_sk", "left_semi")
      .join(lateOthers,
        $"l_orderkey" === $"lo_ok" && $"l_suppkey" =!= $"lo_sk", "left_anti")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"l_suppkey")
      .limit(20)
  }

  val q130Sql: String =
    """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |WHERE l1.l_shipdate > TIMESTAMP '1999-06-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > TIMESTAMP '1999-06-01 00:00:00')
      |GROUP BY l_suppkey
      |ORDER BY numwait DESC, l_suppkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q131
  /** Percentile standing of every order within its priority class:
    * rank-based percent_rank reimplemented from exact integers —
    * (rank − 1)/(n − 1) with rank() ties and the class row count from
    * a partition window, ONE double division — plus the decile bucket
    * from integer arithmetic (the distribution-placement window
    * pattern; per-class partitions parallelize). First 300 orders by
    * key for a bounded output. */
  def q131PercentileRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    val wc = Window.partitionBy($"o_orderpriority")
    t(s, dir, "orders")
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("pct_rank",
        when($"n" > 1L, ($"rnk" - 1L) / ($"n" - 1L)).otherwise(lit(0.0)))
      .withColumn("decile",
        least(expr("((rnk - 1) * 10) div n"), lit(9L)))
      .filter($"o_orderkey" < 300)
      .select($"o_orderkey", $"o_orderpriority", $"rnk", $"n",
        $"pct_rank", $"decile")
      .orderBy($"o_orderkey")
  }

  val q131Sql: String =
    """WITH r AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(RANK() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rnk,
      |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, rnk, n,
      |  CASE WHEN n > 1 THEN (rnk - 1) * 1.0 / (n - 1) ELSE 0.0 END AS pct_rank,
      |  CAST(least(((rnk - 1) * 10) // n, 9) AS BIGINT) AS decile
      |FROM r WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q136
  /** Time-to-convert distribution: for every user whose first view is
    * followed by a purchase, the view→purchase lag in seconds, reduced
    * to EXACT quartiles via the histogram order-statistic form
    * (distinct lag values shuffle, never user rows) — the funnel-
    * latency report next to q94's stage counts. All integers. */
  def q136ConvertLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
    val firstView = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_us").as("v_us"))
    val firstBuy = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts_us").as("p_us"))
    val lags = firstView.join(firstBuy, "user_id")
      .filter($"p_us" >= $"v_us")
      .selectExpr("(p_us - v_us) div 1000000 AS lag_s")
    graft.operators.ExactQuantiles
      .byGroup(lags.select(lit("all").as("g"), $"lag_s".as("q")),
        Seq("g"), "q", Seq(25, 50, 75))
      .select($"n", $"p25", $"p50", $"p75")
  }

  val q136Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS v_us FROM ev WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT user_id, MIN(ts_us) AS p_us FROM ev WHERE event_type = 'purchase' GROUP BY 1),
      |lag AS (SELECT (p_us - v_us) // 1000000 AS q FROM v JOIN p USING (user_id)
      |        WHERE p_us >= v_us),
      |h AS (SELECT q, COUNT(*) AS c FROM lag GROUP BY 1),
      |w AS (SELECT q, SUM(c) OVER (ORDER BY q) AS cum, SUM(c) OVER () AS total FROM h)
      |SELECT CAST(MAX(total) AS BIGINT) AS n,
      |  MIN(CASE WHEN cum >= (total*25+99)//100 THEN q END) AS p25,
      |  MIN(CASE WHEN cum >= (total*50+99)//100 THEN q END) AS p50,
      |  MIN(CASE WHEN cum >= (total*75+99)//100 THEN q END) AS p75
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- q137
  /** 7-day centered moving average of daily revenue — the smoothing
    * window every ops dashboard draws: per day, the exact decimal sum
    * of revenue cents over days [d−3, d+3] divided ONCE by the actual
    * window row count (edges shrink; integer count, one double
    * division). The window runs on the per-day series (calendar-
    * bounded), a RANGE frame over the integer day key. */
  def q137MovingAverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = t(s, dir, "orders")
      .groupBy(expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
      .agg((sum(m2($"o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.orderBy($"day").rangeBetween(-3L, 3L)
    byDay
      .withColumn("win_cents", sum($"cents").over(w))
      .withColumn("win_days", count(lit(1)).over(w))
      .select($"day", $"cents",
        ($"win_cents" / $"win_days").as("ma7_cents"))
      .orderBy($"day")
  }

  val q137Sql: String =
    """WITH byday AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |w AS (SELECT day, cents,
      |    CAST(SUM(cents) OVER (ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS win_cents,
      |    CAST(COUNT(*) OVER (ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS win_days
      |  FROM byday)
      |SELECT CAST(day AS BIGINT) AS day, cents,
      |  win_cents * 1.0 / win_days AS ma7_cents
      |FROM w ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q138
  /** Year-over-year growth per month: monthly revenue cents with the
    * same-month-last-year baseline and the growth ratio as one double
    * division of exact integers (NULL for the first year — absent
    * baselines stay NULL, never fabricated). Month key = yr·12 +
    * (mo−1); the baseline is a RANGE frame pinned at exactly mkey−12,
    * so a calendar month with zero orders yields NULL rather than
    * silently pairing with the wrong year's row (a row-based lag(12)
    * breaks on gapped series). The window is global-order but runs on
    * the ≤ #months post-aggregation rows — bounded, audited. */
  def q138YoyGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byMonth = t(s, dir, "orders")
      .withColumn("ts", $"o_orderdate".cast("timestamp"))
      .groupBy((year($"ts") * 12 + month($"ts") - 1).cast("long").as("mkey"))
      .agg((sum(m2($"o_totalprice")) * 100).cast("long").as("cents"))
    val w = Window.orderBy($"mkey").rangeBetween(-12, -12)
    byMonth
      .withColumn("prev_year_cents", max($"cents").over(w))
      .select(expr("mkey div 12").as("yr"), ($"mkey" % 12L + 1L).as("mo"),
        $"cents", $"prev_year_cents",
        ($"cents" / $"prev_year_cents").as("yoy_ratio"))
      .orderBy($"yr", $"mo")
  }

  val q138Sql: String =
    """WITH bym AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |w AS (SELECT mkey, cents,
      |    MAX(cents) OVER (ORDER BY mkey RANGE BETWEEN 12 PRECEDING AND 12 PRECEDING) AS prev_year_cents
      |  FROM bym)
      |SELECT CAST(mkey // 12 AS BIGINT) AS yr, CAST(mkey % 12 + 1 AS BIGINT) AS mo,
      |  cents, prev_year_cents,
      |  cents * 1.0 / prev_year_cents AS yoy_ratio
      |FROM w ORDER BY yr, mo""".stripMargin

  /** Query registry for this module. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_revenue_by_nation" -> q2RevenueByNation _,
    "q3_top_orders" -> q3TopOrders _,
    "q4_semi_join" -> q4SemiJoin _,
    "q5_anti_join" -> q5AntiJoin _,
    "q6_forecast" -> q6Forecast _,
    "q7_window_lag" -> q7WindowLag _,
    "q8_set_ops" -> q8SetOps _,
    "q9_rollup" -> q9Rollup _,
    "q10_distinct" -> q10Distinct _,
    "q11_rank_per_brand" -> q11RankPerBrand _,
    "q12_sessionize" -> q12Sessionize _,
    "q13_asof_join" -> q13AsOfJoin _,
    "q28_time_window" -> q28TimeWindow _,
    "q29_cube" -> q29Cube _,
    "q30_small_qty_revenue" -> q30SmallQtyRevenue _,
    "q31_salted_join" -> q31SaltedJoin _,
    "q32_setops_all" -> q32SetOpsAll _,
    "q33_approx_sketches" -> q33ApproxSketches _,
    "q34_pivot" -> q34Pivot _,
    "q35_json" -> q35Json _,
    "q39_range_join" -> q39RangeJoin _,
    "q40_asof_forward" -> q40AsofForward _,
    "q93_retention_cohorts" -> q93RetentionCohorts _,
    "q94_funnel" -> q94Funnel _,
    "q103_session_windows" -> q103SessionWindows _,
    "q155_click_attribution" -> q155ClickAttribution _,
    "q156_windowed_counts" -> q156WindowedCounts _,
    "q157_enriched_events" -> q157EnrichedEvents _,
    "q168_dedup_stream" -> q168DedupStream _,
    "q110_zorder_layout" -> q110ZOrderLayout _,
    "q148_zorder3" -> q148ZOrder3 _,
    "q150_mad_anomalies" -> q150MadAnomalies _,
    "q120_markov_transitions" -> q120MarkovTransitions _,
    "q122_copurchase" -> q122CoPurchase _,
    "q125_changepoint" -> q125Changepoint _,
    "q126_trend_slope" -> q126TrendSlope _,
    "q127_profile" -> q127Profile _,
    "q128_fk_audit" -> q128FkAudit _,
    "q129_market_share" -> q129MarketShare _,
    "q130_waiting_suppliers" -> q130WaitingSuppliers _,
    "q131_percentile_rank" -> q131PercentileRank _,
    "q136_convert_lag" -> q136ConvertLag _,
    "q137_moving_average" -> q137MovingAverage _,
    "q138_yoy_growth" -> q138YoyGrowth _,
  )

  def oracles: Map[String, String] = Map(
    "q39_range_join" -> q39Sql,
    "q40_asof_forward" -> q40Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_revenue_by_nation" -> q2Sql,
    "q3_top_orders" -> q3Sql,
    "q4_semi_join" -> q4Sql,
    "q5_anti_join" -> q5Sql,
    "q6_forecast" -> q6Sql,
    "q7_window_lag" -> q7Sql,
    "q8_set_ops" -> q8Sql,
    "q9_rollup" -> q9Sql,
    "q10_distinct" -> q10Sql,
    "q11_rank_per_brand" -> q11Sql,
    "q12_sessionize" -> q12Sql,
    "q13_asof_join" -> q13Sql,
    "q28_time_window" -> q28Sql,
    "q29_cube" -> q29Sql,
    "q30_small_qty_revenue" -> q30Sql,
    "q31_salted_join" -> q31Sql,
    "q32_setops_all" -> q32Sql,
    // q33_approx_sketches: rows-only (sketch implementations are engine-specific)
    "q34_pivot" -> q34Sql,
    "q35_json" -> q35Sql,
    "q93_retention_cohorts" -> q93Sql,
    "q94_funnel" -> q94Sql,
    "q103_session_windows" -> q103Sql,
    "q155_click_attribution" -> q155Sql,
    "q156_windowed_counts" -> q156Sql,
    "q157_enriched_events" -> q157Sql,
    "q168_dedup_stream" -> q168Sql,
    "q110_zorder_layout" -> q110Sql,
    "q148_zorder3" -> q148Sql,
    "q150_mad_anomalies" -> q150Sql,
    "q120_markov_transitions" -> q120Sql,
    "q122_copurchase" -> q122Sql,
    "q125_changepoint" -> q125Sql,
    "q126_trend_slope" -> q126Sql,
    "q127_profile" -> q127Sql,
    "q128_fk_audit" -> q128Sql,
    "q129_market_share" -> q129Sql,
    "q130_waiting_suppliers" -> q130Sql,
    "q131_percentile_rank" -> q131Sql,
    "q136_convert_lag" -> q136Sql,
    "q137_moving_average" -> q137Sql,
    "q138_yoy_growth" -> q138Sql,
  )
}
