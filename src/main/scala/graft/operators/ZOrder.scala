package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the low `bits` bits of two
  * integer columns into one sort key so that range predicates on
  * EITHER dimension prune contiguous key ranges — the standard
  * multi-dimensional clustering trick for parquet data skipping
  * (min/max stats per file stay tight on both columns at once).
  *
  * At 100 TB this is a WRITE-SIDE operator: `cluster` range-partitions
  * by the key and sorts within partitions, so every output file covers
  * a small rectangle of (x, y) space; scans with predicates on either
  * column then skip most files on footer stats alone. The key itself
  * is 2·bits bits of plain integer arithmetic — codegen-friendly, no
  * UDF, exact in any engine — which is what makes it oracle-checkable
  * (`sqlZkey` emits the identical computation as portable SQL).
  */
object ZOrder {

  /** Morton key: bit b of x lands at position 2b, bit b of y at 2b+1.
    * Inputs must be non-negative and fit in `bits` bits (callers mask
    * or offset first); the result fits in 2·bits bits of a long. */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    // widen to long FIRST: shiftleft on an IntegerType column wraps at
    // 32 bits, silently dropping interleave positions above 15 for
    // int32 inputs — the long cast makes the arithmetic match
    // sqlZkey's BIGINT semantics for any integer input width
    val xl = x.cast("long")
    val yl = y.cast("long")
    val terms = (0 until bits).flatMap { b =>
      Seq(shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b),
          shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** The identical key as engine-portable SQL over expressions `x`/`y`
    * (DuckDB and Spark share `>>`, `&`, `<<` semantics on BIGINT).
    * Every term is fully parenthesized: Postgres-family grammars give
    * `<<` LOWER precedence than `+`, so an unparenthesized
    * `a << 0 + b << 1` chain parses as `a << (0 + b) << …`. */
  def sqlZkey(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { b =>
      Seq(s"(((($x) >> $b) & 1) << ${2 * b})",
          s"(((($y) >> $b) & 1) << ${2 * b + 1})")
    }.mkString("(", " + ", ")")

  /** N-dimensional Morton key: bit b of column i lands at position
    * b·k + i (k = number of columns) — the same round-robin
    * interleave Delta/Iceberg clustering uses for >2 dimensions. The
    * result must fit a long: k·bits ≤ 63. */
  def zkeyN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "zkeyN needs at least 2 columns")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a long")
    val longs = cols.map(_.cast("long"))
    val k = cols.size
    val terms = (0 until bits).flatMap { b =>
      longs.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
      }
    }
    terms.reduce(_ + _).cast("long")
  }

  /** [[zkeyN]] as engine-portable SQL (same parenthesization rule). */
  def sqlZkeyN(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        s"(((($c) >> $b) & 1) << ${b * k + i})"
      }
    }.mkString("(", " + ", ")")
  }

  /** Write-layout: add the z-key, range-partition by it into
    * `numParts` output slices and sort within each — every slice then
    * owns one contiguous z-range, i.e. a bounded rectangle set in
    * (x, y). The z column is kept (callers may drop it after write).
    *
    * Note the repartitionByRange sampling caveat: the returned frame
    * should be consumed by exactly one action (a write); consuming one
    * lazy handle from several branches re-samples range boundaries. */
  def cluster(df: DataFrame, x: Column, y: Column, bits: Int,
              numParts: Int, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol, zkey(x, y, bits))
      .repartitionByRange(numParts, col(zCol))
      .sortWithinPartitions(zCol)
}
