package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Shared primitives for the r16 driver-finish paths of the iterative
  * graph operators. [[KCore]] pioneered the pattern (and keeps its own
  * inline copy): when the deduped edge set fits a bounded collect
  * (size known BEFORE collecting — the count doubles as the persist
  * materializer the first distributed round would pay anyway), the
  * remaining iteration is a tight O(V+E)-ish primitive-array loop on
  * the driver instead of `rounds × (join + agg + lineage cut + count)`
  * Spark jobs whose cost on a sub-cap graph is pure scheduling
  * overhead. Each operator's arithmetic is exact (integer sums /
  * floor divisions / single-IEEE-op divisions), so the driver pass is
  * bit-identical to the distributed fixpoint — pinned per operator by
  * driver≡distributed spec cross-checks.
  *
  * At 100 TB the early/large phases stay distributed: the dispatch is
  * a count comparison, and graphs over the cap never collect. Same
  * bounded-collect class as [[DriverSweep]]'s dense-regime dispatch.
  */
private[graft] object DriverGraph {

  /** Default bounded-collect cap: two longs per edge ≤ ~64 MB of
    * primitive arrays at the cap (the [[KCore.DriverPeelEdgeLimit]]
    * sizing). Operators with super-linear per-edge work bound their
    * WORK separately after the (cheap) collect. */
  val DefaultEdgeLimit = 4000000L

  /** Driver paths cast node ids to long and back; anything outside the
    * integral family stays distributed. */
  def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Collect two integral columns as primitive long arrays. */
  def collectPairs(df: DataFrame, c1: String, c2: String): (Array[Long], Array[Long]) = {
    val rows = df.select(col(c1).cast("long"), col(c2).cast("long")).collect()
    val m = rows.length
    val x = new Array[Long](m)
    val y = new Array[Long](m)
    var i = 0
    while (i < m) {
      val r = rows(i)
      x(i) = r.getLong(0); y(i) = r.getLong(1)
      i += 1
    }
    (x, y)
  }

  /** Sorted distinct values of both arrays — the dense node index
    * (position = dense id, value = original id, lookup = binary
    * search). */
  def denseIndex(x: Array[Long], y: Array[Long]): Array[Long] = {
    val all = new Array[Long](x.length + y.length)
    System.arraycopy(x, 0, all, 0, x.length)
    System.arraycopy(y, 0, all, x.length, y.length)
    java.util.Arrays.sort(all)
    var n = 0
    var i = 0
    while (i < all.length) {
      if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(all, n)
  }

  def idx(ids: Array[Long], v: Long): Int =
    java.util.Arrays.binarySearch(ids, v)

  /** CSR over directed arcs (src dense id → dst dense id). */
  def csr(n: Int, src: Array[Int], dst: Array[Int]): (Array[Int], Array[Int]) = {
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < src.length) { off(src(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val adj = new Array[Int](src.length)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < src.length) {
      adj(fill(src(i))) = dst(i); fill(src(i)) += 1
      i += 1
    }
    (off, adj)
  }
}
