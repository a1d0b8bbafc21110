package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-level repeated-sequence mining via sorted suffix windows —
  * the suffix-array approach to substring-level training-data dedup
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better"), bounded to a `window`-token horizon so every
  * stage stays linear in corpus tokens.
  *
  * Construction: every token position contributes its next-`window`
  * -token suffix; sorting all windows lexicographically puts any two
  * occurrences of a repeated sequence next to each other, so the
  * token-LCP (longest common prefix) of ADJACENT windows in sorted
  * order recovers every repeated sequence up to length `window` —
  * exactly the neighbor-LCP scan of a suffix array, without ever
  * materializing arbitrary-length suffixes. Windows are compared as
  * their space-joined strings: ' ' (0x20) sorts below every
  * printable token character, so string order coincides with
  * token-array lexicographic order.
  *
  * Scale shape: the ONLY corpus-sized stages are the position explode
  * and one hash exchange into deterministic key-range buckets.
  * Bucket boundaries are [[PrefixSum]]'s cut-point literals (a pure
  * function of the data — no `repartitionByRange`, whose sampled
  * boundaries differ per execution), so the two consuming passes
  * (in-bucket neighbor scan; per-bucket head/tail rows) can never
  * disagree on placement. Cross-bucket neighbor pairs are closed by
  * a driver-side pass over ≤ 2·numParts boundary rows (the
  * CC-convergence-collect justification: bounded by partition count,
  * not data). Equal-window runs MAY split across buckets — the cut
  * tiebreak includes (doc_id, position) — so a hot repeated sequence
  * cannot create a straggler bucket. The windows and sorted frames
  * are persisted only within the call and freed before return; the
  * returned top-`topK` frame is eagerly localCheckpoint'ed (≤ topK
  * rows). At 100 TB the persist becomes a shuffle-files reuse /
  * external sort concern, same as the reference algorithm's
  * disk-backed suffix sort.
  */
object RepeatedSequences {

  /** Token-LCP of two token arrays (# of equal leading elements). */
  private[graft] def lcpLen(a: Array[String], b: Array[String]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  /** r16 driver-finish cap on collected window rows (~60-80 B each at
    * the word level → ≤ ~300 MB at the cap). LIMIT-probed, so an
    * over-cap corpus pays one partial scan and stays on the
    * distributed bucketed sort. */
  private[graft] val DriverWindowLimit = 4000000L

  /** The sorted neighbor-LCP scan in memory: sort by (ws UTF8-binary,
    * doc_id, p) — exactly the bucketed `sortWithinPartitions` order —
    * then adjacent lcpLen, distinct, (lcp DESC, seq) top-k. The
    * (lcp, seq) result set is provably invariant to how equal-ws ties
    * order (equal windows pair to a full-window lcp either way), but
    * the comparator mirrors Spark's anyway. */
  private def driverTopRepeats(s: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row], topK: Int): DataFrame = {
    import org.apache.spark.unsafe.types.UTF8String
    final case class W(doc: Long, p: Long, ws: String, u8: UTF8String)
    val ws = new Array[W](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val w = r.getString(2)
      ws(i) = W(r.getLong(0), r.getLong(1), w, UTF8String.fromString(w))
      i += 1
    }
    java.util.Arrays.sort(ws, new java.util.Comparator[W] {
      def compare(a: W, b: W): Int = {
        val c = a.u8.compareTo(b.u8)
        if (c != 0) c
        else if (a.doc != b.doc) java.lang.Long.compare(a.doc, b.doc)
        else java.lang.Long.compare(a.p, b.p)
      }
    })
    val seen = scala.collection.mutable.HashSet.empty[(Long, String)]
    i = 1
    var prev: Array[String] = if (ws.nonEmpty) ws(0).ws.split(" ", -1) else null
    while (i < ws.length) {
      val cur = ws(i).ws.split(" ", -1)
      val l = lcpLen(prev, cur)
      if (l >= 1) seen += ((l.toLong, cur.take(l).mkString(" ")))
      prev = cur
      i += 1
    }
    val top = seen.toArray
    java.util.Arrays.sort(top, new java.util.Comparator[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
        else UTF8String.fromString(a._2).compareTo(UTF8String.fromString(b._2))
      }
    })
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val out = top.take(topK).map { case (l, seq) => Row(l, seq) }
    s.createDataFrame(s.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField("lcp", LongType, nullable = false),
        StructField("seq", StringType, nullable = true))))
  }

  /** Top-`topK` distinct repeated sequences: `(lcp, seq)` = token
    * length and text of a maximal-up-to-`window` repeated prefix
    * shared by at least two corpus positions, ordered by
    * (lcp DESC, seq). Deterministic — output is a pure function of
    * the corpus, invariant to partitioning (pinned by spec). */
  def topRepeats(docs: DataFrame, idCol: String, textCol: String,
                 window: Int = 8, topK: Int = 25, numParts: Int = 0,
                 driverLimit: Long = DriverWindowLimit): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val n = if (numParts > 0) numParts else s.sparkContext.defaultParallelism
    // split in its own projection BELOW the generate (ExtractGenerator
    // hoists same-select aliases above it — the r5 lesson)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("ts"))
    val win = toks
      .select(col("doc_id"), col("ts"), posexplode(col("ts")))
      .select(col("doc_id"), (col("pos") + 1).as("p"),
        array_join(slice(col("ts"), col("pos") + 1, lit(window)), " ").as("ws"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // r16 driver-finish: a LIMIT-probed collect of the WINDOWS frame
      // (Spark's own split/slice/join construction — nothing
      // re-implemented) runs the sort + neighbor-LCP scan + distinct +
      // top-k in memory. Sort order mirrors the cut/sortWithinPartitions
      // order exactly: ws by UTF8String BINARY bytes, then doc_id, then
      // p. An over-cap corpus pays one partial scan (the persist makes
      // the two-phase fallback reuse it) — at 100 TB the bucketed
      // external sort below is the right formulation.
      if (driverLimit > 0) {
        val capI = math.min(driverLimit + 1, Int.MaxValue.toLong - 1).toInt
        val rows = win.select(col("doc_id"), col("p").cast("long"), col("ws"))
          .limit(capI).collect()
        if (rows.length <= driverLimit)
          return driverTopRepeats(s, rows, topK)
      }
      val ordCols = Seq("ws", "doc_id", "p")
      val cuts = PrefixSum.deterministicCuts(win, ordCols, n)
      val bucket = PrefixSum.bucketExpr(ordCols, cuts)
      val sorted = win.withColumn("__b", bucket)
        .repartition(n, col("__b"))
        .sortWithinPartitions(col("__b"), col("ws"), col("doc_id"), col("p"))
        .select(col("__b").cast("int"), col("ws")).as[(Int, String)]
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // per-bucket head/tail windows (each bucket lives in exactly one
        // physical partition; rows arrive bucket-then-key sorted)
        val bounds = sorted.mapPartitions { it =>
          val acc = scala.collection.mutable.LinkedHashMap.empty[Int, (String, String)]
          it.foreach { case (b, ws) =>
            acc(b) = acc.get(b) match {
              case None => (ws, ws)
              case Some((h, _)) => (h, ws)
            }
          }
          acc.iterator.map { case (b, (h, t)) => (b, h, t) }
        }.collect()
        // in-bucket adjacent pairs: one sequential scan per partition
        val internal = sorted.mapPartitions { it =>
          var prevB = Int.MinValue
          var prev: Array[String] = null
          it.flatMap { case (b, ws) =>
            val cur = ws.split(" ", -1)
            val out =
              if (b == prevB && prev != null) {
                val l = lcpLen(prev, cur)
                if (l >= 1) Iterator.single((l.toLong, cur.take(l).mkString(" ")))
                else Iterator.empty
              } else Iterator.empty
            prevB = b
            prev = cur
            out
          }
        }.toDF("lcp", "seq")
        // cross-bucket pairs: tail of bucket b with head of the next
        // nonempty bucket — ≤ numParts - 1 driver-side comparisons
        val boundaryPairs = bounds.sortBy(_._1).toSeq.sliding(2).collect {
          case Seq((_, _, tail), (_, head, _)) =>
            val h = head.split(" ", -1)
            val l = lcpLen(tail.split(" ", -1), h)
            (l.toLong, h.take(l).mkString(" "))
        }.filter(_._1 >= 1).toSeq
        val top = internal
          .union(s.createDataset(boundaryPairs).toDF("lcp", "seq"))
          .distinct()
          .orderBy(col("lcp").desc, col("seq"))
          .limit(topK)
        top.localCheckpoint(true)
      } finally sorted.unpersist()
    } finally win.unpersist()
  }
}
