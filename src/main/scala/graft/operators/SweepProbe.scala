package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-rehearsal probe: driver broadcast sweep vs distributed block
  * sweep on the same shingle frame — equal pair counts asserted, both
  * timed (min of 2). The block budget is passed small so a local run
  * exercises a REAL grid (at its 64 MB default a 50 k-doc corpus is a
  * single block, i.e. one task — the default is sized for the
  * multi-million-doc corpora the operator exists for).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.operators.SweepProbe \
  *          <sfDir> [blockBytes]
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val blockBytes = if (args.length > 1) args(1).toLong else 4L * 1024 * 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))
    def minOf2(f: => Long): (Double, Long) = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (a, n) = one(); val (b, _) = one(); (math.min(a, b), n)
    }
    val (tDrv, nDrv) = minOf2(JaccardPairs.pairs(sh, 0.5).count())
    val (tBlk, nBlk) = minOf2(
      JaccardPairs.blockSweepPairs(sh, 0.5, targetBlockBytes = blockBytes).count())
    println(f"[sweepprobe] dir=$dir blockBytes=$blockBytes")
    // cross-round validity stamp: gen_scale.py writes
    // BASE_FINGERPRINT.json with match=false when the base sf0.1
    // corpus drifted from the committed fingerprint — probe rows from
    // such a build must not be compared against prior rounds'
    val fpFile = new java.io.File(dir, "BASE_FINGERPRINT.json")
    if (fpFile.isFile) {
      val fp = scala.io.Source.fromFile(fpFile)
      val txt = try fp.mkString finally fp.close()
      val ok = txt.contains("\"match\": true")
      println(s"[sweepprobe] base fingerprint match=$ok" +
        (if (ok) "" else "  <-- NOT comparable to prior rounds"))
    } else println("[sweepprobe] base fingerprint: no stamp (pre-r11 corpus?)")
    println(f"[sweepprobe] driver-dispatch min=$tDrv%6.2f s pairs=$nDrv")
    println(f"[sweepprobe] block-sweep     min=$tBlk%6.2f s pairs=$nBlk")
    assert(nDrv == nBlk, s"pair counts diverge: $nDrv vs $nBlk")
    // grid-shape evidence for the cluster-scale claim: per-task
    // resident memory is EXACTLY the two block signature sets a task
    // receives, and the grid's load balance is the pair-ops spread
    // across the B(B+1)/2 tasks. Computed from the same id→block
    // assignment the sweep uses, so this measures the real grid.
    val docs = sh.select($"doc_id".cast("long")).distinct().as[Long].collect()
    val vocabN = sh.select($"shingle").distinct().count()
    val nWords = math.max((vocabN + 63) >>> 6, 1L)
    // sizing and assignment SHARED with BlockGrid.sweep — the printed
    // shape is the grid the sweep actually ran
    val nBlocks = BlockGrid.nBlocksFor(docs.length.toLong, nWords, blockBytes)
    val cnt = new Array[Long](nBlocks)
    docs.foreach(id => cnt(BlockGrid.blockOf(id, nBlocks)) += 1)
    var maxBytes = 0L; var maxOps = 0.0; var sumOps = 0.0; var tasks = 0
    for (lo <- 0 until nBlocks; hi <- lo until nBlocks) {
      val bytes = (if (lo == hi) cnt(lo) else cnt(lo) + cnt(hi)) * nWords * 8
      val ops = if (lo == hi) cnt(lo).toDouble * (cnt(lo) - 1) / 2 * nWords
                else cnt(lo).toDouble * cnt(hi) * nWords
      maxBytes = math.max(maxBytes, bytes)
      maxOps = math.max(maxOps, ops); sumOps += ops; tasks += 1
    }
    println(f"[sweepprobe] grid: nDocs=${docs.length} vocab=$vocabN words=$nWords blocks=$nBlocks tasks=$tasks")
    println(f"[sweepprobe] grid: block docs min=${cnt.min} mean=${docs.length.toDouble / nBlocks}%.0f max=${cnt.max}")
    println(f"[sweepprobe] grid: task resident max=${maxBytes / 1024.0 / 1024.0}%.1f MB (≤ 2 blocks), pair-op skew max/mean=${maxOps / (sumOps / tasks)}%.2f")
    spark.stop()
  }
}
