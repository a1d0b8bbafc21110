package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The writer's page-contiguity check in BOTH modes (r15 verdict #1:
  * the boxed per-page `HashSet` contradicted the writer's own
  * "nothing grows with page count" memory bound — the default sorted
  * route now uses an O(1) monotonic page_id comparison, and only
  * `assumeGrouped` keeps a revisit set, a primitive long set).
  *
  * The default route can't be violated through `df.write` (Spark's
  * required ordering sorts first), so these tests drive
  * [[MediaWikiDataWriter]] DIRECTLY with `queryExecution.toRdd` rows —
  * the same InternalRows a task would see — to pin the loud failure on
  * out-of-order pages with the set gone. */
class WriterContiguitySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private val fixture = "src/test/resources/fixtures/sample_dump.xml"

  /** (schema, rows) of the no-prev fixture frame — writer-shaped. */
  private def fixtureRows() = {
    val df = spark.read.format("mediawiki")
      .option("previousRevision", "false").load(fixture)
      .orderBy("page_id", "rev_seq")
    // toRdd rows are reused buffers: copy each before collecting
    (df.schema, df.queryExecution.toRdd.map(_.copy()).collect())
  }

  private def writerFor(schema: StructType, grouped: Boolean,
      dir: java.io.File): MediaWikiDataWriter = {
    val props = if (grouped) Map("assumeGrouped" -> "true")
      else Map.empty[String, String]
    new MediaWikiDataWriter(schema, MediaWikiWriterOpts.parse(props),
      dir.getAbsolutePath, Map.empty, 0, 0L)
  }

  test("default route: sorted pages write; an out-of-order page fails loudly") {
    val (schema, rows) = fixtureRows()
    assert(rows.map(_.getLong(schema.fieldIndex("page_id"))).distinct.length >= 2)
    val okDir = Files.createTempDirectory("wcs-ok").toFile
    val w = writerFor(schema, grouped = false, okDir)
    rows.foreach(w.write) // sorted by page_id: the monotonic check passes
    w.commit()
    // revisiting ANY earlier page must throw — with no set retained,
    // the monotonic check is the complete detector under the sort
    val badDir = Files.createTempDirectory("wcs-bad").toFile
    val w2 = writerFor(schema, grouped = false, badDir)
    rows.foreach(w2.write)
    val e = intercept[IllegalArgumentException] { w2.write(rows.head) }
    assert(e.getMessage.contains("not contiguous"))
    w2.abort()
  }

  test("assumeGrouped: arbitrary page ORDER is legal, a page REVISIT is not") {
    val (schema, rows) = fixtureRows()
    val pidOrd = schema.fieldIndex("page_id")
    // reverse page blocks: order is no longer monotone, but each page
    // stays contiguous — the set-based mode must accept this
    val blocks = rows.groupBy(_.getLong(pidOrd)).toSeq.sortBy(-_._1)
    val reordered = blocks.flatMap(_._2)
    val okDir = Files.createTempDirectory("wcs-g-ok").toFile
    val w = writerFor(schema, grouped = true, okDir)
    reordered.foreach(w.write)
    w.commit()
    // a revisit — the same first page again after others — must throw
    val badDir = Files.createTempDirectory("wcs-g-bad").toFile
    val w2 = writerFor(schema, grouped = true, badDir)
    reordered.foreach(w2.write)
    val e = intercept[IllegalArgumentException] { w2.write(reordered.head) }
    assert(e.getMessage.contains("not contiguous"))
    w2.abort()
  }

  test("LongIdSet: add/revisit, growth past the initial table, sentinel value") {
    val s = new LongIdSet(16)
    // growth: insert far past the initial capacity with adversarial
    // spacing (multiples collide under masking without the mixer)
    (0L until 10000L).foreach { i => assert(s.add(i * 1024L)) }
    (0L until 10000L).foreach { i => assert(!s.add(i * 1024L)) }
    assert(s.add(-1L)); assert(!s.add(-1L))
    // the internal empty-slot sentinel must still behave as a value
    assert(s.add(Long.MinValue)); assert(!s.add(Long.MinValue))
    assert(s.add(Long.MaxValue)); assert(!s.add(Long.MaxValue))
  }
}
