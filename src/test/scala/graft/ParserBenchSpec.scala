package graft

import java.io.ByteArrayInputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CountingByteSource, PageRecordIterator}

/** Quick local throughput measurement of the pure parser (not a CI
  * assertion of speed; asserts only correctness, prints MB/s). */
class ParserBenchSpec extends AnyFunSuite {
  test("parser throughput on synthetic dump") {
    val sb = new StringBuilder
    sb.append("<mediawiki>\n")
    val rnd = new scala.util.Random(7)
    var revId = 0
    for (p <- 1 to 2000) {
      sb.append(s"<page><title>P$p</title><ns>0</ns><id>$p</id>\n")
      for (r <- 1 to 3) {
        revId += 1
        val filler = Array.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString
        sb.append(s"<revision><id>$revId</id><timestamp>2021-01-01T00:00:00Z</timestamp>")
        sb.append(s"<contributor><username>u</username><id>1</id></contributor>")
        sb.append(s"<text xml:space=\"preserve\">$filler</text></revision>\n")
      }
      sb.append("</page>\n")
    }
    sb.append("</mediawiki>\n")
    val bytes = sb.toString.getBytes("UTF-8")
    // warmup
    var it = new PageRecordIterator(new CountingByteSource(new ByteArrayInputStream(bytes), 0), 0, Long.MaxValue, false)
    assert(it.size == 6000)
    val t0 = System.nanoTime()
    it = new PageRecordIterator(new CountingByteSource(new ByteArrayInputStream(bytes), 0), 0, Long.MaxValue, false)
    val n = it.size
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"parsed $n revisions, ${bytes.length / 1e6}%.1f MB in $sec%.2f s = ${bytes.length / 1e6 / sec}%.1f MB/s")
    assert(n == 6000)
  }
}
