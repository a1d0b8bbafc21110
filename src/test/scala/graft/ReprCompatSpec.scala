package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, ReprCompat}

class ReprCompatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("python repr emulation") {
    assert(ReprCompat.pyStrRepr("Begin", true) == "u'Begin'")
    assert(ReprCompat.pyStrRepr("plain title", false) == "'plain title'")
    // apostrophes but no double quote → double-quoted form
    assert(ReprCompat.pyStrRepr("The '''bold'''", true) == "u\"The '''bold'''\"")
    // both quote kinds → single-quoted with escaped apostrophes
    assert(ReprCompat.pyStrRepr("a 'b' \"c\"", true) == "u'a \\'b\\' \"c\"'")
    assert(ReprCompat.pyStrRepr("line\nbreak\ttab", true) == "u'line\\nbreak\\ttab'")
    assert(ReprCompat.pyStrRepr("café", true) == "u'caf\\xe9'")
    assert(ReprCompat.pyStrRepr("中", true) == "u'\\u4e2d'")
  }

  test("diffdb TSV lines match the reference layout") {
    val db = SparkEntry.entry(spark)
    val lines = ReprCompat.diffdbTsv(db).collect().sortBy(_.split("\t")(0).toLong)
    assert(lines.length == 6)
    val first = lines.head.split("\t")
    // rev_id, page_id, ns, title, ts, comment, minor, user_id, user_text, diffs...
    assert(first(0) == "101")
    assert(first(1) == "11")
    assert(first(2) == "0")
    assert(first(3) == "'Alpha Particle'")
    assert(first(4) == java.time.Instant.parse("2020-01-05T10:00:00Z").getEpochSecond.toString)
    assert(first(5) == "u'create page'")
    assert(first(6) == "False")
    assert(first(7) == "7")
    assert(first(8) == "u'EditorOne'")
    assert(first(9).startsWith("0:1:u"))
    // deleted-everything revision: None comment/user, -1 delete op
    val r103 = lines.find(_.startsWith("103\t")).get.split("\t")
    assert(r103(5) == "None")
    assert(r103(7) == "None")
    assert(r103(8) == "None")
    assert(r103(9).contains(":-1:u"))
    // minor flag
    val r102 = lines.find(_.startsWith("102\t")).get.split("\t")
    assert(r102(6) == "True")
  }
}
