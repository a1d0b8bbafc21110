package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WikitextStrip

/** Rule-chain semantics of the wikitext→plaintext projection beyond
  * what q158's corpus construction reaches: stacked entities, one
  * level of template nesting, unbalanced markup, idempotence. */
class WikitextStripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def strip(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(WikitextStrip.plain($"t")).head.getString(0)
  }

  test("well-formed markup strips to clean text") {
    assert(strip("== Head ==\n{{tmpl|arg}} [[A|b]] [[C]] '''bold''' x") ==
      " Head \n b C bold x")
  }

  test("one template nesting level; deeper unbalanced remainder survives unchanged") {
    assert(strip("a {{o|{{i}}}} b") == "a  b")
    // two levels of nesting exceed the documented bound: the outer
    // shell loses its inner templates but its own braces remain
    assert(strip("{{a|{{b|{{c}}}}}}") == "{{a|}}")
    assert(strip("{{unclosed [[also|un") == "{{unclosed [[also|un")
  }

  test("entity unescape order: &amp; last, so stacked entities unescape ONE level") {
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("&lt;b&gt; &quot;q&quot; &amp; r") == "<b> \"q\" & r")
  }

  test("idempotent on the q158 construction family") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wt = docs.select(concat(lit("== "), $"source", lit(" ==\n{{t|"), $"lang",
      lit("}} {{o|{{i}}}} [[T|shown]] [[Plain]] '''"),
      substring($"text", 1, 60), lit("''' &amp; &lt;x&gt;")).as("w"))
    val once = wt.select(WikitextStrip.plain($"w").as("p"))
    val diff = once
      .select($"p", WikitextStrip.plain($"p").as("p2"))
      .filter($"p" =!= $"p2").count()
    assert(diff == 0L)
  }
}
