package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wikitext → plaintext projection — the markup-stripping pass every
  * wiki-corpus training pipeline runs between the dump (the
  * reference's domain: revision texts are wikitext,
  * `fileformat.rst:24-27`) and tokenization. Map-only, codegen'd
  * (nested `regexp_replace`/`replace` — no UDF), so it composes with
  * the curation projections (StreamOps.curateDocs) on batch frames and
  * micro-batches alike.
  *
  * The rule set is the Java/RE2-common subset (the q52 PiiRedact
  * precedent): no backreferences in PATTERNS, no lookaround, so the
  * same rules run engine-exact in DuckDB SQL (q158's oracle) — only
  * the replacement-group SYNTAX differs ($1 vs \1).
  *
  * Rules, in order (order matters and is part of the contract):
  *  1. `{{...}}` templates dropped (one nesting level per pass; a
  *     second pass handles one level of nesting — documented bound,
  *     not a parser).
  *  2. `[[target|shown]]` piped links → shown text.
  *  3. `[[target]]` plain links → target.
  *  4. bold/italic apostrophe runs (2+ apostrophes) dropped.
  *  5. heading `=`-runs dropped.
  *  6. XML entities unescaped — `&lt; &gt; &quot;` first, `&amp;`
  *     LAST (the reverse order double-unescapes: `&amp;lt;` must
  *     yield the literal `&lt;`, not `<`).
  */
object WikitextStrip {

  def plain(c: Column): Column = {
    val t1 = regexp_replace(c, "\\{\\{[^{}]*\\}\\}", "")
    val t1b = regexp_replace(t1, "\\{\\{[^{}]*\\}\\}", "") // one nesting level
    val t2 = regexp_replace(t1b, "\\[\\[[^\\[\\]|]*\\|([^\\[\\]]*)\\]\\]", "$1")
    val t3 = regexp_replace(t2, "\\[\\[([^\\[\\]|]*)\\]\\]", "$1")
    val t4 = regexp_replace(t3, "''+", "")
    val t5 = regexp_replace(t4, "=+", "")
    // &amp; LAST: unescaping it first manufactures new entity
    // sequences ("&amp;lt;" must yield the literal "&lt;", not "<")
    val t6 = regexp_replace(t5, "&lt;", "<")
    val t7 = regexp_replace(t6, "&gt;", ">")
    val t8 = regexp_replace(t7, "&quot;", "\"")
    regexp_replace(t8, "&amp;", "&")
  }

  /** The same rules as DuckDB SQL over a column expression (RE2 'g'
    * flag; `\1` group syntax). Kept NEXT TO the Column form so the two
    * rule lists can only drift visibly. */
  def plainSql(col: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |regexp_replace(regexp_replace(
       |$col,
       |'\\{\\{[^{}]*\\}\\}', '', 'g'),
       |'\\{\\{[^{}]*\\}\\}', '', 'g'),
       |'\\[\\[[^\\[\\]|]*\\|([^\\[\\]]*)\\]\\]', '\\1', 'g'),
       |'\\[\\[([^\\[\\]|]*)\\]\\]', '\\1', 'g'),
       |'''''+', '', 'g'),
       |'=+', '', 'g'),
       |'&lt;', '<', 'g'),
       |'&gt;', '>', 'g'),
       |'&quot;', '"', 'g'),
       |'&amp;', '&', 'g')""".stripMargin.replace("\n", "")
}
