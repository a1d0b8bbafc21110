package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Byte-compatible diffdb TSV encoding (reference `fileformat.rst:5-27`,
  * assembled at `python/revision_differ.py:150-165`): every cell is the
  * Python-2 `repr()` of its value, diffs are trailing
  * `position:action:content` columns, rows are tab-joined.
  *
  * Emulated repr conventions (per the published sample rows):
  * ints bare, booleans True/False, missing values None, `title` as a
  * byte-str repr (`'...'`), text fields as unicode reprs (`u'...'`,
  * switching to double quotes when the content contains `'` but no `"`).
  */
object ReprCompat {

  /** Python-2 style string repr body (escaping + quote choice). */
  def pyStrRepr(s: String, unicodePrefix: Boolean): String = {
    val useDouble = s.contains('\'') && !s.contains('"')
    val quote = if (useDouble) '"' else '\''
    val sb = new StringBuilder(s.length + 8)
    if (unicodePrefix) sb.append('u')
    sb.append(quote)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case q if q == quote => sb.append('\\').append(q)
        case c if c >= 32 && c < 127 => sb.append(c)
        case c if c < 256 => sb.append(f"\\x$c%02x")
        case c => sb.append(f"\\u$c%04x")
      }
      i += 1
    }
    sb.append(quote)
    sb.toString
  }

  private def reprLong(v: Any): String =
    if (v == null) "None" else v.toString

  /** One diffdb DataFrame row (GraftFunctions.diffdb schema) → one
    * repr-encoded TSV line. */
  def rowToTsv(r: Row): String = {
    def opt[T](name: String): Option[T] =
      if (r.isNullAt(r.fieldIndex(name))) None else Some(r.getAs[T](name))
    val cells = Seq(
      reprLong(opt[Long]("rev_id").orNull),
      reprLong(opt[Long]("page_id").orNull),
      reprLong(opt[Int]("namespace").orNull),
      opt[String]("title").map(pyStrRepr(_, unicodePrefix = false)).getOrElse("None"),
      reprLong(opt[Long]("timestamp").orNull),
      opt[String]("comment").map(pyStrRepr(_, unicodePrefix = true)).getOrElse("None"),
      (if (opt[Boolean]("minor").getOrElse(false)) "True" else "False"),
      reprLong(opt[Long]("user_id").orNull),
      opt[String]("user_text").map(pyStrRepr(_, unicodePrefix = true)).getOrElse("None"))
    val diffs = r.getSeq[Row](r.fieldIndex("diffs")).map { d =>
      s"${d.getAs[Int]("position")}:${d.getAs[Int]("action")}:" +
        pyStrRepr(d.getAs[String]("content"), unicodePrefix = true)
    }
    // failure rows append diff_fail + message (revision_differ.py:167-170)
    val fail = r.schema.fieldNames.contains("diff_error") match {
      case true if !r.isNullAt(r.fieldIndex("diff_error")) =>
        Seq("diff_fail", r.getAs[String]("diff_error"))
      case _ => Nil
    }
    (cells ++ diffs ++ fail).mkString("\t")
  }

  /** diffdb DataFrame → repr-encoded TSV lines (write with
    * `.write.text(...)` for the reference's part-file layout). */
  def diffdbTsv(db: DataFrame): Dataset[String] = {
    import db.sparkSession.implicits._
    db.map(rowToTsv)
  }
}
