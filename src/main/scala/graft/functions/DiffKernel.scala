package graft.functions

import java.util.regex.Pattern
import scala.collection.mutable

/** One diff operation: `action` ∈ {-1 remove, +1 add}; `position` is the
  * running offset that advances by `content.length` for equal and add
  * ops (reference semantics: `python/revision_differ.py:78-84`). */
case class DiffOp(position: Int, action: Int, content: String)

/** Token-level text diff kernel — the Spark-native re-expression of the
  * reference's differ (`python/revision_differ.py:30-84`):
  * wikitext tokenization, token interning, and a Myers O(ND) diff with
  * linear-space bisection (the published algorithm the reference's
  * bundled diff library also implements, `python/diff_match_patch.py:254-355`).
  *
  * Differences by design: the diff runs over `Int` token ids, not
  * hashed UTF-16 chars, removing the reference's 65,535-distinct-token
  * cap (`unichr` in `revision_differ.py:52-63`) with no behavior change
  * below the cap.
  */
object DiffKernel {

  /** Wikitext tokenizer: same token classes and leftmost-first
    * alternation order as the reference (`revision_differ.py:30-50`),
    * including its quirks (the `{{{`/`}}}` branches are dead because
    * `{{`/`}}` precede them). (?s) lets `.` match carriage returns as
    * Python's does; `\n+` still wins for newlines by alternation order. */
  private val tokenPattern: Pattern = Pattern.compile(
    "(?s)[\\w]+" +  // word
    "|\\[\\[" +     // opening internal link
    "|\\]\\]" +     // closing internal link
    "|\\{\\{" +     // opening template
    "|\\}\\}" +     // closing template
    "|\\{\\{\\{" +  // opening template var (dead branch, parity)
    "|\\}\\}\\}" +  // closing template var (dead branch, parity)
    "|\\n+" +       // line breaks
    "| +" +         // spaces
    "|&\\w+;" +     // HTML escape sequence
    "|'''" +        // bold
    "|''" +         // italics
    "|=+" +         // header
    "|\\{\\|" +     // opening table
    "|\\|\\}" +     // closing table
    "|\\|\\-" +     // table row
    "|.")           // any other character

  /** Regex form — retained as the differential-testing reference for
    * the hand-rolled scanner below. */
  def tokenizeRegex(content: String): Array[String] = {
    val m = tokenPattern.matcher(content)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Hand-rolled scanner with exactly the alternation-order semantics of
    * the regex (verified by a differential property test); ~10× faster
    * than java.util.regex on wikitext. */
  def tokenize(content: String): Array[String] = {
    if (content == null) return Array.empty
    val n = content.length
    val out = new mutable.ArrayBuffer[String](n / 4 + 4)
    var i = 0
    while (i < n) {
      val c = content.charAt(i)
      if (isWordChar(c)) {
        var j = i + 1
        while (j < n && isWordChar(content.charAt(j))) j += 1
        out += content.substring(i, j); i = j
      } else c match {
        case '[' =>
          if (i + 1 < n && content.charAt(i + 1) == '[') { out += "[["; i += 2 }
          else { out += "["; i += 1 }
        case ']' =>
          if (i + 1 < n && content.charAt(i + 1) == ']') { out += "]]"; i += 2 }
          else { out += "]"; i += 1 }
        case '{' =>
          if (i + 1 < n && content.charAt(i + 1) == '{') { out += "{{"; i += 2 }
          else if (i + 1 < n && content.charAt(i + 1) == '|') { out += "{|"; i += 2 }
          else { out += "{"; i += 1 }
        case '}' =>
          if (i + 1 < n && content.charAt(i + 1) == '}') { out += "}}"; i += 2 }
          else { out += "}"; i += 1 }
        case '\n' =>
          var j = i + 1
          while (j < n && content.charAt(j) == '\n') j += 1
          out += content.substring(i, j); i = j
        case ' ' =>
          var j = i + 1
          while (j < n && content.charAt(j) == ' ') j += 1
          out += content.substring(i, j); i = j
        case '&' =>
          var j = i + 1
          while (j < n && isWordChar(content.charAt(j))) j += 1
          if (j > i + 1 && j < n && content.charAt(j) == ';') { out += content.substring(i, j + 1); i = j + 1 }
          else { out += "&"; i += 1 }
        case '\'' =>
          if (i + 2 < n && content.charAt(i + 1) == '\'' && content.charAt(i + 2) == '\'') { out += "'''"; i += 3 }
          else if (i + 1 < n && content.charAt(i + 1) == '\'') { out += "''"; i += 2 }
          else { out += "'"; i += 1 }
        case '=' =>
          var j = i + 1
          while (j < n && content.charAt(j) == '=') j += 1
          out += content.substring(i, j); i = j
        case '|' =>
          if (i + 1 < n && content.charAt(i + 1) == '}') { out += "|}"; i += 2 }
          else if (i + 1 < n && content.charAt(i + 1) == '-') { out += "|-"; i += 2 }
          else { out += "|"; i += 1 }
        case other =>
          out += String.valueOf(other); i += 1
      }
    }
    out.toArray
  }

  /** Intern tokens to ids using a shared dictionary across both texts
    * (the reference shares its dict the same way, `revision_differ.py:68-70`). */
  private final class Interner {
    private val map = new java.util.HashMap[String, Integer]()
    val tokens = mutable.ArrayBuffer.empty[String]
    def intern(ts: Array[String]): Array[Int] = {
      val out = new Array[Int](ts.length)
      var i = 0
      while (i < ts.length) {
        val t = ts(i)
        var id = map.get(t)
        if (id == null) { id = tokens.length; map.put(t, id); tokens += t }
        out(i) = id
        i += 1
      }
      out
    }
  }

  /** Myers diff over int arrays: list of (action, tokenIds) runs with
    * action ∈ {-1, 0, +1}, deletes emitted before inserts at the same
    * point. Linear-space via middle-snake bisection. */
  def diffInts(a: Array[Int], b: Array[Int]): List[(Int, Array[Int])] =
    merge(compute(a, b))

  /** Trim common prefix/suffix, then bisect on the middle of an optimal
    * edit path and recurse on the halves. */
  private def compute(a: Array[Int], b: Array[Int]): List[(Int, Array[Int])] = {
    // trim common prefix/suffix
    var p = 0
    val maxP = math.min(a.length, b.length)
    while (p < maxP && a(p) == b(p)) p += 1
    var s = 0
    val maxS = maxP - p
    while (s < maxS && a(a.length - 1 - s) == b(b.length - 1 - s)) s += 1
    val at = a.slice(p, a.length - s)
    val bt = b.slice(p, b.length - s)
    val core: List[(Int, Array[Int])] =
      if (at.isEmpty && bt.isEmpty) Nil
      else if (at.isEmpty) List((1, bt))
      else if (bt.isEmpty) List((-1, at))
      else {
        val (x, y) = middleSnake(at, bt)
        val degenerate = (x <= 0 && y <= 0) || (x >= at.length && y >= bt.length)
        if (x < 0 || degenerate) List((-1, at), (1, bt))
        else compute(at.slice(0, x), bt.slice(0, y)) ++
          compute(at.slice(x, at.length), bt.slice(y, bt.length))
      }
    val pre = if (p > 0) List((0, a.slice(0, p))) else Nil
    val post = if (s > 0) List((0, a.slice(a.length - s, a.length))) else Nil
    pre ++ core ++ post
  }

  /** Find a split point (x, y) on an optimal edit path: forward and
    * reverse D-paths are advanced in lockstep until they overlap
    * (Myers 1986, "An O(ND) Difference Algorithm", linear-space
    * refinement — the same published algorithm behind the reference's
    * bundled diff library). Returns (-1,-1) only for degenerate input. */
  private def middleSnake(a: Array[Int], b: Array[Int]): (Int, Int) = {
    val n = a.length
    val m = b.length
    val maxD = (n + m + 1) / 2
    val vOff = maxD
    val vSize = 2 * maxD + 2
    val v1 = Array.fill(vSize)(-1)
    val v2 = Array.fill(vSize)(-1)
    v1(vOff + 1) = 0
    v2(vOff + 1) = 0
    val delta = n - m
    val front = delta % 2 != 0
    var d = 0
    while (d <= maxD) {
      // forward pass
      var k = -d
      while (k <= d) {
        val ki = vOff + k
        var x =
          if (k == -d || (k != d && v1(ki - 1) < v1(ki + 1))) v1(ki + 1)
          else v1(ki - 1) + 1
        var y = x - k
        while (x < n && y < m && a(x) == b(y)) { x += 1; y += 1 }
        v1(ki) = x
        if (front) {
          val k2i = vOff + delta - k
          if (k2i >= 0 && k2i < vSize && v2(k2i) != -1) {
            if (x >= n - v2(k2i)) return (x, y) // paths overlap
          }
        }
        k += 2
      }
      // reverse pass
      k = -d
      while (k <= d) {
        val ki = vOff + k
        var x =
          if (k == -d || (k != d && v2(ki - 1) < v2(ki + 1))) v2(ki + 1)
          else v2(ki - 1) + 1
        var y = x - k
        while (x < n && y < m && a(n - x - 1) == b(m - y - 1)) { x += 1; y += 1 }
        v2(ki) = x
        if (!front) {
          val k1i = vOff + delta - k
          if (k1i >= 0 && k1i < vSize && v1(k1i) != -1) {
            val x1 = v1(k1i)
            val y1 = x1 - (delta - k)
            if (x1 >= n - x) return (x1, y1) // paths overlap
          }
        }
        k += 2
      }
      d += 1
    }
    (-1, -1)
  }

  /** Canonicalize runs: within every maximal region of non-equal ops,
    * emit one merged delete followed by one merged insert (the order the
    * reference's diff library also normalizes to); adjacent equal runs
    * merge too. Segment-wise so a delete…insert…delete region collapses
    * to a single delete+insert pair rather than interleaved fragments. */
  private def merge(ops: List[(Int, Array[Int])]): List[(Int, Array[Int])] = {
    val out = mutable.ListBuffer.empty[(Int, Array[Int])]
    val dels = mutable.ArrayBuffer.empty[Int]
    val ins = mutable.ArrayBuffer.empty[Int]
    def flush(): Unit = {
      if (dels.nonEmpty) { out += ((-1, dels.toArray)); dels.clear() }
      if (ins.nonEmpty) { out += ((1, ins.toArray)); ins.clear() }
    }
    for ((act, toks) <- ops if toks.nonEmpty) act match {
      case 0 =>
        flush()
        out.lastOption match {
          case Some((0, t0)) => out.update(out.length - 1, (0, t0 ++ toks))
          case _ => out += ((0, toks))
        }
      case -1 => dels ++= toks
      case 1 => ins ++= toks
    }
    flush()
    out.toList
  }

  /** Full pipeline: tokenize, intern, diff, un-intern, emit ops with the
    * reference's position accounting (`revision_differ.py:78-84`). */
  def diffOps(oldText: String, newText: String,
              reportRemove: Boolean = true, reportAdd: Boolean = true,
              reportEqual: Boolean = false): Array[DiffOp] = {
    val interner = new Interner
    val aIds = interner.intern(tokenize(if (oldText == null) "" else oldText))
    val bIds = interner.intern(tokenize(if (newText == null) "" else newText))
    val runs = diffInts(aIds, bIds)
    val out = mutable.ArrayBuffer.empty[DiffOp]
    var position = 0
    for ((act, toks) <- runs) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < toks.length) { sb.append(interner.tokens(toks(i))); i += 1 }
      val content = sb.toString
      val report = (act == -1 && reportRemove) || (act == 1 && reportAdd) || (act == 0 && reportEqual)
      if (report) out += DiffOp(position, act, content)
      if (act != -1) position += content.length
    }
    out.toArray
  }

  /** Replay ops (report=[-1,1]) against the old text to reconstruct the
    * new text — the invariant documented by `python/example.py:67-107`. */
  def replay(oldText: String, ops: Seq[DiffOp]): String = {
    val buff = new java.lang.StringBuilder
    var oldPos = 0
    var lastPos = 0
    for (op <- ops) {
      val equal = oldText.substring(oldPos, math.min(oldText.length, oldPos + op.position - lastPos))
      buff.append(equal)
      lastPos += equal.length
      oldPos += equal.length
      if (op.action == 1) { buff.append(op.content); lastPos += op.content.length }
      else if (op.action == -1) oldPos += op.content.length
    }
    buff.append(oldText.substring(math.min(oldPos, oldText.length)))
    buff.toString
  }
}
