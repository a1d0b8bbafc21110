package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DiffKernel, DiffKernelU8}

/** Pins the byte-native kernel to the String kernel: identical op
  * actions, positions, and content on BMP inputs (the documented astral
  * corner aside — exercised separately below). */
class DiffKernelU8Spec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  private def both(a: String, b: String,
      rr: Boolean = true, ra: Boolean = true, re: Boolean = false): Unit = {
    val exp = DiffKernel.diffOps(a, b, rr, ra, re)
      .map(op => (op.position, op.action, op.content)).toList
    val got = DiffKernelU8.diffOps(u(a), u(b), rr, ra, re)
      .map(op => (op.position, op.action, op.content.toString)).toList
    assert(got == exp, s"diverged on a=${a.take(80)} b=${b.take(80)}")
  }

  test("byte tokenizer equals the char scanner on BMP input (differential)") {
    val vocab = "abc Z9_ [ ] [[ ]] { } {{ }} {| |} |- | ' '' ''' = == &amp; &x &y; & \n \n\n   . , \r é 中 ü"
      .split(" ", -1)
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 2000) {
      val s = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))).mkString
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bounds = DiffKernelU8.tokenBounds(bytes, 0, bytes.length)
      val got = (0 until bounds.length / 2).map(k =>
        new String(bytes, bounds(2 * k), bounds(2 * k + 1) - bounds(2 * k),
          java.nio.charset.StandardCharsets.UTF_8)).toList
      val exp = DiffKernel.tokenize(s).toList
      assert(got == exp, s"tokenizer diverged on ${s.replace("\n", "\\n")}")
    }
  }

  test("diffOps parity with the String kernel (differential fuzz)") {
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "wiki", "текст", "中文", "[[", "]]", "{{", "}}", "&amp;", "\n", " ", "''")
    def mk(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    for (_ <- 1 to 300) {
      val a = mk(rnd.nextInt(60))
      // evolve a into b
      val toks = a.split(" ", -1).toBuffer
      for (_ <- 0 until rnd.nextInt(6)) {
        if (toks.nonEmpty) {
          val at = rnd.nextInt(toks.length)
          rnd.nextInt(3) match {
            case 0 => toks.insert(at, words(rnd.nextInt(words.length)))
            case 1 => toks.remove(at)
            case _ => toks(at) = words(rnd.nextInt(words.length))
          }
        }
      }
      both(a, toks.mkString(" "))
    }
  }

  test("diffOps parity across report flags") {
    val a = "the quick '''brown''' fox\n\njumps over [[the]] lazy dog"
    val b = "the slow '''brown''' cat\n\njumps over [[a]] lazy dog today"
    both(a, b)
    both(a, b, rr = false)
    both(a, b, ra = false)
    both(a, b, re = true)
    both(a, b, rr = false, ra = false, re = true)
    both("", b)
    both(a, "")
    both("", "")
    both(a, a)
  }

  test("null inputs behave like empty") {
    val got = DiffKernelU8.diffOps(null, u("x y"))
    val exp = DiffKernel.diffOps(null, "x y")
    assert(got.map(o => (o.position, o.action, o.content.toString)).toList ==
      exp.map(o => (o.position, o.action, o.content)).toList)
  }

  test("astral-plane positions still match the String path") {
    // 4-byte code points: one token in the byte kernel, two surrogate
    // halves in the char kernel — positions (UTF-16 units) must agree
    // when the replaced code points do NOT share a high surrogate
    // (U+10348 is D800 DF48; U+1F600 is D83D DE00)
    val a = "a 𐍈 b c"
    val b = "a 😀 b d"
    val exp = DiffKernel.diffOps(a, b).map(op => (op.position, op.action, op.content)).toList
    val got = DiffKernelU8.diffOps(u(a), u(b)).map(op => (op.position, op.action, op.content.toString)).toList
    assert(got == exp)
  }

  test("shared-high-surrogate corner: byte kernel stays whole-code-point") {
    // 😀/😁 share high surrogate D83D: the char kernel splits the pair
    // (emitting ill-formed lone-surrogate content — which Spark's
    // UTF8String would mangle to '?' anyway); the byte kernel keeps
    // code points whole and its ops replay byte-exactly
    val a = "a 😀 b"
    val b = "a 😁 b"
    val got = DiffKernelU8.diffOps(u(a), u(b))
    assert(got.map(_.action).toList == List(-1, 1))
    assert(got(0).content.toString == "😀" && got(1).content.toString == "😁")
    // both ops anchored before the old code point (position 2 = "a ")
    assert(got.map(_.position).toList == List(2, 2))
  }

  test("buffer-aliased inputs (Spark-style buffer reuse) never corrupt the memo") {
    // The r8 memo bug class: Spark backs UTF8Strings with REUSED buffers
    // (UnsafeRow, column vectors), so any retained reference to a
    // caller's bytes reads the NEXT row's content later. This fuzz
    // replays revision chains through ONE shared buffer: every prev is
    // written at offset 0 and every curr at offset 2048, so the memo's
    // "prev of row i+1 == curr of row i" hot path always sees the old
    // curr's region overwritten — often with a SAME-LENGTH text (the
    // trigger that made the r8 window compare read the new text). Ops
    // must equal the String kernel's on owned inputs, row for row.
    val rnd = new scala.util.Random(11)
    val words = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def mk(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    for (round <- 1 to 60) {
      var revs = Vector(mk(8 + rnd.nextInt(10)))
      for (_ <- 0 until 6) {
        val t = revs.last.split(" ", -1).toBuffer
        val at = rnd.nextInt(t.length)
        // mostly same-length replacements; occasional inserts
        if (rnd.nextInt(4) == 0) t.insert(at, words(rnd.nextInt(words.length)))
        else t(at) = words(rnd.nextInt(words.length))
        revs :+= t.mkString(" ")
      }
      val buf = new Array[Byte](4096)
      def aliased(s: String, off: Int): UTF8String = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        System.arraycopy(b, 0, buf, off, b.length)
        UTF8String.fromBytes(buf, off, b.length)
      }
      val pairs = revs.init zip revs.tail
      val scribble = round % 2 == 0 // alternate: junk-fill vs direct overlay
      val got = pairs.map { case (p, c) =>
        val ops = DiffKernelU8.diffOps(aliased(p, 0), aliased(c, 2048))
          .map(o => (o.position, o.action, o.content.toString)).toList
        if (scribble) java.util.Arrays.fill(buf, 'z'.toByte)
        ops
      }
      val exp = pairs.map { case (p, c) =>
        DiffKernel.diffOps(p, c).map(o => (o.position, o.action, o.content)).toList
      }
      assert(got == exp, s"aliased-buffer divergence in chain: $revs")
    }
  }

  test("replay invariant holds for byte-path output") {
    val a = "one two three four five six seven"
    val b = "one TWO three four 4.5 five seven eight"
    val ops = DiffKernelU8.diffOps(u(a), u(b)).map(o =>
      graft.functions.DiffOp(o.position, o.action, o.content.toString))
    assert(DiffKernel.replay(a, ops.toSeq) == b)
  }
}
