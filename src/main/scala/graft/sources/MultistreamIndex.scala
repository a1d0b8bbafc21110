package graft.sources

import java.util.regex.Pattern

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory

/** Index-assisted planning for Wikipedia's `-multistream` dump layout.
  *
  * The most common public dump (`pages-articles-multistream.xml.bz2`)
  * is MANY complete bz2 streams back-to-back, published with a sibling
  * index (`...-multistream-index.txt.bz2`) of `offset:page_id:title`
  * lines — one line per page, `offset` the byte position of the bz2
  * stream holding it (~100 pages/stream). The layout contract: every
  * page lives entirely inside one stream, and every page is indexed.
  *
  * When an index is found (explicit `multistreamIndex` option, or the
  * naming-convention sibling; `multistreamIndex=off` disables), planning
  * reads it in ONE driver pass (O(#streams) memory — offsets and one
  * boolean each, never the titles; enwiki's ~240 MB index is a few
  * seconds of driver I/O against hours of cluster decompression) and:
  *
  *  1. places partition boundaries at exact stream starts (block
  *     boundaries by construction, so the BYBLOCK ownership rule is
  *     unchanged — correctness never depends on the index being right,
  *     only boundary QUALITY does);
  *  2. SKIPS whole streams that provably produce no output BEFORE any
  *     byte of them is decompressed: streams where no page passes the
  *     pushed-down title or page-id predicates (page-id equality over
  *     an indexed dump is the index's original purpose — random access
  *     to one page's history), and streams where every page
  *     is excluded by a literal `<title>PREFIX`-shaped
  *     `excludePagesWith` (the reference's header filter,
  *     `StreamWikiDumpInputFormat.java:124` — evaluated at the reader
  *     there, here already at planning). Skipping is the one decision
  *     that trusts the contract that all pages are indexed.
  *
  * Any malformed index line, unsorted offset, or failed stream-magic
  * probe abandons the index entirely (size-based planning takes over) —
  * a half-trusted index could silently drop pages.
  */
object MultistreamIndex {

  /** Resolve the index path: explicit option wins; `off`/`false`
    * disables; otherwise try the Wikipedia naming convention
    * (`X.xml.bz2` → `X-index.txt.bz2` / `X-index.txt`). */
  def locate(fs: FileSystem, dump: Path, props: Map[String, String]): Option[Path] =
    props.get("multistreamIndex").map(_.trim) match {
      case Some(v) if v.equalsIgnoreCase("off") || v.equalsIgnoreCase("false") => None
      case Some(v) if v.nonEmpty =>
        // an explicit path must exist — silent fallback would mask a typo
        val p = new Path(v)
        require(fs.exists(p), s"multistreamIndex path does not exist: $v")
        Some(p)
      case _ =>
        val name = dump.getName
        if (!name.endsWith(".xml.bz2")) None
        else {
          val stem = name.dropRight(".xml.bz2".length)
          Seq(s"$stem-index.txt.bz2", s"$stem-index.txt")
            .map(new Path(dump.getParent, _))
            .find(fs.exists)
        }
    }

  /** The reader's pushed-title-predicate parse, mirrored for planning
    * (same `kind:arg` encoding, same conjunction). */
  private def titlePreds(props: Map[String, String]): Seq[String => Boolean] =
    props.collect {
      case (k, v) if k.startsWith("__titleFilter") =>
        val Array(kind, arg) = v.split(":", 2)
        kind match {
          case "eq" => (t: String) => t == arg
          case "contains" => (t: String) => t.contains(arg)
          case "starts" => (t: String) => t.startsWith(arg)
          case "ends" => (t: String) => t.endsWith(arg)
        }
    }.toSeq

  /** Map `excludePagesWith` to a title-prefix test when (and only when)
    * that is provably equivalent: pattern is literally `<title>PREFIX`
    * with PREFIX free of regex metacharacters AND of XML-escapable
    * characters. The raw header contains `<title>ESCAPED</title>`; for
    * an escape-free prefix, `escaped.startsWith(prefix)` ≡
    * `unescaped.startsWith(prefix)` (escaping only rewrites characters
    * the prefix cannot contain), and `<` occurs nowhere else unescaped,
    * so a find-anywhere match of `<title>PREFIX` ≡ the title prefix
    * test the index can answer. Anything else → None (no
    * exclusion-based skipping; the reader still applies the regex). */
  private[sources] def excludeAsTitlePrefix(pattern: String): Option[String] = {
    if (!pattern.startsWith("<title>")) return None
    val prefix = pattern.substring("<title>".length)
    val unsafe = ".^$|?*+()[]{}\\&<>\"'"
    if (prefix.isEmpty || prefix.exists(unsafe.contains(_))) None else Some(prefix)
  }

  /** Plan partitions for `dump` from its index, or None if the index is
    * absent, disabled, or fails validation. */
  def plan(fs: FileSystem, codecs: CompressionCodecFactory, dump: Path,
      fileLen: Long, maxBytes: Long,
      props: Map[String, String]): Option[Seq[MediaWikiInputPartition]] = {
    val idx = locate(fs, dump, props).getOrElse(return None)
    val preds = titlePreds(props)
    val idPred = PageIdFilter.fromProps(props)
    val excludePrefix = props.get("excludePagesWith").filter(_.nonEmpty)
      .flatMap(excludeAsTitlePrefix)
    val canFilter = preds.nonEmpty || idPred.isDefined || excludePrefix.isDefined
    // one pass: distinct offsets in file order + per-stream liveness
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    val live = scala.collection.mutable.ArrayBuffer[Boolean]()
    try {
      val raw = fs.open(idx)
      val in = Option(codecs.getCodec(idx))
        .map(c => c.createInputStream(raw): java.io.InputStream).getOrElse(raw)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      try {
        var line = reader.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val parts = line.split(":", 3)
            if (parts.length != 3) return None
            val off = try parts(0).toLong catch { case _: NumberFormatException => return None }
            if (off < 0 || off >= fileLen) return None
            val pageId = try parts(1).toLong catch { case _: NumberFormatException => return None }
            val title = parts(2)
            if (offsets.isEmpty || offsets.last != off) {
              if (offsets.nonEmpty && off < offsets.last) return None // unsorted
              offsets += off
              live += !canFilter
            }
            if (canFilter && !live(live.length - 1)) {
              val passes = preds.forall(_(title)) &&
                idPred.forall(_(pageId)) &&
                !excludePrefix.exists(title.startsWith)
              if (passes) live(live.length - 1) = true
            }
          }
          line = reader.readLine()
        }
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => return None }
    if (offsets.isEmpty || offsets.head == 0L) return None // header stream must precede
    // cheap index-matches-dump probe: the first and last claimed stream
    // starts must carry the bz2 magic
    try {
      val probe = fs.open(dump)
      try {
        val buf = new Array[Byte](3)
        for (off <- Seq(offsets.head, offsets.last)) {
          probe.readFully(off, buf)
          if (!(buf(0) == 'B' && buf(1) == 'Z' && buf(2) == 'h')) return None
        }
      } finally probe.close()
    } catch { case scala.util.control.NonFatal(_) => return None }
    // group CONSECUTIVE live streams into ~maxBytes partitions (the
    // `multistreamTargetBytes` option overrides the size-based budget —
    // stream-aligned granularity without touching the session conf); a
    // dead stream (or the size budget) closes the open group. The header
    // stream [0, first offset) holds siteinfo and no pages — merged
    // into the first partition when stream 1 is live, skippable with it
    // otherwise (dropping it never drops pages, by the contract).
    val effMax = math.max(
      props.get("multistreamTargetBytes").map(_.toLong).getOrElse(maxBytes), 1L)
    val bounds = offsets.toIndexedSeq :+ fileLen
    val parts = scala.collection.mutable.ArrayBuffer[MediaWikiInputPartition]()
    var groupStart = -1L
    var groupBytes = 0L
    def close(end: Long): Unit = {
      if (groupStart >= 0)
        parts += MediaWikiInputPartition(dump.toString, groupStart, end, fileLen, blockMode = true)
      groupStart = -1L; groupBytes = 0L
    }
    var i = 0
    while (i < offsets.length) {
      val s = bounds(i); val e = bounds(i + 1)
      if (!live(i)) close(s)
      else {
        if (groupStart < 0) { groupStart = if (i == 0) 0L else s; groupBytes = 0L }
        groupBytes += e - s
        if (groupBytes >= effMax) close(e)
      }
      i += 1
    }
    close(fileLen)
    Some(parts.toSeq)
  }
}
