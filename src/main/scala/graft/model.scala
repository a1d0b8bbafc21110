package graft

/** Data model for MediaWiki full-history dump records.
  *
  * Mirrors the semantics of the reference engine's record stream
  * (whym/wikihadoop `StreamWikiDumpInputFormat.java:42-121`): one record
  * per revision, carrying the page context and the previous revision of
  * the same page (None ⇔ the reference's
  * `<revision beginningofpage="true">` dummy, `StreamWikiDumpInputFormat.java:301`).
  */
case class Contributor(
    id: Option[Long],
    username: Option[String],
    ip: Option[String],
    deleted: Boolean)

case class Revision(
    revId: Long,
    parentId: Option[Long],
    timestampUs: Option[Long],   // epoch microseconds, UTC
    contributor: Option[Contributor],
    minor: Boolean,
    comment: Option[String],
    model: Option[String],
    format: Option[String],
    textU8: org.apache.spark.unsafe.types.UTF8String, // null ⇔ <text deleted="deleted"/>
    sha1: Option[String],
    bytes: Option[Long],         // <text bytes="..."> attribute
    raw: Option[String]) {       // original XML, only in capture-raw mode
  /** Text body as UTF-8 bytes, shared object between this revision's
    * `curr` row and the next row's `prev` — the ingest hot path never
    * materializes a `java.lang.String` of the body. */
  def text: Option[String] = Option(textU8).map(_.toString)
}

case class PageInfo(
    pageId: Long,
    title: String,
    ns: Option[Int],
    redirect: Option[String],
    headerRaw: String)

/** One emitted record: the reference's (prevRevision, currRevision)
  * pairing within a page, in document order (`rev_seq`). */
case class RevisionPair(
    page: PageInfo,
    revSeq: Int,
    prev: Option[Revision],
    curr: Revision)
