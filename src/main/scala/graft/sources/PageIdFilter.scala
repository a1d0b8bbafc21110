package graft.sources

/** Shared decoder for the pushed-down page-id predicates (the
  * `__pageIdFilter*` props MediaWikiScanBuilder emits) — used by the
  * partition reader (skip a page before parsing any revision) and by
  * [[MultistreamIndex]] (skip whole streams before decompression).
  * Conjunction semantics, exactly like the title predicates.
  *
  * A malformed prop is a planner/reader contract bug and fails loudly
  * with the offending value (ADVICE r12) — falling back silently would
  * only mask the bug, since reader and planner parse the same props. */
private[sources] object PageIdFilter {
  private def split(v: String, what: String): (String, String) = {
    val sep = v.indexOf(':')
    require(sep > 0, s"malformed internal $what prop '$v' (want kind:arg)")
    (v.substring(0, sep), v.substring(sep + 1))
  }

  def fromProps(props: Map[String, String]): Option[Long => Boolean] = {
    val preds = props.collect {
      case (k, v) if k.startsWith("__pageIdFilter") =>
        val (kind, arg) = split(v, "page-id filter")
        kind match {
          case "eq" => val x = arg.toLong; (p: Long) => p == x
          case "in" =>
            val s = arg.split(",").filter(_.nonEmpty).map(_.toLong).toSet
            (p: Long) => s(p)
          case "gt" => val x = arg.toLong; (p: Long) => p > x
          case "ge" => val x = arg.toLong; (p: Long) => p >= x
          case "lt" => val x = arg.toLong; (p: Long) => p < x
          case "le" => val x = arg.toLong; (p: Long) => p <= x
          case other => throw new IllegalArgumentException(
            s"malformed internal page-id filter prop '$v' (unknown kind '$other')")
        }
    }.toSeq
    if (preds.isEmpty) None else Some(p => preds.forall(f => f(p)))
  }

  /** The `__titleFilter*` conjunction — ONE decoder for the reader and
    * the multistream skip-planner (the two copies had already diverged
    * once in error behavior; review r13). Same loud-failure contract
    * as the other prop decoders. */
  def titlePredsFromProps(props: Map[String, String]): Seq[String => Boolean] =
    props.collect {
      case (k, v) if k.startsWith("__titleFilter") =>
        val (kind, arg) = split(v, "title filter")
        kind match {
          case "eq" => (t: String) => t == arg
          case "contains" => (t: String) => t.contains(arg)
          case "starts" => (t: String) => t.startsWith(arg)
          case "ends" => (t: String) => t.endsWith(arg)
          case other => throw new IllegalArgumentException(
            s"malformed internal title-filter prop '$v' (unknown kind '$other')")
        }
    }.toSeq

  /** The exact set of ns values the pushed conjunction can ACCEPT
    * (intersection of the eq/in sets), or None when no ns filter is
    * pushed. The skip-planner uses it to verify every acceptable key
    * is classifiable from the siteinfo prefixes before engaging —
    * a key the classifier can never produce would otherwise mark
    * every stream dead (review r13). */
  def nsAcceptKeys(props: Map[String, String]): Option[Set[Int]] = {
    val sets = props.collect {
      case (k, v) if k.startsWith("__nsFilter") =>
        val (kind, arg) = split(v, "ns filter")
        kind match {
          case "eq" => Set(arg.toInt)
          case "in" => arg.split(",").filter(_.nonEmpty).map(_.toInt).toSet
          case other => throw new IllegalArgumentException(
            s"malformed internal ns filter prop '$v' (unknown kind '$other')")
        }
    }.toSeq
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** The `__nsFilter*` conjunction (eq/in only). Applied to the PARSED
    * `<ns>` value; an absent element is NULL and fails every predicate
    * (Spark's own equality semantics — the reader must mirror them
    * because pushed filters are not re-evaluated). */
  def nsFromProps(props: Map[String, String]): Option[Int => Boolean] = {
    val preds = props.collect {
      case (k, v) if k.startsWith("__nsFilter") =>
        val (kind, arg) = split(v, "ns filter")
        kind match {
          case "eq" => val x = arg.toInt; (n: Int) => n == x
          case "in" =>
            val s = arg.split(",").filter(_.nonEmpty).map(_.toInt).toSet
            (n: Int) => s(n)
          case other => throw new IllegalArgumentException(
            s"malformed internal ns filter prop '$v' (unknown kind '$other')")
        }
    }.toSeq
    if (preds.isEmpty) None else Some(n => preds.forall(f => f(n)))
  }
}
