package graft.queries

/** Fixed deterministic scratch paths for oracle queries that drive a
  * real streaming run inside `queries()` (q165/q168): Bench calls each
  * query several times, so per-invocation-wiped FIXED directories
  * replace `createTempDirectory` (which leaks a tree per call). */
private[queries] object OracleTmp {

  /** Scratch base: prefer a RAM-backed tmpfs (`/dev/shm`) when one is
    * writable — every byte under here is ephemeral WITHIN one query
    * invocation by construction (`fresh` wipes the dir at call start;
    * nothing is ever read across invocations), so checkpoint/state-
    * store durability buys nothing while its small-file fsync + CRC
    * round-trips dominate the per-micro-batch wall clock of the
    * real-run streaming fixtures on a disk-backed /tmp (guide §6 I/O
    * layout; measured r16: q180/q179/q181 batch times). Durability of
    * REAL deployments is untouched — callers there choose their own
    * checkpoint locations; this object only serves the oracle
    * fixtures. Fallback: java.io.tmpdir. */
  private def base = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
  }

  /** Per-process namespace token: stable within one JVM (Bench's repeated
    * calls reuse the same dirs) but disjoint across concurrent JVMs
    * (parallel Verify + Bench, or two checkouts on one host, must not
    * wipe each other's live streaming checkpoint/sink dirs). Checkout
    * path + user disambiguate two checkouts; the PID disambiguates two
    * JVMs on one checkout. */
  private val nsToken: String = {
    val checkout = sys.props.getOrElse("user.dir", "")
    val user = sys.props.getOrElse("user.name", "")
    val pid = ProcessHandle.current().pid()
    val h = java.lang.Integer.toHexString((checkout + "|" + user).hashCode)
    s"${h}_$pid"
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(p)
    val all = try s.iterator().asScala.toSeq.reverse finally s.close()
    all.foreach(java.nio.file.Files.delete)
  }

  /** (Re)create `/tmp/<name>_<nsToken>` empty and return it. Also
    * sweeps STALE siblings — same name + checkout hash, a DEAD pid —
    * so the per-PID namespacing cannot leak one dir tree per finished
    * JVM across repeated Verify/Bench/test runs on a host (a live
    * sibling PID's dirs are never touched). */
  def fresh(name: String): java.nio.file.Path = {
    sweepStale(name)
    val p = base.resolve(name + "_" + nsToken)
    if (java.nio.file.Files.exists(p)) deleteTree(p)
    java.nio.file.Files.createDirectory(p)
  }

  private def sweepStale(name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val hashPrefix = nsToken.takeWhile(_ != '_')
    val prefix = s"${name}_${hashPrefix}_"
    val self = ProcessHandle.current().pid()
    try {
      val ls = java.nio.file.Files.list(base)
      val stale = try ls.iterator().asScala.filter { p =>
        val fn = p.getFileName.toString
        fn.startsWith(prefix) && {
          val pid = fn.substring(prefix.length).toLongOption
          pid.exists(id => id != self &&
            !ProcessHandle.of(id).map[Boolean](_.isAlive).orElse(false))
        }
      }.toSeq finally ls.close()
      stale.foreach { p =>
        try deleteTree(p)
        catch { case _: java.io.IOException => /* concurrent sweep */ }
      }
    } catch { case _: java.io.IOException => /* listing raced; best-effort */ }
  }

  /** Write `df` as ONE parquet file named `name` inside `dir` (the
    * file-stream sources need individually-placed files to build a
    * deterministic per-trigger sequence). */
  def writeOne(df: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = fresh(dir.getFileName.toString + "_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val ls = java.nio.file.Files.list(tmp)
    val part =
      try ls.iterator().asScala.find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      finally ls.close()
    java.nio.file.Files.move(part, dir.resolve(name))
    deleteTree(tmp)
  }
}
