package graft

import org.apache.spark.sql.SparkSession

/** Debug CLI (the analog of the reference's jar main,
  * wikihadoop `TestStreamWikiDumpInputFormat.java:450-501`): reads a
  * MediaWiki dump and prints the revision records.
  *
  * Usage: runMain graft.Main [dumpPath] [limit] [--diff|--tsv]
  * With no args, reads the bundled sample dump. --diff prints the diffdb
  * table (tokenized revision diffs); --tsv prints it in the reference's
  * repr-encoded TSV format.
  */
object Main {
  /** Extract the bundled sample dump to a temp file, return its path. */
  def sampleDumpPath(): String = {
    val in = getClass.getResourceAsStream("/graft/sample_dump.xml")
    require(in != null, "bundled sample dump missing")
    val f = java.io.File.createTempFile("sample_dump", ".xml")
    f.deleteOnExit()
    java.nio.file.Files.copy(in, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    f.getAbsolutePath
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    // a lone numeric positional is a limit, not a path
    val (pathOpt, limitOpt) = positional.toList match {
      case Nil => (None, None)
      case one :: Nil if one.forall(_.isDigit) => (None, Some(one.toInt))
      case p :: rest => (Some(p), rest.headOption.map(_.toInt))
    }
    val path = pathOpt.getOrElse(sampleDumpPath())
    val limit = limitOpt.getOrElse(20)
    val spark = SparkSession.builder().withExtensions(graft.plans.GraftExtensions)
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-mediawiki-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.format("mediawiki").load(path)
    if (flags.contains("--tsv")) {
      // reference-compatible repr-encoded diffdb TSV (fileformat.rst)
      graft.functions.ReprCompat.diffdbTsv(graft.functions.GraftFunctions.diffdb(df))
        .collect().take(limit).foreach(println)
    } else if (flags.contains("--diff")) {
      val db = graft.functions.GraftFunctions.diffdb(df)
      db.selectExpr("rev_id", "page_id", "namespace", "timestamp", "user_text",
          "transform(diffs, d -> concat(d.position, ':', d.action, ':', substring(d.content, 0, 30))) as diffs")
        .show(limit, truncate = false)
      println(s"total revisions: ${db.count()}")
    } else {
      df.selectExpr("page_id", "title", "rev_seq", "curr.rev_id", "prev.rev_id as prev_rev_id",
          "curr.timestamp", "coalesce(curr.contributor.username, curr.contributor.ip) as who",
          "substring(curr.text, 0, 40) as text_head")
        .show(limit, truncate = false)
      println(s"total revisions: ${df.count()}")
    }
    spark.stop()
  }
}
