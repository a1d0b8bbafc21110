package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the de-facto wire format of LLM
  * training corpora (one JSON document per line). Thin, deliberately:
  * Spark's own json source is splittable, predicate-pushing, and
  * codegen'd; the value added here is the CONTRACT — an explicit
  * schema on read, because schema inference is a full extra pass over
  * the data (at 100 TB, a second 100 TB scan before the first real
  * one) and silently widens types on dirty rows. `columnNameOfCorruptRecord`
  * rows surface in `_corrupt_record` instead of failing the job.
  */
object TextCorpus {

  /** The `documents` table contract (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** Read a JSONL corpus with the documents contract enforced (no
    * inference pass; malformed lines land in `_corrupt_record`). */
  def readJsonlDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Write a documents frame as JSONL (one object per line). */
  def writeJsonlDocuments(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Streaming read of a JSONL corpus — same enforced schema and
    * corrupt-record capture as [[readJsonlDocuments]], so the batch
    * curation pipeline (curateDocs / redactDocs / dedup) composes
    * unchanged onto a live document feed the way the `mediawiki`
    * source already streams dumps. Spark's file stream source tracks
    * processed files in the checkpoint log; `maxFilesPerTrigger`
    * bounds micro-batch size. */
  def readStreamJsonlDocuments(spark: SparkSession, path: String,
                               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(path)
  }
}
