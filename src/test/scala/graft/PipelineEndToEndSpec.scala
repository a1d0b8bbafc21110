package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.operators.{PiiRedact, ShardWriter, SpanDedup}
import graft.sources.TextCorpus

/** The whole curation arc as ONE composed dataflow — what a user of
  * the library actually runs: ingest JSONL → quality/sampling curation
  * → PII redaction → substring dedup (span removal) → sequence packing
  * → budgeted training shards on disk. Pins that the operators compose
  * (schemas line up, nothing breaks lazily) and that the end artifact
  * is deterministic: running the pipeline twice writes identical
  * shard assignments.
  */
class PipelineEndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def runPipeline(outDir: String): Unit = {
    // 1. land the corpus as JSONL (interchange in), read with contract
    val landing = Files.createTempDirectory("e2e-landing").toString
    TextCorpus.writeJsonlDocuments(
      spark.read.parquet(s"$sf/documents.parquet"), s"$landing/corpus")
    val docs = TextCorpus.readJsonlDocuments(spark, s"$landing/corpus")
      .filter($"_corrupt_record".isNull).drop("_corrupt_record")
    // 2. curation verdicts (quality + stratified sampling), keep sampled
    val curated = graft.streaming.StreamOps.curateDocs(docs)
      .filter($"sampled")
      .join(docs.select($"doc_id", $"text"), "doc_id")
    // 3. redact PII
    val redacted = curated.withColumn("text", PiiRedact.redact($"text"))
    // 4. substring-level dedup: cut repeated 5-token spans
    val deduped = SpanDedup.removeSpans(redacted, "doc_id", "text", n = 5)
      .select($"doc_id", $"clean_text".as("text"))
      .filter(length($"text") > 0)
    // 5. pack + write budgeted shards
    val withTokens = deduped.withColumn("n_tokens",
      (length($"text") - length(expr("replace(text, ' ', '')")) + 1).cast("long"))
    ShardWriter.write(withTokens, outDir, "doc_id", "n_tokens", tokensPerShard = 2048)
  }

  test("jsonl → curate → redact → span-dedup → shards composes and is deterministic") {
    val out1 = Files.createTempDirectory("e2e-shards1").toString
    val out2 = Files.createTempDirectory("e2e-shards2").toString
    runPipeline(out1)
    runPipeline(out2)
    val s1 = ShardWriter.read(spark, out1)
      .select($"doc_id", $"shard_id", $"n_tokens").orderBy($"doc_id")
    val s2 = ShardWriter.read(spark, out2)
      .select($"doc_id", $"shard_id", $"n_tokens").orderBy($"doc_id")
    val rows1 = s1.collect().toSeq
    assert(rows1.nonEmpty, "pipeline produced no rows")
    assert(rows1 == s2.collect().toSeq, "pipeline output is not deterministic")
    // the curation step thinned the corpus; dedup shortened some docs
    val orig = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows1.size < orig.count())
    val origTokens = orig.select(
      sum(length($"text") - length(expr("replace(text, ' ', '')")) + 1)).as[Long].head()
    val keptTokens = rows1.map(_.getLong(2)).sum
    assert(keptTokens < origTokens)
    // every shard except the last holds >= its budget's worth of
    // contiguity: shard ids are dense from 0
    val shards = rows1.map(_.getLong(1)).distinct.sorted
    assert(shards == (0L until shards.size).toSeq, s"shard ids not dense: $shards")
  }
}
