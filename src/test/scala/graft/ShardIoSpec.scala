package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.ShardWriter
import graft.sources.TextCorpus

class ShardIoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tokDocs = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"text",
      (length($"text") - length(expr("replace(text, ' ', '')")) + 1)
        .cast("long").as("n_tokens"))

  test("shard assignment: contiguous budgeted shards, every doc exactly once") {
    val assigned = ShardWriter.assignShards(tokDocs, "doc_id", "n_tokens", tokensPerShard = 4096)
      .select($"doc_id", $"n_tokens", $"end_offset", $"shard_id")
      .orderBy($"doc_id").collect()
    assert(assigned.length == tokDocs.count())
    // shards are contiguous nondecreasing in pack order
    val shards = assigned.map(_.getLong(3))
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
    // each doc's shard is its start-offset bucket
    assigned.foreach { r =>
      assert(r.getLong(3) == (r.getLong(2) - r.getLong(1)) / 4096)
    }
    // per-shard token totals stay within budget + one straddling doc
    val perShard = assigned.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(1)).sum)
    val maxDoc = assigned.map(_.getLong(1)).max
    perShard.foreach { case (s, tot) =>
      assert(tot <= 4096 + maxDoc, s"shard $s overflows: $tot")
    }
  }

  test("shard write → read roundtrip preserves rows and training order") {
    val dir = Files.createTempDirectory("shards").toString
    ShardWriter.write(tokDocs, dir, "doc_id", "n_tokens", tokensPerShard = 4096)
    val back = ShardWriter.read(spark, dir)
    assert(back.count() == tokDocs.count())
    // shard_id partition column survives and matches recomputation
    val expected = ShardWriter.assignShards(tokDocs, "doc_id", "n_tokens", 4096)
      .select($"doc_id", $"shard_id".as("expect_shard"))
    val mismatches = back.join(expected, "doc_id")
      .filter($"shard_id" =!= $"expect_shard").count()
    assert(mismatches == 0)
    // more than one shard actually produced
    assert(back.select($"shard_id").distinct().count() > 1)
  }

  test("packedChunks: exact reconstruction, every chunk full except the last") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = graft.operators.SequencePack
      .packedChunks(docs, "doc_id", "text", chunkTokens = 512)
      .orderBy($"chunk_id").collect()
    // chunk ids dense from 0
    assert(chunks.map(_.getLong(0)).toSeq == (0L until chunks.length).toSeq)
    // reassembling the chunks reproduces the corpus token stream exactly
    val reassembled = chunks.map(_.getString(2)).mkString(" ")
    val corpus = docs.orderBy($"doc_id").select($"text").as[String]
      .collect().mkString(" ")
    assert(reassembled == corpus)
    // every chunk except the last holds exactly 512 tokens
    chunks.init.foreach { c =>
      assert(c.getString(2).split(" ", -1).length == 512, s"chunk ${c.getLong(0)}")
    }
    assert(chunks.last.getString(2).split(" ", -1).length <= 512)
  }

  test("jsonl roundtrip: documents survive bit-for-bit, corrupt rows captured") {
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    TextCorpus.writeJsonlDocuments(docs, s"$dir/corpus")
    // plant one malformed line alongside
    Files.write(java.nio.file.Paths.get(s"$dir/corpus/zz_bad.json"),
      "{not json at all\n".getBytes)
    // Spark refuses plans touching ONLY _corrupt_record on raw json;
    // cache first, as the engine itself prescribes
    val back = TextCorpus.readJsonlDocuments(spark, s"$dir/corpus").cache()
    try {
      val good = back.filter($"_corrupt_record".isNull).drop("_corrupt_record")
      val orig = docs.orderBy($"doc_id").collect().toSeq
      assert(good.orderBy($"doc_id").collect().toSeq == orig)
      assert(back.filter($"_corrupt_record".isNotNull).count() == 1)
    } finally back.unpersist()
  }

  test("streaming jsonl ≡ batch through the curation pipeline") {
    // the full curate → redact projection over a JSONL feed must
    // produce row-identical results whether the corpus arrives as one
    // batch read or as micro-batches — same enforced schema, same
    // shared expressions (q14/q42/q52's single source of truth)
    val dir = Files.createTempDirectory("jsonl-stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // several files so maxFilesPerTrigger yields multiple micro-batches
    TextCorpus.writeJsonlDocuments(docs.filter($"doc_id" % 3 === 0), s"$dir/corpus/p0")
    TextCorpus.writeJsonlDocuments(docs.filter($"doc_id" % 3 === 1), s"$dir/corpus/p1")
    TextCorpus.writeJsonlDocuments(docs.filter($"doc_id" % 3 === 2), s"$dir/corpus/p2")
    val glob = s"$dir/corpus/p*"
    // redact first (keeps text), then curate (projects text away)
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamOps.curateDocs(
        graft.streaming.StreamOps.redactDocs(df.drop("_corrupt_record")))
    val expected = pipeline(TextCorpus.readJsonlDocuments(spark, glob))
      .collect().map(_.toSeq).toSet
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Seq[Any]]())
    val nBatches = new java.util.concurrent.atomic.AtomicInteger
    val stream = TextCorpus.readStreamJsonlDocuments(spark, glob,
      maxFilesPerTrigger = Some(1))
    val q = pipeline(stream).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        nBatches.incrementAndGet()
        b.collect().foreach(r => got.add(r.toSeq)): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("jsonl-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(nBatches.get() > 1, "maxFilesPerTrigger should split the feed into micro-batches")
    assert(scala.jdk.CollectionConverters.ListHasAsScala(got).asScala.toSet == expected)
    assert(expected.nonEmpty)
  }
}
