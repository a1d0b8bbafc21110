package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal + fingerprint query surface. */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")

  // ---------------------------------------------------------------- q25
  /** Binary-column metadata: blob sizes per media kind (oracle-able part
    * of the multimodal path — kind assignment + byte length). */
  def q25MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaFromDocuments(docs(s, dir)).toDF()
      .groupBy($"kind")
      .agg(count(lit(1)).as("n_media"),
           sum(length($"blob")).as("total_bytes"),
           max(length($"blob")).cast("long").as("max_bytes"))
      .orderBy($"kind")
  }

  val q25Sql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  MAX(octet_length(encode(text))) AS max_bytes
      |FROM documents
      |GROUP BY 1 ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Full feature-extraction plumbing (mapPartitions over typed blobs,
    * stub decoder). Fully oracle-checked: the FNV-based fake decode is
    * a list_reduce fold + modular arithmetic in SQL. */
  def q26MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs(s, dir)))
      .toDF()
      .orderBy($"media_id")
  }

  val q26Sql: String =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
      |    CASE WHEN len(text) = 0 OR text IS NULL
      |         THEN 14695981039346656037::HUGEINT % 9223372036854775808::HUGEINT
      |         ELSE (${fnvFoldSql("text")}) % 9223372036854775808::HUGEINT
      |    END AS hm
      |  FROM documents)
      |SELECT media_id, kind, n_bytes,
      |  CAST(CASE kind WHEN 'image' THEN hm % 1920 + 1
      |                 WHEN 'audio' THEN hm % 48000 + 1
      |                 ELSE hm % 65536 + 1 END AS INTEGER) AS width,
      |  CAST(CASE kind WHEN 'image' THEN hm % 1080 + 1
      |                 WHEN 'audio' THEN 1 ELSE 0 END AS INTEGER) AS height,
      |  CAST(CASE kind WHEN 'image' THEN 3
      |                 WHEN 'audio' THEN hm % 2 + 1 ELSE 0 END AS INTEGER) AS channels,
      |  CAST(hm AS BIGINT) AS checksum,
      |  NULL::VARCHAR AS error
      |FROM m ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Rolling-hash (winnowing-style) 64-bit fingerprints — min FNV-1a
    * over char 8-grams, via the native codegen expression
    * [[graft.functions.DocFingerprint64]] (no ScalaUDF encoder round
    * trip in the plan). Fully oracle-checked: the 8-step FNV fold is
    * unrolled as HUGEINT arithmetic mod 2^64 in generated SQL (ASCII
    * corpus ⇒ `ord` = UTF-16 charAt). */
  def q27RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", expr("doc_fingerprint64(text)").as("fingerprint64"))
      .orderBy($"doc_id")
  }

  /** Variable-length FNV-1a fold over all chars of `textExpr` as a
    * DuckDB list_reduce (raw, before the sign-bit mask). */
  private def fnvFoldSql(textExpr: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |    [ord(c)::HUGEINT FOR c IN string_split_regex($textExpr, '')]),
       |  (acc, x) -> (xor(acc, x) * 1099511628211::HUGEINT)
       |              % 18446744073709551616::HUGEINT)""".stripMargin

  val q27Sql: String = {
    // unrolled FNV-1a over the 8 chars at window offset i (1-based)
    var h = "14695981039346656037::HUGEINT"
    for (j <- 0 until 8)
      h = s"((xor($h, ord(substr(text, i + $j, 1))::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"
    // kernel edge cases (GraftFunctions.rollingFingerprint): empty
    // text → 0; len <= 8 → one fold over the whole text
    s"""SELECT doc_id,
      |  CASE WHEN len(text) = 0 OR text IS NULL THEN 0
      |       WHEN len(text) <= 8 THEN
      |         CAST((${fnvFoldSql("text")}) % 9223372036854775808::HUGEINT AS BIGINT)
      |       ELSE
      |         CAST((SELECT MIN($h % 9223372036854775808::HUGEINT)
      |               FROM UNNEST(range(1, len(text) - 6)) t(i)) AS BIGINT)
      |  END AS fingerprint64
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q59
  /** Video frame sampling via [[Multimodal.sampleFrames]]: every 30th
    * frame's signature from each video blob — one output row per
    * SAMPLED frame (the stride applies before the explode; a 200k-
    * frame video emits ~6k rows, not 200k). Fully oracle-checked: the
    * stub frame count and signature are non-negative bounded BIGINT
    * arithmetic over the same FNV content hash as q26. */
  def q59FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docs(s, dir)), everyK = 30)
      .toDF()
      .orderBy($"media_id", $"frame_idx")
  }

  val q59Sql: String =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN len(text) = 0 OR text IS NULL
      |         THEN 14695981039346656037::HUGEINT % 9223372036854775808::HUGEINT
      |         ELSE (${fnvFoldSql("text")}) % 9223372036854775808::HUGEINT
      |    END AS hm
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT media_id, hm, CAST(hm % 241 + 1 AS BIGINT) AS n_frames FROM m)
      |SELECT media_id, CAST(i AS BIGINT) AS frame_idx, n_frames,
      |  CAST((hm % 1000000007) * 31 + i AS BIGINT) AS frame_sig,
      |  NULL::VARCHAR AS error
      |FROM f, UNNEST(range(0, n_frames, 30)) t(i)
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Audio segmentation via [[Multimodal.chunkAudio]]: 2048-sample
    * windows at 1024-sample hops over each audio blob — one row per
    * SEGMENT (stride before the explode, like q59's frames; an hour of
    * 16 kHz audio emits ~56k segment rows, not 57.6M sample rows).
    * Stub decode in non-negative BIGINT arithmetic over the q26 FNV
    * hash, so the whole operator is oracle-exact. */
  def q65AudioSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.chunkAudio(Multimodal.mediaFromDocuments(docs(s, dir)),
        windowSamples = 2048, strideSamples = 1024)
      .toDF()
      .orderBy($"media_id", $"seg_idx")
  }

  val q65Sql: String =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN len(text) = 0 OR text IS NULL
      |         THEN 14695981039346656037::HUGEINT % 9223372036854775808::HUGEINT
      |         ELSE (${fnvFoldSql("text")}) % 9223372036854775808::HUGEINT
      |    END AS hm
      |  FROM documents WHERE doc_id % 3 = 1),
      |a AS (SELECT media_id, hm, CAST(hm % 16381 + 1 AS BIGINT) AS n_samples FROM m)
      |SELECT media_id, CAST(st // 1024 AS BIGINT) AS seg_idx,
      |  CAST(st AS BIGINT) AS seg_start, n_samples,
      |  CAST((hm % 1000000007) * 37 + st AS BIGINT) AS seg_sig,
      |  NULL::VARCHAR AS error
      |FROM a, UNNEST(range(0, n_samples - 2048 + 1, 1024)) t(st)
      |ORDER BY media_id, seg_idx""".stripMargin

  // ---------------------------------------------------------------- q115
  /** Scene-change detection over the sampled frame stream: quantize
    * each sampled frame's signature into a coarse perceptual bucket
    * (sig % 8 — stands for a perceptual hash band) and emit a change
    * point wherever consecutive sampled frames land in different
    * buckets — the shot-boundary primitive video curation runs before
    * frame-level dedup (keep one keyframe per scene, not 24/s). The
    * LAG window partitions by media_id (high cardinality, parallel);
    * stride-before-explode keeps the frame stream ~n_frames/30. The
    * oracle embeds q59's full SQL as its frame source — one more
    * composed-result oracle. */
  def q115SceneChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fr = Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(docs(s, dir)), everyK = 30)
      .toDF()
      .withColumn("bucket", $"frame_sig" % 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"frame_idx")
    fr.withColumn("prev_bucket", lag($"bucket", 1).over(w))
      .filter($"prev_bucket".isNotNull && $"prev_bucket" =!= $"bucket")
      .select($"media_id", $"frame_idx", $"prev_bucket", $"bucket")
      .orderBy($"media_id", $"frame_idx")
  }

  val q115Sql: String =
    s"""WITH fr AS (SELECT media_id, frame_idx, frame_sig % 8 AS bucket
       |            FROM (${q59Sql})),
       |lg AS (SELECT media_id, frame_idx, bucket,
       |         LAG(bucket) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev_bucket
       |       FROM fr)
       |SELECT media_id, frame_idx, prev_bucket, bucket
       |FROM lg WHERE prev_bucket IS NOT NULL AND prev_bucket <> bucket
       |ORDER BY media_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_multimodal_meta" -> q25MultimodalMeta _,
    "q26_multimodal_features" -> q26MultimodalFeatures _,
    "q27_rolling_fingerprint" -> q27RollingFingerprint _,
    "q59_frame_sample" -> q59FrameSample _,
    "q65_audio_segments" -> q65AudioSegments _,
    "q115_scene_changes" -> q115SceneChanges _,
  )

  def oracles: Map[String, String] = Map(
    "q25_multimodal_meta" -> q25Sql,
    "q26_multimodal_features" -> q26Sql,
    "q27_rolling_fingerprint" -> q27Sql,
    "q59_frame_sample" -> q59Sql,
    "q65_audio_segments" -> q65Sql,
    "q115_scene_changes" -> q115Sql,
  )
}
