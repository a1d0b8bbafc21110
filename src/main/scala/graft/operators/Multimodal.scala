package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batch-shaped feature extraction via `mapPartitions`.
  *
  * The decode step is a STUB — real image/audio codecs are not in this
  * environment. `FakeDecoder` derives deterministic pseudo-metadata from
  * the bytes so the Spark-side plumbing (schema, partitioning, batch
  * iteration, null/error handling) is real and testable; swap
  * `FakeDecoder.decode` for an actual codec in production.
  */
object Multimodal {

  case class MediaBlob(media_id: Long, kind: String, blob: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, checksum: Long, error: String)

  /** STUB decoder: deterministic fake metadata from byte content.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings).
    * The fake derives from a masked FNV-1a so the whole pipeline is
    * oracle-expressible (a list_reduce fold in SQL), unlike CRC32. */
  object FakeDecoder {
    /** FNV-1a over bytes, sign bit dropped (non-negative). */
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xff); h *= 0x100000001b3L; i += 1 }
      h & Long.MaxValue
    }

    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
      // ??? real decode unavailable in this environment — deterministic fake:
      val h = contentHash(bytes)
      kind match {
        case "image" => (((h % 1920) + 1).toInt, ((h % 1080) + 1).toInt, 3)
        case "audio" => (((h % 48000) + 1).toInt, 1, ((h % 2) + 1).toInt)
        case _       => (((h % 65536) + 1).toInt, 0, 0)
      }
    }
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * expensive-initialization shape real codecs need), one pass over the
    * partition's rows, per-row error capture so one bad blob never kills
    * the job. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init of the (stub) decoder goes here
      it.map { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val (w, h, c) = FakeDecoder.decode(b.kind, bytes)
          MediaFeatures(b.media_id, b.kind, bytes.length.toLong, w, h, c,
            FakeDecoder.contentHash(bytes), null)
        } catch {
          case e: Exception =>
            MediaFeatures(b.media_id, b.kind, 0L, 0, 0, 0, 0L, e.getMessage)
        }
      }
    }
  }

  case class FrameSample(media_id: Long, frame_idx: Long, n_frames: Long,
      frame_sig: Long, error: String)

  /** Frame sampling for video blobs: decode the container's frame
    * count, emit every `everyK`-th frame's signature — the
    * frame-subsampling step of a video training pipeline, one row per
    * SAMPLED frame (never one per frame: a 2-hour video is 200k
    * frames; the explode happens after the stride). Same stub
    * contract as [[extractFeatures]]: the fake frame count
    * (`hash % 241 + 1`) and signature stay in non-negative bounded
    * BIGINT arithmetic so the whole operator is oracle-expressible;
    * swap the body for a real demuxer in production. Per-partition
    * decoder init + per-row error capture, like every batch decode
    * here. */
  def sampleFrames(blobs: Dataset[MediaBlob], everyK: Int): Dataset[FrameSample] = {
    require(everyK >= 1, s"everyK must be >= 1: $everyK")
    import blobs.sparkSession.implicits._
    blobs.filter(_.kind == "video").mapPartitions { it =>
      // per-partition init of the (stub) demuxer goes here
      it.flatMap { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val h = FakeDecoder.contentHash(bytes)
          val nFrames = h % 241 + 1
          (0L until nFrames by everyK.toLong).iterator.map { i =>
            FrameSample(b.media_id, i, nFrames, (h % 1000000007L) * 31 + i, null)
          }
        } catch {
          case e: Exception =>
            Iterator.single(FrameSample(b.media_id, -1L, 0L, 0L, e.getMessage))
        }
      }
    }
  }

  case class ResizedMedia(media_id: Long, kind: String, width: Int, height: Int,
      resized_sig: Long, error: String)

  /** Resize stub: target dimensions + a deterministic signature of
    * (content, target) standing in for resampled pixels. The
    * plumbing — batch shape, per-partition init, error capture — is
    * the real contract; the arithmetic is the stub. */
  def resize(blobs: Dataset[MediaBlob], width: Int, height: Int): Dataset[ResizedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val h = FakeDecoder.contentHash(bytes)
          ResizedMedia(b.media_id, b.kind, width, height,
            (h % 1000000007L) * 8191 + width.toLong * height, null)
        } catch {
          case e: Exception =>
            ResizedMedia(b.media_id, b.kind, 0, 0, 0L, e.getMessage)
        }
      }
    }
  }

  /** Build a media table from the documents table (text bytes standing
    * in for media payloads — the plumbing under test, not the codec). */
  case class AudioSegment(media_id: Long, seg_idx: Long, seg_start: Long,
      n_samples: Long, seg_sig: Long, error: String)

  /** Audio segmentation for ASR/speech training: decode the track's
    * sample count, emit one row per `windowSamples`-sample segment at
    * `strideSamples` hops — the 1-D analog of [[sampleFrames]]'s
    * stride-before-explode (an hour of 16kHz audio is 57.6M samples;
    * rows are segments, never samples). Partial tail windows are NOT
    * emitted (training consumes fixed-size segments). Same stub
    * contract as every decode here: fake sample count
    * (`hash % 16381 + 1`) and signature in non-negative bounded
    * BIGINT arithmetic, oracle-expressible; swap in a real resampler
    * in production. Per-partition decoder init + per-row error
    * capture. */
  def chunkAudio(blobs: Dataset[MediaBlob], windowSamples: Int,
                 strideSamples: Int): Dataset[AudioSegment] = {
    require(windowSamples >= 1, s"windowSamples must be >= 1: $windowSamples")
    require(strideSamples >= 1, s"strideSamples must be >= 1: $strideSamples")
    import blobs.sparkSession.implicits._
    blobs.filter(_.kind == "audio").mapPartitions { it =>
      // per-partition init of the (stub) audio decoder goes here
      it.flatMap { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val h = FakeDecoder.contentHash(bytes)
          val nSamples = h % 16381 + 1
          val sig = h % 1000000007L
          (0L to nSamples - windowSamples by strideSamples.toLong).map { st =>
            AudioSegment(b.media_id, st / strideSamples, st, nSamples,
              sig * 37 + st, null)
          }
        } catch {
          case e: Exception =>
            Seq(AudioSegment(b.media_id, -1L, -1L, 0L, 0L, e.getMessage))
        }
      }
    }
  }

  def mediaFromDocuments(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
  }
}
