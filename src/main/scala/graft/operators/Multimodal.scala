package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batch-shaped feature extraction via `mapPartitions`.
  *
  * The decode step is INJECTABLE: every operator takes a
  * [[MediaDecoder]] (defaulting to [[FakeDecoder]] — real image/audio
  * codecs are not in this environment). The decoder speaks the
  * operators' output domain (dimensions, counts, signatures), so a
  * production codec drops in by implementing the trait; the Spark-side
  * plumbing (schema, partitioning, batch iteration, per-partition
  * init, null/error handling) is identical for both and is what the
  * specs pin.
  */
object Multimodal {

  case class MediaBlob(media_id: Long, kind: String, blob: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, checksum: Long, error: String)

  /** Pluggable decode surface. Implementations MUST be serializable
    * (instances ship inside `mapPartitions` closures); a codec holding
    * native resources should allocate them in [[open]], which runs
    * once per partition on the executor — the returned instance is the
    * one the partition's rows use. */
  trait MediaDecoder extends Serializable {
    /** Once-per-partition initialization hook (native contexts, JNI
      * handles…). Default: stateless decoder, returns itself. */
    def open(): MediaDecoder = this
    /** (width, height, channels) metadata for one blob. */
    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int, Int)
    /** Content checksum recorded beside the features. */
    def contentHash(bytes: Array[Byte]): Long
    /** Total frame count of a video container. */
    def frameCount(bytes: Array[Byte]): Long
    /** Signature of one sampled frame (stands for the frame payload). */
    def frameSignature(bytes: Array[Byte], frameIdx: Long): Long
    /** Total sample count of an audio track. */
    def sampleCount(bytes: Array[Byte]): Long
    /** Signature of one audio segment starting at `segStart`. */
    def segmentSignature(bytes: Array[Byte], segStart: Long): Long
    /** Signature of the blob resampled to width×height. */
    def resizeSignature(bytes: Array[Byte], width: Int, height: Int): Long
  }

  /** STUB decoder (the default): deterministic fake metadata from byte
    * content. The fake derives from a masked FNV-1a so the whole
    * pipeline is oracle-expressible (a list_reduce fold in SQL, unlike
    * CRC32) — q25/q26/q59/q65's oracles embed exactly this arithmetic. */
  object FakeDecoder extends MediaDecoder {
    /** FNV-1a over bytes, sign bit dropped (non-negative). */
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xff); h *= 0x100000001b3L; i += 1 }
      h & Long.MaxValue
    }

    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
      // real decode unavailable in this environment — deterministic fake:
      val h = contentHash(bytes)
      kind match {
        case "image" => (((h % 1920) + 1).toInt, ((h % 1080) + 1).toInt, 3)
        case "audio" => (((h % 48000) + 1).toInt, 1, ((h % 2) + 1).toInt)
        case _       => (((h % 65536) + 1).toInt, 0, 0)
      }
    }

    def frameCount(bytes: Array[Byte]): Long = contentHash(bytes) % 241 + 1
    def frameSignature(bytes: Array[Byte], frameIdx: Long): Long =
      (contentHash(bytes) % 1000000007L) * 31 + frameIdx
    def sampleCount(bytes: Array[Byte]): Long = contentHash(bytes) % 16381 + 1
    def segmentSignature(bytes: Array[Byte], segStart: Long): Long =
      (contentHash(bytes) % 1000000007L) * 37 + segStart
    def resizeSignature(bytes: Array[Byte], width: Int, height: Int): Long =
      (contentHash(bytes) % 1000000007L) * 8191 + width.toLong * height

    /** Back-compat alias for the original stub surface. */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = decodeDims(kind, bytes)
  }

  /** REAL pure-JVM decoder — the production-shaped [[MediaDecoder]]
    * implementation (non-default: the oracled queries keep
    * [[FakeDecoder]] so their VALUES arithmetic stays engine-portable).
    * Containers the JDK itself decodes, no native libs:
    *
    *  - images: PNG/BMP/GIF/JPEG via `javax.imageio` — real pixel
    *    dimensions and raster band count;
    *  - video stand-in: multi-frame GIF via an `ImageReader` —
    *    `frameCount` is the container's true frame count and
    *    `frameSignature` hashes the DECODED pixels of that frame;
    *  - audio: WAV/AIFF via `javax.sound.sampled` — `sampleCount` is
    *    the track's real PCM frame count and `segmentSignature` hashes
    *    the decoded PCM bytes of the segment's window;
    *  - resize: a real `AffineTransform` resample into width×height,
    *    signature over the resampled pixels.
    *
    * Anything the JDK cannot decode throws, which the operators'
    * per-row error capture turns into an `error` row — exactly how a
    * production codec reports an unreadable blob. */
  object ImageIoDecoder extends MediaDecoder {
    def contentHash(bytes: Array[Byte]): Long = FakeDecoder.contentHash(bytes)

    private def hashInts(xs: Array[Int]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < xs.length) {
        h ^= xs(i) & 0xffffffffL; h *= 0x100000001b3L; i += 1
      }
      h & Long.MaxValue
    }

    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int, Int) = kind match {
      case "image" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) throw new IllegalArgumentException(
          "undecodable image: no ImageIO reader claimed the byte stream")
        (img.getWidth, img.getHeight, img.getRaster.getNumBands)
      case "audio" =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          ((f.getSampleRate + 0.5f).toInt, 1, f.getChannels)
        } finally in.close()
      case other => throw new UnsupportedOperationException(
        s"ImageIoDecoder: no JVM container decoder for kind '$other'")
    }

    /** GIF is the JDK's only multi-image container; its frame count is
      * the real `getNumImages`. */
    def frameCount(bytes: Array[Byte]): Long =
      withGifReader(bytes)(_.getNumImages(true).toLong)

    def frameSignature(bytes: Array[Byte], frameIdx: Long): Long =
      withGifReader(bytes) { r =>
        val img = r.read(frameIdx.toInt)
        hashInts(img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth))
      }

    private def withGifReader[T](bytes: Array[Byte])(
        f: javax.imageio.ImageReader => T): T = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) throw new IllegalArgumentException(
          "undecodable container: no ImageIO reader")
        val r = readers.next()
        try { r.setInput(iis); f(r) } finally r.dispose()
      } finally iis.close()
    }

    def sampleCount(bytes: Array[Byte]): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.getFrameLength finally in.close()
    }

    def segmentSignature(bytes: Array[Byte], segStart: Long): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val frameSize = in.getFormat.getFrameSize max 1
        // skip() may skip fewer bytes than asked (stream-dependent);
        // loop to the exact offset or the window hashes the wrong PCM
        var toSkip = segStart * frameSize
        while (toSkip > 0) {
          val skipped = in.skip(toSkip)
          if (skipped <= 0) {
            if (in.read() < 0) toSkip = 0 // EOF: nothing left to skip
            else toSkip -= 1              // forced one byte forward
          } else toSkip -= skipped
        }
        val window = new Array[Byte](4096)
        var read = 0
        var off = 0
        while (off < window.length && read >= 0) {
          read = in.read(window, off, window.length - off)
          if (read > 0) off += read
        }
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < off) { h ^= window(i) & 0xff; h *= 0x100000001b3L; i += 1 }
        h & Long.MaxValue
      } finally in.close()
    }

    def resizeSignature(bytes: Array[Byte], width: Int, height: Int): Long = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (src == null) throw new IllegalArgumentException(
        "undecodable image: no ImageIO reader claimed the byte stream")
      val dst = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
      } finally g.dispose()
      hashInts(dst.getRGB(0, 0, width, height, null, 0, width))
    }
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * expensive-initialization shape real codecs need), one pass over the
    * partition's rows, per-row error capture so one bad blob never kills
    * the job. */
  def extractFeatures(blobs: Dataset[MediaBlob],
                      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val d = decoder.open()
      it.map { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val (w, h, c) = d.decodeDims(b.kind, bytes)
          MediaFeatures(b.media_id, b.kind, bytes.length.toLong, w, h, c,
            d.contentHash(bytes), null)
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
    * frames; the explode happens after the stride). Per-partition
    * decoder init + per-row error capture, like every batch decode
    * here. */
  def sampleFrames(blobs: Dataset[MediaBlob], everyK: Int,
                   decoder: MediaDecoder = FakeDecoder): Dataset[FrameSample] = {
    require(everyK >= 1, s"everyK must be >= 1: $everyK")
    import blobs.sparkSession.implicits._
    blobs.filter(_.kind == "video").mapPartitions { it =>
      val d = decoder.open()
      it.flatMap { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val nFrames = d.frameCount(bytes)
          (0L until nFrames by everyK.toLong).iterator.map { i =>
            FrameSample(b.media_id, i, nFrames, d.frameSignature(bytes, i), null)
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

  /** Resize: target dimensions + a signature of (content, target)
    * standing in for resampled pixels. The plumbing — batch shape,
    * per-partition init, error capture — is the real contract. */
  def resize(blobs: Dataset[MediaBlob], width: Int, height: Int,
             decoder: MediaDecoder = FakeDecoder): Dataset[ResizedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val d = decoder.open()
      it.map { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          ResizedMedia(b.media_id, b.kind, width, height,
            d.resizeSignature(bytes, width, height), null)
        } catch {
          case e: Exception =>
            ResizedMedia(b.media_id, b.kind, 0, 0, 0L, e.getMessage)
        }
      }
    }
  }

  case class AudioSegment(media_id: Long, seg_idx: Long, seg_start: Long,
      n_samples: Long, seg_sig: Long, error: String)

  /** Audio segmentation for ASR/speech training: decode the track's
    * sample count, emit one row per `windowSamples`-sample segment at
    * `strideSamples` hops — the 1-D analog of [[sampleFrames]]'s
    * stride-before-explode (an hour of 16kHz audio is 57.6M samples;
    * rows are segments, never samples). Partial tail windows are NOT
    * emitted (training consumes fixed-size segments). Per-partition
    * decoder init + per-row error capture. */
  def chunkAudio(blobs: Dataset[MediaBlob], windowSamples: Int,
                 strideSamples: Int,
                 decoder: MediaDecoder = FakeDecoder): Dataset[AudioSegment] = {
    require(windowSamples >= 1, s"windowSamples must be >= 1: $windowSamples")
    require(strideSamples >= 1, s"strideSamples must be >= 1: $strideSamples")
    import blobs.sparkSession.implicits._
    blobs.filter(_.kind == "audio").mapPartitions { it =>
      val d = decoder.open()
      it.flatMap { b =>
        try {
          val bytes = if (b.blob == null) Array.empty[Byte] else b.blob
          val nSamples = d.sampleCount(bytes)
          (0L to nSamples - windowSamples by strideSamples.toLong).map { st =>
            AudioSegment(b.media_id, st / strideSamples, st, nSamples,
              d.segmentSignature(bytes, st), null)
          }
        } catch {
          case e: Exception =>
            Seq(AudioSegment(b.media_id, -1L, -1L, 0L, 0L, e.getMessage))
        }
      }
    }
  }

  /** Build a media table from the documents table (text bytes standing
    * in for media payloads — the plumbing under test, not the codec). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
  }
}
