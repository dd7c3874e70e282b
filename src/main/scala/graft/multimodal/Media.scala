package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (mandated extension): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / resize /
  * frame-sample / feature-extract stages whose Spark-side shape —
  * schema, partitioning, per-partition batch processing — is real and
  * tested. IMAGES decode for real ([[ImageIoCodec]], JDK ImageIO —
  * PNG/JPEG/BMP/GIF with zero external deps); AUDIO decodes for real
  * ([[WavCodec]], JDK javax.sound.sampled — WAV/AIFF/AU, PCM +
  * A-law/mu-law); VIDEO decodes for real in the two public container
  * formats a JDK-only build can parse — YUV4MPEG2 ([[Y4mCodec]]) and
  * motion-JPEG ([[MjpegCodec]]) — with uniform frame sampling; only
  * inter-frame-compressed video (H.264/VP9/AV1) is stubbed (the JDK
  * ships no such decoder).
  *
  * ==== STUB BOUNDARY (compressed video only) ====
  * [[MediaCodec]] is the pluggable decode contract (bytes + typed meta →
  * float grid). [[ImageIoCodec]], [[WavCodec]], [[Y4mCodec]] and
  * [[MjpegCodec]] are REAL decoders; [[DispatchCodec]] routes
  * `image/`-, `audio/`-, `video/y4m`- and `video/mjpeg`-tagged rows to
  * them and everything else (H.264-class codecs, and the
  * documents-derived `fake/v1` stand-in blobs) to
  * [[FakeCodec]], a DETERMINISTIC FAKE that expands bytes into a float
  * grid instead of invoking an H.264 decoder. A real H.264 codec drops
  * in as another [[MediaCodec]] instance without touching pipeline code
  * ([[Media.extractFeatures]] takes the codec as a parameter). Everything
  * downstream of decode (resize index math, mean-pool features, frame
  * sampling, batch iteration) is real logic over that grid and is
  * codec-independent; the fake's feature output is pinned by a golden
  * check in MultimodalSpec so the stub can't silently drift.
  *
  * Scale posture: media rows are processed with `mapPartitions` over a
  * typed Dataset — one iterator pass per partition (the Scala analog of
  * mapInPandas batch processing), no per-row task dispatch, no driver
  * collect; binary payloads stay columnar in parquet and are never
  * shuffled unless a downstream op asks for it.
  */
object Media {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(
      width: Int, height: Int, channels: Int,
      sample_rate: Int, duration_ms: Long, codec: String)

  final case class MediaRow(
      media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long, feature: Array[Float])

  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("codec", StringType, nullable = false))),
      nullable = false)))

  /** Derive a deterministic media table from the `documents` fixture: the
    * payload is the document's UTF-8 bytes (a stand-in blob with a stable
    * hash), kind cycles image/audio/video, metadata is derived from
    * n_chars. This keeps multimodal tests on driver-provided data.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          (col("n_chars") % 64 + 1).cast("int").as("width"),
          (col("n_chars") % 48 + 1).cast("int").as("height"),
          lit(3).as("channels"),
          lit(16000).as("sample_rate"),
          (col("n_chars") * 10).cast("long").as("duration_ms"),
          lit("fake/v1").as("codec")).as("meta"))

  /** Write the media table hive-partitioned by kind — modality-level
    * partition pruning for downstream readers.
    */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("kind").parquet(path)

  /** Decode + feature-extract over partitions of a typed Dataset — one
    * batch pass per partition; buffers are reused across rows within a
    * partition (allocation is per-partition, not per-row). The codec is a
    * constructor-style parameter: swapping the fake for a real decoder
    * changes nothing else in the pipeline.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      featureDim: Int = 8,
      codec: MediaCodec = FakeCodec): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      val pool = new Array[Float](featureDim) // reused per partition
      rows.map { r =>
        val grid = codec.decode(r.content, r.meta)
        java.util.Arrays.fill(pool, 0.0f)
        MediaFeature(r.media_id, r.kind, r.content.length.toLong,
          MediaCodec.meanPool(grid, featureDim, pool).clone())
      }
    }
  }
}

/** The pluggable decode contract. Implementations ship to executors inside
  * `mapPartitions` closures, hence Serializable. A real implementation
  * would dispatch on `meta.codec` to an image/audio/video library; the
  * signature (bytes + typed meta → float grid) is the contract the rest of
  * the pipeline compiles against.
  */
trait MediaCodec extends Serializable {
  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float]
}

/** REAL image decode via the JDK's bundled ImageIO readers (PNG / JPEG /
  * BMP / GIF — zero external dependencies): payload bytes → BufferedImage
  * → row-major RGB-interleaved float grid in [0,1]. Dimensions come from
  * the DECODED image (the bytes are the source of truth; `meta.width/
  * height` describe intent and may disagree on malformed rows), so
  * downstream resize/pool math sees the true raster.
  *
  * [[DispatchCodec]] routes by `meta.codec` so image rows take this
  * path, audio rows take [[WavCodec]], and only video falls back to the
  * fake.
  */
object ImageIoCodec extends MediaCodec {
  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] = {
    val img = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(content))
    require(img != null,
      s"ImageIO found no reader for payload (codec=${meta.codec})")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // sRGB regardless of storage layout
        val base = (y * w + x) * 3
        out(base) = ((rgb >> 16) & 0xff) / 255.0f
        out(base + 1) = ((rgb >> 8) & 0xff) / 255.0f
        out(base + 2) = (rgb & 0xff) / 255.0f
        x += 1
      }
      y += 1
    }
    out
  }
}

/** REAL audio decode via the JDK's bundled javax.sound.sampled readers
  * (WAV / AIFF / AU containers, PCM + A-law/mu-law encodings — zero
  * external dependencies): payload bytes → AudioInputStream → transcode
  * to 16-bit signed little-endian PCM → channel-interleaved float grid in
  * [-1,1]. Sample rate and channel count come from the DECODED header
  * (the bytes are the source of truth; `meta.sample_rate` describes
  * intent), so downstream pooling sees the true waveform. 16-bit PCM →
  * float is exact (s / 32768), so a synthesize→encode→decode round trip
  * is bit-stable — MultimodalSpec pins it.
  *
  * Video remains stubbed ([[FakeCodec]]) — the JDK ships no H.264/VP9
  * decoder.
  */
object WavCodec extends MediaCodec {
  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val src = in.getFormat
      val target = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate, 16,
        src.getChannels, src.getChannels * 2, src.getSampleRate,
        /* bigEndian = */ false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      try {
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt // sign-extends: little-endian MSB
          out(i) = ((hi << 8) | lo).toShort / 32768.0f
          i += 1
        }
        out
      } finally pcm.close()
    } finally in.close()
  }
}

/** Codec-string dispatch: `image/`-prefixed payloads take the REAL ImageIO
  * path, `audio/`-prefixed payloads the REAL javax.sound path; everything
  * else (video, and the documents-derived `fake/v1` stand-in blobs) falls
  * back to the deterministic fake.
  */
object DispatchCodec extends MediaCodec {
  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] =
    if (meta.codec.startsWith("image/")) ImageIoCodec.decode(content, meta)
    else if (meta.codec.startsWith("audio/")) WavCodec.decode(content, meta)
    else if (meta.codec == "video/y4m" || meta.codec == "video/yuv4mpeg")
      Y4mCodec.decode(content, meta)
    else if (meta.codec == "video/mjpeg" ||
        meta.codec == "video/x-motion-jpeg")
      MjpegCodec.decode(content, meta)
    else FakeCodec.decode(content, meta)
}

/** ==== STUB ==== Deterministic fake decode: byte i of the payload becomes
  * float (b & 0xFF)/255 at grid position i, tiled to
  * width*height*channels. Stands in for a VIDEO library (the JDK has
  * none; images decode for real via [[ImageIoCodec]], audio via
  * [[WavCodec]]) as the fallback implementation of [[MediaCodec]].
  */
object FakeCodec extends MediaCodec {
  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] = {
    val n = math.max(1, meta.width * meta.height * meta.channels)
    val out = new Array[Float](n)
    if (content.isEmpty) return out
    var i = 0
    while (i < n) {
      out(i) = (content(i % content.length) & 0xff) / 255.0f
      i += 1
    }
    out
  }
}

/** Codec-independent post-decode math. */
object MediaCodec {

  /** Nearest-neighbor resize on a decoded single-channel-major grid —
    * real index math, codec-independent.
    */
  def resize(grid: Array[Float], w: Int, h: Int, c: Int,
      newW: Int, newH: Int): Array[Float] = {
    val out = new Array[Float](newW * newH * c)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val sx = x * w / newW
        var ch = 0
        while (ch < c) {
          out((y * newW + x) * c + ch) = grid((sy * w + sx) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Uniform frame sampling: n equally spaced frame indices over a
    * duration — the video-path contract (offsets into the decoded stream).
    */
  def frameOffsets(durationMs: Long, n: Int): Array[Long] =
    Array.tabulate(n)(i => durationMs * i / math.max(1, n))

  /** Mean-pool a grid into `dim` buckets (into a caller-owned buffer). */
  def meanPool(grid: Array[Float], dim: Int, buf: Array[Float]): Array[Float] = {
    val counts = new Array[Int](dim)
    var i = 0
    while (i < grid.length) {
      val b = i * dim / grid.length
      buf(b) += grid(i)
      counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) {
      if (counts(b) > 0) buf(b) /= counts(b)
      b += 1
    }
    buf
  }
}
