package graft.multimodal

/** REAL video decode for the two public container formats a JDK-only build
  * can parse (no external dependency, zero egress):
  *
  *  - [[Y4mCodec]] — YUV4MPEG2 (`.y4m`), the uncompressed interchange
  *    format used by codec test suites (xiph.org media sets, FFmpeg
  *    `-f yuv4mpeg`): an ASCII header line, then `FRAME\n`-delimited raw
  *    planar YUV. Fully parsed here: 4:2:0 / 4:2:2 / 4:4:4 / mono chroma,
  *    BT.601 limited-range integer conversion to RGB.
  *  - [[MjpegCodec]] — motion-JPEG as concatenated JPEG images (the
  *    stream layout of `-f mjpeg` / many IP cameras), split frame-by-frame
  *    with the JDK's own JPEG reader (ImageIO), so entropy-coded FF bytes
  *    are handled by a real parser, not a marker scan.
  *
  * Inter-frame-compressed codecs (H.264/VP9/AV1) still fall back to
  * [[FakeCodec]] — the JDK ships no such decoder and dependencies are
  * frozen. The [[MediaCodec]] contract is unchanged: a drop-in H.264
  * decoder would slot into [[DispatchCodec]] exactly like these two.
  *
  * Both decoders return the UNIFORMLY SAMPLED frames (at most
  * `maxFrames`, default 4) as concatenated row-major RGB float grids in
  * [0,1] — the training-pipeline frame-sample contract: bounded output
  * per row regardless of clip length, deterministic frame choice
  * (indices i*n/k, the same spacing as [[MediaCodec.frameOffsets]]).
  */
object VideoCodec {
  /** Uniform sample of k = min(n, maxFrames) indices over n frames. */
  def sampleIndices(n: Int, maxFrames: Int): Array[Int] = {
    val k = math.min(n, maxFrames)
    Array.tabulate(k)(i => i * n / k)
  }

  /** BT.601 limited-range YUV -> RGB, the classic integer form (identical
    * rounding everywhere, so decode is bit-deterministic):
    * C=Y-16, D=U-128, E=V-128;
    * R=(298C+409E+128)>>8, G=(298C-100D-208E+128)>>8, B=(298C+516D+128)>>8.
    */
  @inline def yuvToRgb(y: Int, u: Int, v: Int): (Int, Int, Int) = {
    val c = y - 16; val d = u - 128; val e = v - 128
    def clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x
    (clamp((298 * c + 409 * e + 128) >> 8),
      clamp((298 * c - 100 * d - 208 * e + 128) >> 8),
      clamp((298 * c + 516 * d + 128) >> 8))
  }
}

/** YUV4MPEG2 parser. Stream layout (public format, e.g. the mjpegtools
  * spec): `YUV4MPEG2 W<w> H<h> F<n:d> [Ip A<n:d> C<chroma> X...]\n`
  * then per frame `FRAME[ params]\n` + raw planes (Y then U then V).
  */
object Y4mCodec extends MediaCodec {
  private val MaxFrames = 4

  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] =
    decodeSampled(content, MaxFrames)

  def decodeSampled(content: Array[Byte], maxFrames: Int): Array[Float] = {
    val headerEnd = content.indexOf('\n'.toByte)
    require(headerEnd > 0, "y4m: missing header line")
    val header = new String(content, 0, headerEnd, "US-ASCII")
    val fields = header.split(' ')
    require(fields.headOption.contains("YUV4MPEG2"),
      s"y4m: bad magic '${fields.headOption.getOrElse("")}'")
    def param(tag: Char): Option[String] =
      fields.iterator.drop(1).find(f => f.nonEmpty && f.head == tag)
        .map(_.tail)
    val w = param('W').map(_.toInt)
      .getOrElse(sys.error("y4m: missing W"))
    val h = param('H').map(_.toInt)
      .getOrElse(sys.error("y4m: missing H"))
    val chroma = param('C').getOrElse("420jpeg")
    // chroma plane dims per subsampling mode
    val (cw, ch) =
      if (chroma.startsWith("420")) ((w + 1) / 2, (h + 1) / 2)
      else if (chroma.startsWith("422")) ((w + 1) / 2, h)
      else if (chroma.startsWith("444")) (w, h)
      else if (chroma == "mono") (0, 0)
      else sys.error(s"y4m: unsupported chroma C$chroma")
    val frameBytes = w * h + 2 * cw * ch
    // index all frame payload offsets (FRAME lines may carry params, so
    // scan each frame header line rather than assuming a fixed stride)
    val offsets = Array.newBuilder[Int]
    var pos = headerEnd + 1
    while (pos < content.length) {
      val lineEnd = content.indexOf('\n'.toByte, pos)
      require(lineEnd > 0, "y4m: truncated FRAME header")
      val line = new String(content, pos, lineEnd - pos, "US-ASCII")
      require(line == "FRAME" || line.startsWith("FRAME "),
        s"y4m: expected FRAME, got '$line'")
      require(lineEnd + 1 + frameBytes <= content.length,
        "y4m: truncated frame payload")
      offsets += (lineEnd + 1)
      pos = lineEnd + 1 + frameBytes
    }
    val frames = offsets.result()
    require(frames.nonEmpty, "y4m: no frames")
    val picks = VideoCodec.sampleIndices(frames.length, maxFrames)
    val out = new Array[Float](picks.length * w * h * 3)
    var f = 0
    while (f < picks.length) {
      val base = frames(picks(f))
      val uBase = base + w * h
      val vBase = uBase + cw * ch
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = content(base + y * w + x) & 0xff
          val (uu, vv) =
            if (cw == 0) (128, 128) // mono
            else {
              val ci =
                (if (ch == h) y else y / 2) * cw + (if (cw == w) x else x / 2)
              (content(uBase + ci) & 0xff, content(vBase + ci) & 0xff)
            }
          val (r, g, b) = VideoCodec.yuvToRgb(yy, uu, vv)
          val o = (f * w * h + y * w + x) * 3
          out(o) = r / 255.0f
          out(o + 1) = g / 255.0f
          out(o + 2) = b / 255.0f
          x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }
}

/** Motion-JPEG parser: the payload is a back-to-back sequence of complete
  * JPEG images. Frame boundaries come from a marker-level walk of each
  * JPEG — length-prefixed segments are skipped wholesale (so an EOI
  * inside an embedded EXIF thumbnail can't split a frame early) and
  * entropy-coded data is scanned honoring byte stuffing (FF00) and
  * restart markers, where a bare FFD9 is unambiguously the real EOI.
  * Each sampled frame then decodes through the JDK's own JPEG reader
  * (ImageIO).
  */
object MjpegCodec extends MediaCodec {
  private val MaxFrames = 4

  def decode(content: Array[Byte], meta: Media.MediaMeta): Array[Float] =
    decodeSampled(content, MaxFrames)

  /** Frame boundaries: byte offset just past each complete JPEG. */
  private def frameBounds(content: Array[Byte]): Array[(Int, Int)] = {
    val bounds = Array.newBuilder[(Int, Int)]
    var start = 0
    while (start + 1 < content.length &&
        (content(start) & 0xff) == 0xff && (content(start + 1) & 0xff) == 0xd8) {
      // find EOI: scan markers the way a JPEG parser does — skip stuffed
      // FF00 and restart markers, honor segment lengths (so thumbnails
      // inside APP1 are skipped wholesale)
      var i = start + 2
      var end = -1
      while (end < 0 && i + 1 < content.length) {
        if ((content(i) & 0xff) != 0xff) i += 1
        else (content(i + 1) & 0xff) match {
          case 0xd9 => end = i + 2 // EOI
          case 0x00 | 0x01 => i += 2 // stuffed FF / TEM
          case m if m >= 0xd0 && m <= 0xd7 => i += 2 // restart marker
          case m if m == 0xd8 => i += 2 // nested SOI (shouldn't occur)
          case _ =>
            // segment with 2-byte big-endian length (includes itself)
            if (i + 3 < content.length) {
              val len = ((content(i + 2) & 0xff) << 8) | (content(i + 3) & 0xff)
              i += 2 + math.max(2, len)
            } else i = content.length
        }
      }
      require(end > 0, "mjpeg: truncated JPEG frame (no EOI)")
      bounds += ((start, end))
      start = end
      // tolerate padding between frames (some muxers align)
      while (start + 1 < content.length &&
          !((content(start) & 0xff) == 0xff && (content(start + 1) & 0xff) == 0xd8))
        start += 1
    }
    bounds.result()
  }

  def decodeSampled(content: Array[Byte], maxFrames: Int): Array[Float] = {
    val bounds = frameBounds(content)
    require(bounds.nonEmpty, "mjpeg: no JPEG SOI at stream start")
    val picks = VideoCodec.sampleIndices(bounds.length, maxFrames)
    val grids = picks.map { i =>
      val (s, e) = bounds(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content, s, e - s))
      require(img != null, s"mjpeg: ImageIO could not decode frame $i")
      val w = img.getWidth
      val h = img.getHeight
      val g = new Array[Float](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val base = (y * w + x) * 3
          g(base) = ((rgb >> 16) & 0xff) / 255.0f
          g(base + 1) = ((rgb >> 8) & 0xff) / 255.0f
          g(base + 2) = (rgb & 0xff) / 255.0f
          x += 1
        }
        y += 1
      }
      g
    }
    val out = new Array[Float](grids.map(_.length).sum)
    var o = 0
    grids.foreach { g =>
      System.arraycopy(g, 0, out, o, g.length)
      o += g.length
    }
    out
  }
}
