package graft.sources

/** Codec-free media container formats: byte-level writers + header parsers
  * for BMP (image), canonical RIFF/WAVE (audio) and a minimal RIFF/AVI
  * (video). No image/audio libraries exist in this container, but these
  * three formats carry their metadata in fixed-offset little-endian header
  * fields, so real parsing is ~20 lines of pure-JVM byte reads each —
  * width/height/frame-count in [[Multimodal.decode]] come from the BYTES,
  * not from the media id.
  *
  * Field layout sources (public format specs):
  *  - BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B); int32 width
  *    at byte 18, int32 height at byte 22.
  *  - WAVE: RIFF header + `fmt ` chunk (audioFormat/channels/sampleRate/
  *    blockAlign) + `data` chunk; frames = dataSize / blockAlign.
  *  - AVI: RIFF `AVI ` + LIST `hdrl` + `avih` (56 B main header);
  *    dwTotalFrames at avih offset 16, dwWidth at 32, dwHeight at 36.
  */
object MediaFormats {

  // ---- little-endian primitives -------------------------------------------

  @inline private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  @inline private def putI16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  @inline private def putTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }
  @inline def readI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  @inline def readI16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  @inline private def tagAt(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parsed header metadata; -1 marks "field absent for this format". */
  final case class MediaHeader(
      format: String, width: Int, height: Int, nFrames: Int,
      sampleRate: Int, channels: Int)

  // ---- BMP ----------------------------------------------------------------

  /** Truncated-pixel BMP: full 54-byte header (the size fields describe the
    * declared geometry) followed by `payload` arbitrary pixel bytes — enough
    * for metadata extraction, which is all a 100 TB profiling pass does
    * before shipping rows to a GPU decode stage.
    */
  def bmpBytes(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + payload.length)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length)         // bfSize
    putI32(out, 10, 54)                // bfOffBits
    putI32(out, 14, 40)                // biSize (BITMAPINFOHEADER)
    putI32(out, 18, width)             // biWidth
    putI32(out, 22, height)            // biHeight
    putI16(out, 26, 1)                 // biPlanes
    putI16(out, 28, 24)                // biBitCount
    putI32(out, 30, 0)                 // biCompression = BI_RGB
    putI32(out, 34, payload.length)    // biSizeImage
    System.arraycopy(payload, 0, out, 54, payload.length)
    out
  }

  def parseBmp(bytes: Array[Byte]): Option[MediaHeader] = {
    if (bytes.length < 26 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val w = readI32(bytes, 18)
    val h = readI32(bytes, 22) // negative = top-down row order
    Some(MediaHeader("bmp", w, math.abs(h), nFrames = 1, sampleRate = -1, channels = -1))
  }

  // ---- WAV ----------------------------------------------------------------

  /** Canonical 44-byte PCM WAVE header + `data` bytes (8-bit mono:
    * blockAlign = 1, so frame count == data size).
    */
  def wavBytes(sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + data.length)
    putTag(out, 0, "RIFF"); putI32(out, 4, out.length - 8); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putI32(out, 16, 16)
    putI16(out, 20, 1)                  // PCM
    putI16(out, 22, 1)                  // channels
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate)         // byteRate = rate * blockAlign
    putI16(out, 32, 1)                  // blockAlign
    putI16(out, 34, 8)                  // bitsPerSample
    putTag(out, 36, "data"); putI32(out, 40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Canonical 44-byte PCM WAVE header + little-endian 16-bit mono
    * samples (blockAlign = 2) — the layout every PCM decoder reads
    * without a codec. Samples must fit a signed short.
    */
  def wavPcm16Bytes(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](44 + samples.length * 2)
    putTag(out, 0, "RIFF"); putI32(out, 4, out.length - 8); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putI32(out, 16, 16)
    putI16(out, 20, 1)                  // PCM
    putI16(out, 22, 1)                  // channels
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * 2)     // byteRate = rate * blockAlign
    putI16(out, 32, 2)                  // blockAlign
    putI16(out, 34, 16)                 // bitsPerSample
    putTag(out, 36, "data"); putI32(out, 40, samples.length * 2)
    var i = 0
    while (i < samples.length) {
      putI16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Little-endian signed 16-bit PCM samples of a canonical-layout WAVE
    * produced by [[wavPcm16Bytes]]: locate the `data` chunk by walking
    * the RIFF list, then decode byte pairs. Empty on malformed input.
    */
  def pcm16Samples(bytes: Array[Byte]): Array[Int] = {
    if (bytes.length < 12 || tagAt(bytes, 0) != "RIFF" ||
        tagAt(bytes, 8) != "WAVE") return Array.empty
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = tagAt(bytes, off)
      val size = readI32(bytes, off + 4)
      if (tag == "data") {
        val n = math.min(size, bytes.length - off - 8) / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = (readI16(bytes, off + 8 + i * 2) << 16) >> 16 // sign-extend
          i += 1
        }
        return out
      }
      off += 8 + size + (size & 1)
    }
    Array.empty
  }

  /** Walk the RIFF chunk list: `fmt ` gives channels/rate/blockAlign,
    * `data` gives the byte count → frames = dataSize / blockAlign.
    */
  def parseWav(bytes: Array[Byte]): Option[MediaHeader] = {
    if (bytes.length < 12 || tagAt(bytes, 0) != "RIFF" || tagAt(bytes, 8) != "WAVE")
      return None
    var off = 12
    var channels = -1; var rate = -1; var blockAlign = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val tag = tagAt(bytes, off)
      val size = readI32(bytes, off + 4)
      if (tag == "fmt " && off + 8 + 16 <= bytes.length) {
        channels = readI16(bytes, off + 10)
        rate = readI32(bytes, off + 12)
        blockAlign = readI16(bytes, off + 20)
      } else if (tag == "data") {
        dataLen = math.min(size, bytes.length - off - 8)
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (rate < 0 || dataLen < 0 || blockAlign <= 0) None
    else Some(MediaHeader("wav", width = -1, height = -1,
      nFrames = dataLen / blockAlign, sampleRate = rate, channels = channels))
  }

  // ---- AVI ----------------------------------------------------------------

  /** Minimal RIFF/AVI: the `hdrl` LIST with a spec-complete 56-byte `avih`
    * main header (geometry + frame count), then a JUNK chunk as movi-stand-in
    * payload. Real AVI players need stream lists too; a metadata scan needs
    * exactly what is here.
    */
  def aviBytes(width: Int, height: Int, nFrames: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](96 + payload.length)
    putTag(out, 0, "RIFF"); putI32(out, 4, out.length - 8); putTag(out, 8, "AVI ")
    putTag(out, 12, "LIST"); putI32(out, 16, 4 + 8 + 56); putTag(out, 20, "hdrl")
    putTag(out, 24, "avih"); putI32(out, 28, 56)
    val avih = 32                       // avih data starts here
    putI32(out, avih, 33333)            // dwMicroSecPerFrame (~30 fps)
    putI32(out, avih + 16, nFrames)     // dwTotalFrames
    putI32(out, avih + 24, 1)           // dwStreams
    putI32(out, avih + 32, width)       // dwWidth
    putI32(out, avih + 36, height)      // dwHeight
    putTag(out, 88, "JUNK"); putI32(out, 92, payload.length)
    System.arraycopy(payload, 0, out, 96, payload.length)
    out
  }

  /** RIFF/AVI with a REAL `movi` LIST: one uncompressed `00db` BGR24
    * chunk per frame (bottom-up rows, 4-byte stride — the same raster
    * layout a BI_RGB BMP uses), after the spec-complete `avih` header.
    * [[aviFramesGray]] must undo the chunk walk, row order, stride and
    * luma to read the pixels back — container parsing, not a stub.
    */
  def aviWithFrames(width: Int, height: Int,
                    frames: Array[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height),
      s"every frame must be $width x $height")
    val stride = ((width * 3 + 3) / 4) * 4
    val frameBytes = stride * height
    val moviBody = 4 + frames.length * (8 + frameBytes)
    val out = new Array[Byte](88 + 8 + moviBody)
    putTag(out, 0, "RIFF"); putI32(out, 4, out.length - 8); putTag(out, 8, "AVI ")
    putTag(out, 12, "LIST"); putI32(out, 16, 4 + 8 + 56); putTag(out, 20, "hdrl")
    putTag(out, 24, "avih"); putI32(out, 28, 56)
    val avih = 32
    putI32(out, avih, 33333)
    putI32(out, avih + 16, frames.length)
    putI32(out, avih + 24, 1)
    putI32(out, avih + 32, width)
    putI32(out, avih + 36, height)
    putTag(out, 88, "LIST"); putI32(out, 92, moviBody); putTag(out, 96, "movi")
    var off = 100
    frames.foreach { gray =>
      putTag(out, off, "00db"); putI32(out, off + 4, frameBytes)
      var y = 0
      while (y < height) {
        val srcRow = height - 1 - y // bottom-up storage
        var x = 0
        while (x < width) {
          val v = (gray(srcRow * width + x) & 0xff).toByte
          val base = off + 8 + y * stride + x * 3
          out(base) = v; out(base + 1) = v; out(base + 2) = v
          x += 1
        }
        y += 1
      }
      off += 8 + frameBytes
    }
    out
  }

  /** Decode every `00db` frame of an AVI built with real movi chunks to
    * TOP-DOWN gray rasters (ITU-R 601 luma, exact for achromatic
    * pixels). None when the container has no movi frames (e.g. the
    * JUNK-payload metadata fixtures) — metadata and pixel paths share
    * one source, like the BMP side.
    */
  def aviFramesGray(bytes: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    val header = parseAvi(bytes).getOrElse(return None)
    val (w, h) = (header.width, header.height)
    if (w <= 0 || h <= 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    var off = 12
    var movi = -1
    while (off + 12 <= bytes.length && movi < 0) {
      if (tagAt(bytes, off) == "LIST" && tagAt(bytes, off + 8) == "movi")
        movi = off
      else off += 8 + readI32(bytes, off + 4) + (readI32(bytes, off + 4) & 1)
    }
    if (movi < 0) return None
    var p = movi + 12
    val end = math.min(bytes.length, movi + 8 + readI32(bytes, movi + 4))
    while (p + 8 <= end) {
      val size = readI32(bytes, p + 4)
      if (tagAt(bytes, p) == "00db" && size >= stride * h) {
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val srcRow = h - 1 - y
          var x = 0
          while (x < w) {
            val base = p + 8 + srcRow * stride + x * 3
            val b = bytes(base) & 0xff
            val g = bytes(base + 1) & 0xff
            val r = bytes(base + 2) & 0xff
            gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        frames += gray
      }
      p += 8 + size + (size & 1)
    }
    if (frames.isEmpty) None else Some((w, h, frames.toArray))
  }

  /** Walk RIFF LIST/chunk structure to the `avih` main header. */
  def parseAvi(bytes: Array[Byte]): Option[MediaHeader] = {
    if (bytes.length < 12 || tagAt(bytes, 0) != "RIFF" || tagAt(bytes, 8) != "AVI ")
      return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = tagAt(bytes, off)
      val size = readI32(bytes, off + 4)
      if (tag == "LIST" && tagAt(bytes, off + 8) == "hdrl") {
        off += 12 // descend into the LIST body
      } else if (tag == "avih" && off + 8 + 40 <= bytes.length) {
        val d = off + 8
        return Some(MediaHeader("avi",
          width = readI32(bytes, d + 32), height = readI32(bytes, d + 36),
          nFrames = readI32(bytes, d + 16), sampleRate = -1, channels = -1))
      } else {
        off += 8 + size + (size & 1)
      }
    }
    None
  }

  /** Dispatch on magic bytes — the mime column is a hint, the CONTENT is the
    * truth (exactly how an object-store ingest must treat extensions).
    */
  def parse(bytes: Array[Byte]): Option[MediaHeader] =
    parseBmp(bytes).orElse(parseAvi(bytes)).orElse(parseWav(bytes))

  // ---- Full-raster 24-bit BMP ---------------------------------------------

  /** Encode a complete 24-bit BMP from a TOP-DOWN row-major gray raster:
    * rows are stored bottom-up with 4-byte stride padding (the standard
    * layout), each pixel B=G=R=gray. A real container, not a stub — the
    * decoder below must undo the row order and stride to read it back.
    */
  def bmp24GrayBytes(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == width * height,
      s"raster ${gray.length} != $width x $height")
    val stride = ((width * 3 + 3) / 4) * 4
    val payload = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // bottom-up storage
      var x = 0
      while (x < width) {
        val v = (gray(srcRow * width + x) & 0xff).toByte
        val base = y * stride + x * 3
        payload(base) = v; payload(base + 1) = v; payload(base + 2) = v
        x += 1
      }
      y += 1
    }
    bmpBytes(width, height, payload)
  }

  /** Decode a 24-bit uncompressed BMP to a TOP-DOWN gray raster via the
    * integer ITU-R 601 luma (299·R + 587·G + 114·B) / 1000 — exact for
    * achromatic pixels. Handles bottom-up and top-down (negative height)
    * row order and stride padding. None for anything that is not a
    * complete 24-bit BI_RGB raster (e.g. the truncated metadata-only
    * fixtures), so profiling and pixel paths can share one source.
    */
  def decodeBmp24Gray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val off = readI32(bytes, 10)
    val w = readI32(bytes, 18)
    val hRaw = readI32(bytes, 22)
    val bits = readI16(bytes, 28)
    val comp = readI32(bytes, 30)
    if (bits != 24 || comp != 0 || w <= 0 || hRaw == 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > bytes.length) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val base = off + srcRow * stride + x * 3
        val b = bytes(base) & 0xff
        val g = bytes(base + 1) & 0xff
        val r = bytes(base + 2) & 0xff
        gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decode a PNG to the same top-down gray raster contract as
    * [[decodeBmp24Gray]], via the JDK's built-in `ImageIO` PNG reader —
    * lossless and deterministic (PNG decode is exact; the identical
    * integer ITU-R 601 luma runs on the recovered RGB), with no new
    * dependencies. Scope is deliberately PNG-ONLY (signature-gated): the
    * JDK also ships JPEG readers, but lossy decode is not bit-portable
    * across JDK versions, and a silent lossy path would undermine the
    * exact-pixel oracle discipline. None for anything non-PNG or
    * malformed. The BMP leg stays the oracle-replayable one (DuckDB
    * replays its pixels from raw bytes; PNG's DEFLATE stream cannot be
    * replayed in SQL) — pinned equal to this decoder in MultimodalSpec
    * instead.
    */
  def decodePngGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return None; i += 1 }
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      Some((w, h, gray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Container-dispatching gray decode: BMP (byte-level, oracle-
    * replayable) first, then PNG ([[decodePngGray]]). The shared raster
    * contract means every pixel consumer (imageStats, dHash, shot
    * detection) is container-agnostic.
    */
  def decodeImageGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeBmp24Gray(bytes).orElse(decodePngGray(bytes))
}
