package graft.ops

/** Pure-JVM codecs for two REAL container formats — BMP (uncompressed
  * 24-bpp BI_RGB) and WAV (RIFF PCM16) — so the multimodal decode seam
  * in [[MultimodalOps]] is proven end-to-end on genuine binary formats
  * without native dependencies: actual magic numbers, little-endian
  * header fields, bottom-up pixel rows with 4-byte row padding, and a
  * RIFF chunk walker that skips unknown chunks (including the odd-size
  * pad byte rule).
  *
  * Byte-level and deterministic on both sides, so a decoded value is
  * checkable against a closed-form oracle: encode a known integer
  * pattern, decode through the real parser, compare exact sums and
  * first-unit probes — any header-math bug (stride, padding, bottom-up
  * order, chunk pad) breaks the equality.
  */
object MediaCodec {

  /** ImageIO's default ImageInputStream is DISK-cached: every decode
    * writes a temp file under java.io.tmpdir, so a 32-thread decode
    * stage turns into temp-file churn that scales with host IO
    * pressure, not CPU (measured r15: the two ImageIO rows were the
    * only mm_* rows to move, 0.85 → 7.3 s at ×10 in a slow-IO window,
    * degrading pass-over-pass as the churn accumulated while the CPU
    * calib held steady). The inputs here are in-memory byte arrays —
    * a disk cache buys nothing — so switch the JVM to the memory-cached
    * stream once, before any decode. Executor-side too: the flag is
    * per-JVM, and every decode call references this lazy val first.
    */
  private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  // -- little-endian primitives --------------------------------------------

  private def wrLe16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def wrLe32(out: Array[Byte], off: Int, v: Int): Unit = {
    var i = 0
    while (i < 4) { out(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def rdLe16Signed(b: Array[Byte], off: Int): Int =
    rdLe16(b, off).toShort.toInt

  private def rdLe32(b: Array[Byte], off: Int): Int = {
    var v = 0; var i = 0
    while (i < 4) { v |= (b(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  // -- BMP ------------------------------------------------------------------

  /** 3·5 = 15 bytes per pixel row → one pad byte per row: the width is
    * chosen so row padding is EXERCISED, not coincidentally absent.
    */
  val BmpWidth = 5

  /** Encode a BI_RGB 24-bpp BMP: 14-byte file header, 40-byte
    * BITMAPINFOHEADER, then pixel rows stored BOTTOM-UP (positive
    * height), each padded to a 4-byte boundary. `pixel(idx)` supplies the
    * grey value of logical (top-down, row-major) pixel `idx`; all three
    * channels get it.
    */
  def encodeBmp(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val dataLen = stride * h
    val out = new Array[Byte](54 + dataLen) // pad bytes stay 0
    out(0) = 'B'; out(1) = 'M'
    wrLe32(out, 2, 54 + dataLen) // file size
    wrLe32(out, 10, 54)          // pixel data offset
    wrLe32(out, 14, 40)          // BITMAPINFOHEADER size
    wrLe32(out, 18, w)
    wrLe32(out, 22, h)           // positive → bottom-up
    wrLe16(out, 26, 1)           // planes
    wrLe16(out, 28, 24)          // bpp
    wrLe32(out, 30, 0)           // BI_RGB (uncompressed)
    wrLe32(out, 34, dataLen)
    var s = 0
    while (s < h) {
      var c = 0
      while (c < w) {
        // stored row s holds logical row h-1-s
        val v = (pixel((h - 1 - s) * w + c) & 0xff).toByte
        val o = 54 + s * stride + c * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        c += 1
      }
      s += 1
    }
    out
  }

  final case class BmpStats(
      width: Int,
      height: Int,
      bpp: Int,
      nPixels: Long,
      channelSum: Long,
      firstPixel: Int)

  /** Parse a 24-bpp BI_RGB BMP strictly (bad magic / compression / bpp
    * raise — quarantine upstream if lenience is wanted). `channelSum` is
    * the exact sum of every channel byte; `firstPixel` is the TOP-LEFT
    * logical pixel, which bottom-up storage puts at the START OF THE
    * LAST stored row — reading it from offset 0 is the classic bug this
    * field exists to catch.
    */
  def decodeBmp(bytes: Array[Byte]): BmpStats = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP (missing BM magic)")
    val dataOff = rdLe32(bytes, 10)
    val w = rdLe32(bytes, 18)
    val h = rdLe32(bytes, 22)
    val bpp = rdLe16(bytes, 28)
    val compression = rdLe32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: only uncompressed 24-bpp supported, got bpp=$bpp compression=$compression")
    require(h > 0, s"decodeBmp: top-down (negative height) not supported, got $h")
    val stride = (w * 3 + 3) / 4 * 4
    require(bytes.length >= dataOff + stride * h, "decodeBmp: truncated pixel data")
    var sum = 0L
    var s = 0
    while (s < h) {
      var c = 0
      while (c < w) {
        val o = dataOff + s * stride + c * 3
        sum += (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)
        c += 1
      }
      s += 1
    }
    val firstPixel = bytes(dataOff + (h - 1) * stride) & 0xff
    BmpStats(w, h, bpp, w.toLong * h, sum, firstPixel)
  }

  // -- PNG / JPEG via javax.imageio -----------------------------------------
  //
  // The formats a real multimodal pipeline actually ingests, decoded by
  // the JDK's own pure-Java plugins (no native deps, headless-safe).
  // PNG is lossless: decode(encode(pattern)) returns the exact pixels,
  // so its stats oracle-check in closed form like BMP's. JPEG is lossy:
  // exact pixel equality is not a property the format has, so its
  // contract is a RATED-ERROR bound (the a5_approx_sketches pattern) —
  // encode a uniform-grey single-DCT-block image, decode, and assert
  // the per-channel mean error within a small tolerance; the boolean is
  // what the oracle checks.

  final case class ImageStats(
      width: Int,
      height: Int,
      nPixels: Long,
      channelSum: Long,
      firstPixel: Int)

  /** Encode a grey pattern with the JDK encoder. `format` is an ImageIO
    * informal name ("png", "jpg"); `pixel(idx)` supplies the grey value
    * of row-major pixel `idx`, written to all three channels.
    */
  def encodeImageIo(format: String, w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(y * w + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    imageIoMemoryCache
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, baos)
    require(ok, s"encodeImageIo: no JDK writer for format '$format'")
    baos.toByteArray
  }

  /** Decode any ImageIO-readable bitstream (PNG/JPEG/GIF/BMP…) and
    * reduce it to exact integer stats: `channelSum` sums R+G+B over
    * every pixel; `firstPixel` probes the top-left RED channel (all
    * three are equal for the grey patterns this engine packs). Strict:
    * undecodable bytes raise — quarantine upstream if lenience is
    * wanted.
    */
  /** Average-hash perceptual signature over a DECODED image (aHash, the
    * classic perceptual-dedup primitive): each pixel's luma contributes
    * one bit — set when `n·luma ≥ Σluma`, i.e. luma ≥ mean compared in
    * EXACT integer arithmetic (no division) — packed MSB-first in
    * row-major pixel order. Returns (width, height, bits); callers
    * group/ham on (w, h, bits). Defined for images up to 64 pixels (the
    * fixture sizes); a production path would block-average to 8×8
    * first — the thresholding and packing here are exactly that last
    * stage. Luma is the red channel (the fixtures are grey; a weighted
    * luma swap touches only this line).
    */
  def aHash(bytes: Array[Byte]): (Int, Int, Long) = {
    imageIoMemoryCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "aHash: not a decodable image bitstream")
    val w = img.getWidth
    val h = img.getHeight
    val n = w * h
    require(n <= 64, s"aHash: image has $n pixels; block-average to <= 64 first")
    val luma = new Array[Int](n)
    var i = 0
    var sum = 0L
    while (i < n) {
      luma(i) = (img.getRGB(i % w, i / w) >> 16) & 0xff
      sum += luma(i)
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < n) {
      if (n.toLong * luma(i) >= sum) bits |= 1L << (n - 1 - i)
      i += 1
    }
    (w, h, bits)
  }

  def decodeImageIo(bytes: Array[Byte]): ImageStats = {
    imageIoMemoryCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "decodeImageIo: not a decodable image bitstream")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val first = (img.getRGB(0, 0) >> 16) & 0xff
    ImageStats(w, h, w.toLong * h, sum, first)
  }

  // -- WAV ------------------------------------------------------------------

  val WavRate = 8000

  /** Encode a RIFF PCM16 mono WAV. A junk `LIST` chunk of ODD size sits
    * between `fmt ` and `data` so a decoder that doesn't walk chunks (or
    * forgets RIFF's even-byte pad rule) fails loudly instead of passing
    * by luck.
    */
  def encodeWav(rate: Int, samples: Array[Int]): Array[Byte] = {
    val junk = "INFOx".getBytes("US-ASCII") // odd length 5 → 1 pad byte
    val junkPadded = junk.length + (junk.length & 1)
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataLen)
    val out = new Array[Byte](8 + riffLen)
    var o = 0
    def tag(t: String): Unit = { t.getBytes("US-ASCII").copyToArray(out, o); o += 4 }
    tag("RIFF"); wrLe32(out, o, riffLen); o += 4
    tag("WAVE")
    tag("fmt "); wrLe32(out, o, 16); o += 4
    wrLe16(out, o, 1)              // PCM
    wrLe16(out, o + 2, 1)          // mono
    wrLe32(out, o + 4, rate)
    wrLe32(out, o + 8, rate * 2)   // byte rate
    wrLe16(out, o + 12, 2)         // block align
    wrLe16(out, o + 14, 16)        // bits
    o += 16
    tag("LIST"); wrLe32(out, o, junk.length); o += 4
    junk.copyToArray(out, o); o += junkPadded // pad byte stays 0
    tag("data"); wrLe32(out, o, dataLen); o += 4
    samples.foreach { s => wrLe16(out, o, s & 0xffff); o += 2 }
    out
  }

  final case class WavStats(
      sampleRate: Int,
      nChannels: Int,
      bitsPerSample: Int,
      nSamples: Long,
      sampleSum: Long,
      firstSample: Int)

  /** Walk the RIFF chunk list (honoring the odd-size pad byte), parse
    * `fmt `, and reduce `data` to exact integer stats. Strict on format:
    * non-PCM / non-16-bit raises.
    */
  def decodeWav(bytes: Array[Byte]): WavStats = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "decodeWav: not a RIFF/WAVE stream")
    var rate = -1; var channels = -1; var bits = -1; var block = -1
    var nSamples = 0L; var sum = 0L; var first = 0; var haveData = false
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = new String(bytes, o, 4, "US-ASCII")
      val size = rdLe32(bytes, o + 4)
      val body = o + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"decodeWav: fmt chunk too small ($size)")
          val audioFormat = rdLe16(bytes, body)
          channels = rdLe16(bytes, body + 2)
          rate = rdLe32(bytes, body + 4)
          block = rdLe16(bytes, body + 12)
          bits = rdLe16(bytes, body + 14)
          require(audioFormat == 1 && bits == 16,
            s"decodeWav: only PCM16 supported, got format=$audioFormat bits=$bits")
        case "data" =>
          require(block > 0, "decodeWav: data chunk before fmt chunk")
          require(body + size <= bytes.length, "decodeWav: truncated data chunk")
          nSamples = size.toLong / block
          var i = 0
          while (i < nSamples) {
            val s = rdLe16Signed(bytes, body + i * block)
            if (i == 0) first = s
            sum += s
            i += 1
          }
          haveData = true
        case _ => // unknown chunk (LIST, etc.): skip
      }
      o = body + size + (size & 1) // RIFF pads odd chunks to even
    }
    require(haveData, "decodeWav: no data chunk")
    WavStats(rate, channels, bits, nSamples, sum, first)
  }

  /** The gray values of every LOGICAL pixel in row-major order — the
    * same strict 24-bpp parse as [[decodeBmp]], materializing the
    * raster (bottom-up storage unflipped) for histogram/feature work.
    * Gray = the blue channel byte (this codec writes R = G = B).
    */
  def decodeBmpPixels(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmpPixels: not a BMP (missing BM magic)")
    val dataOff = rdLe32(bytes, 10)
    val w = rdLe32(bytes, 18)
    val h = rdLe32(bytes, 22)
    val bpp = rdLe16(bytes, 28)
    val compression = rdLe32(bytes, 30)
    require(bpp == 24 && compression == 0,
      "decodeBmpPixels: only uncompressed 24-bpp supported")
    require(h > 0, "decodeBmpPixels: top-down not supported")
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Int](w * h)
    var s = 0
    while (s < h) {
      var c = 0
      while (c < w) {
        out((h - 1 - s) * w + c) = bytes(dataOff + s * stride + c * 3) & 0xff
        c += 1
      }
      s += 1
    }
    out
  }

  /** The data chunk's PCM16 samples themselves — same RIFF walk as
    * [[decodeWav]], materializing the waveform for frame-level analysis
    * (energy, VAD) instead of reducing to summary stats.
    */
  def decodeWavSamples(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "decodeWavSamples: not a RIFF/WAVE stream")
    var block = -1
    var out: Array[Int] = null
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = new String(bytes, o, 4, "US-ASCII")
      val size = rdLe32(bytes, o + 4)
      val body = o + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"decodeWavSamples: fmt chunk too small ($size)")
          val audioFormat = rdLe16(bytes, body)
          block = rdLe16(bytes, body + 12)
          val bits = rdLe16(bytes, body + 14)
          require(audioFormat == 1 && bits == 16,
            "decodeWavSamples: only PCM16 supported")
        case "data" =>
          require(block > 0, "decodeWavSamples: data chunk before fmt chunk")
          require(body + size <= bytes.length,
            "decodeWavSamples: truncated data chunk")
          val n = size / block
          out = Array.tabulate(n)(i => rdLe16Signed(bytes, body + i * block))
        case _ =>
      }
      o = body + size + (size & 1)
    }
    require(out != null, "decodeWavSamples: no data chunk")
    out
  }
}
