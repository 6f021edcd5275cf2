package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {

  test("BMP round-trip: header fields, padded stride, bottom-up order") {
    // width 5 → 15-byte rows padded to 16: stride math is exercised
    val w = 5; val h = 3
    val bytes = MediaCodec.encodeBmp(w, h, i => i % 256)
    assert(bytes.length == 54 + 16 * 3) // padded stride, not 15
    val s = MediaCodec.decodeBmp(bytes)
    assert(s.width == w && s.height == h && s.bpp == 24)
    assert(s.nPixels == 15L)
    assert(s.channelSum == 3L * (0 until 15).sum)
    // logical top-left pixel is idx 0 → value 0; stored at the START OF
    // THE LAST row (bottom-up). An offset-0 read would see idx 10 = 10.
    assert(s.firstPixel == 0)
    val bottomLeftStored = bytes(54) & 0xff
    assert(bottomLeftStored == (h - 1) * w) // proves rows really are flipped
  }

  test("BMP decode is strict: bad magic, wrong bpp, truncation all raise") {
    val good = MediaCodec.encodeBmp(5, 2, _ => 7)
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badMagic))
    val badBpp = good.clone(); badBpp(28) = 8
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badBpp))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(good.take(60)))
  }

  test("WAV round-trip: fmt parse, junk-chunk skip with odd-size pad, signed samples") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = MediaCodec.encodeWav(8000, samples)
    val s = MediaCodec.decodeWav(bytes)
    assert(s.sampleRate == 8000 && s.nChannels == 1 && s.bitsPerSample == 16)
    assert(s.nSamples == samples.length.toLong)
    assert(s.sampleSum == samples.map(_.toLong).sum)
    assert(s.firstSample == 0)
    // the encoder plants an odd-size LIST chunk before data: reaching the
    // data chunk at all proves the walker honors the RIFF pad-byte rule
    assert(new String(bytes, 36, 4, "US-ASCII") == "LIST")
  }

  test("WAV decode is strict: bad container and non-PCM raise") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII")))
    val good = MediaCodec.encodeWav(8000, Array(1, 2, 3))
    // audioFormat lives at fmt body offset 0 = byte 20
    val nonPcm = good.clone(); nonPcm(20) = 3
    intercept[IllegalArgumentException](MediaCodec.decodeWav(nonPcm))
  }

  test("PNG round-trip through javax.imageio is lossless: exact pattern stats") {
    val w = 4; val h = 3
    val bytes = MediaCodec.encodeImageIo("png", w, h, i => (11 + i * 7) % 256)
    // PNG magic: proves a real bitstream came out, not a raw buffer
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val s = MediaCodec.decodeImageIo(bytes)
    assert(s.width == w && s.height == h && s.nPixels == 12L)
    assert(s.channelSum == 3L * (0 until 12).map(i => (11 + i * 7) % 256).sum)
    assert(s.firstPixel == 11)
  }

  test("JPEG round-trip is lossy but bounded: uniform block decodes within tolerance") {
    // one 8×8 DCT block of uniform grey: the hardest-to-get-wrong JPEG,
    // which is the point — the contract is a rated error bound, not
    // bitwise equality (lossy formats don't have that property)
    for (v <- Seq(0, 7, 128, 200, 255)) {
      val bytes = MediaCodec.encodeImageIo("jpg", 8, 8, _ => v)
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) // SOI marker
      val s = MediaCodec.decodeImageIo(bytes)
      assert(s.width == 8 && s.height == 8 && s.nPixels == 64L)
      val exact = 3L * 64L * v
      assert(math.abs(s.channelSum - exact) <= 4L * 3L * 64L,
        s"grey $v: channelSum ${s.channelSum} vs exact $exact drifted past ±4/channel")
    }
  }

  test("image decode is strict: undecodable bytes raise") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeImageIo("definitely not an image".getBytes("US-ASCII")))
  }

  test("packMediaCodec → decodeMedia: real parsers match the closed forms") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val docs = (0L until 12L).map(id => (id, "x" * (id.toInt * 37 + 1)))
      .toDF("doc_id", "text")
    val out = MultimodalOps.decodeMedia(MultimodalOps.packMediaCodec(docs))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.size == 12)
    for (id <- 0L until 12L) {
      val r = out(id)
      (id % 3) match {
        case 0 =>
          val h = MultimodalOps.bmpHeight(id)
          val n = MediaCodec.BmpWidth * h
          assert(r.getAs[String]("mime") == "image/bmp")
          assert(r.getAs[Long]("width") == MediaCodec.BmpWidth.toLong)
          assert(r.getAs[Long]("height") == h.toLong)
          assert(r.getAs[Long]("n_units") == n.toLong)
          assert(r.getAs[Long]("unit_sum") ==
            3L * (0 until n).map(MultimodalOps.bmpPixel(id, _).toLong).sum)
          assert(r.getAs[Long]("first_unit") == (id % 256))
        case 1 =>
          val n = MultimodalOps.wavSampleCount(id)
          assert(r.getAs[String]("mime") == "audio/wav")
          assert(r.getAs[Long]("sample_rate") == MediaCodec.WavRate.toLong)
          assert(r.getAs[Long]("n_units") == n.toLong)
          assert(r.getAs[Long]("unit_sum") ==
            (0 until n).map(MultimodalOps.wavSample(id, _).toLong).sum)
          assert(r.getAs[Long]("first_unit") == MultimodalOps.wavSample(id, 0).toLong)
        case _ =>
          assert(r.getAs[String]("mime") == "video/mp4")
          assert(r.isNullAt(r.fieldIndex("unit_sum"))) // declared stub: no decode
          val len = id * 37 + 1 // ASCII text: 1 byte per char
          assert(r.getAs[Long]("n_units") == (len + 255) / 256)
      }
    }
  }

  test("aHash: hand-computed bits, and the same pixels hash identically through PNG and BMP") {
    // 2×2 pattern: lumas 10, 200, 10, 200 → sum 420, n=4; bit set where
    // 4·luma ≥ 420 → bits 0101 (MSB-first row-major) = 5
    val pix = Array(10, 200, 10, 200)
    val png = MediaCodec.encodeImageIo("png", 2, 2, pix(_))
    assert(MediaCodec.aHash(png) == ((2, 2, 5L)))
    // re-encoding invariance — the claim that makes a PERCEPTUAL hash
    // worth having: identical pixels through a different lossless
    // container produce the identical signature (byte-level md5 differs)
    val bmp = MediaCodec.encodeBmp(2, 2, pix(_))
    assert(MediaCodec.aHash(bmp) == MediaCodec.aHash(png))
    assert(!java.util.Arrays.equals(png, bmp))
    // uniform image: every luma equals the mean → all bits set
    val flat = MediaCodec.encodeImageIo("png", 2, 2, _ => 7)
    assert(MediaCodec.aHash(flat) == ((2, 2, 15L)))
    // the ≤64-pixel contract fails loudly
    intercept[IllegalArgumentException] {
      MediaCodec.aHash(MediaCodec.encodeImageIo("png", 9, 8, _ => 0))
    }
  }

  test("decodeBmpPixels round-trips the raster through stride padding and unflip") {
    // w=3: row bytes 9 -> stride 12 (3 pad bytes per stored row)
    val px = Array(10, 20, 30, 40, 50, 60) // 3x2, row-major top-down
    val bytes = MediaCodec.encodeBmp(3, 2, px(_))
    assert(MediaCodec.decodeBmpPixels(bytes).toSeq == px.toSeq)
    // histogram over the decoded raster through the seam
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Seq((5L, "image/bmp", bytes)).toDF("media_id", "mime", "payload")
    val h = graft.ops.MultimodalOps.bmpGrayHistogram(media, 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(h == Map(0L -> 6L)) // all values < 64
  }

  test("decodeWavSamples round-trips the waveform; frame energy is exact") {
    val samples = Array(100, -200, 300, -32768, 32767, 0, 7)
    val bytes = MediaCodec.encodeWav(8000, samples)
    assert(MediaCodec.decodeWavSamples(bytes).toSeq == samples.toSeq)
    // frame math over the decoded samples, mirrored by wavFrameEnergy
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Seq((1L, "audio/wav", bytes), (2L, "image/bmp", bytes))
      .toDF("media_id", "mime", "payload")
    val out = graft.ops.MultimodalOps.wavFrameEnergy(media, 4, 8192.0)
      .collect().map(r => (r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // only the wav row decodes; frame 0 = [100,-200,300,-32768]
    val ssq0 = 100L * 100 + 200L * 200 + 300L * 300 + 32768L * 32768
    val rms0 = math.sqrt(ssq0.toDouble / 4)
    assert(out(0L) == ((4L, ssq0, math.floor(rms0 * 1e6).toLong,
      if (rms0 < 8192.0) 1L else 0L)))
    // frame 1 = [32767, 0, 7] (short tail frame)
    val ssq1 = 32767L * 32767 + 49L
    val rms1 = math.sqrt(ssq1.toDouble / 3)
    assert(out(1L) == ((3L, ssq1, math.floor(rms1 * 1e6).toLong, 0L)))
    assert(out.size == 2)
  }
}
