package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extract /
  * frame-sample stages whose Spark-side shape (schema, partitioning,
  * per-partition batching) is real and tested.
  *
  * The decode seam is PROVEN with real pure-JVM codecs for BMP and WAV
  * ([[MediaCodec]] — genuine header parsing, row padding, RIFF chunk
  * walking) via [[packMediaCodec]] → [[decodeMedia]]. STUB NOTICE: for
  * every OTHER mime (jpeg/png/mp4 need native codecs this container
  * lacks) the decode is a declared deterministic fake — `decodeStub`
  * derives pseudo "features" from the payload's md5 so results stay
  * reproducible and oracle-checkable; a JNI codec or `mapInArrow`
  * Python worker drops into the same batched seam without touching the
  * surrounding plumbing.
  */
object MultimodalOps {

  /** Typed media row: what a 100 TB multimodal table's columns look like.
    * Payload stays opaque binary end-to-end; metadata is columnar so
    * filters on mime/size prune parquet row groups without touching bytes.
    */
  final case class MediaRow(
      media_id: Long,
      mime: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      payload_md5: String,
      n_frames: Long,
      feature: Array[Float])

  /** Adapt the documents table into a media table (payload = UTF-8 bytes)
    * — the testdata has no real blobs; the plumbing doesn't care.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(640).as("width"), lit(480).as("height"),
      (col("n_chars") * 40).as("duration_ms"))

  /** Frame-sample plan: byte offsets at a fixed stride — the real decoder
    * would seek these; the plan (explode → per-frame rows, partition
    * count preserved) is the part that must scale.
    */
  def frameOffsets(payloadLen: org.apache.spark.sql.Column, stride: Int) =
    // empty payload → empty offsets: sequence(0, -1, +256) would throw
    // "Illegal sequence boundaries" and kill the whole job on one bad row
    when(payloadLen > 0, sequence(lit(0L), payloadLen - 1, lit(stride.toLong)))
      .otherwise(array().cast("array<bigint>"))

  /** Columnar metadata + fake features, no data movement (a projection —
    * stays in whole-stage codegen).
    */
  def decodeStub(media: DataFrame, frameStride: Int = 256): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      ceil(length(col("payload")) / frameStride.toDouble).cast("long").as("n_frames"))

  /** Resize plan (thumbnail crop): STUB for a real scaler — keeps the
    * first ceil(len/scale²) payload bytes and divides the dimension
    * metadata by `scale`. A real implementation would decode + resample
    * inside [[extractFeatures]]'s batched mapPartitions; what must scale
    * is exactly this shape: the payload slice is a codegen binary
    * expression on the scan side (no shuffle, no driver involvement),
    * and the metadata stays columnar so downstream filters on the new
    * dimensions still prune without touching bytes.
    */
  def resizeStub(media: DataFrame, scale: Int = 2): DataFrame = {
    val thumbLen = ceil(length(col("payload")) / (scale * scale).toDouble)
    media.select(
      col("media_id"),
      (col("width") / scale).cast("int").as("width"),
      (col("height") / scale).cast("int").as("height"),
      col("payload").substr(lit(1), thumbLen.cast("int")).as("thumb"))
  }

  /** One decoded row per media item; format-specific fields are null for
    * the formats they don't apply to, `n_units` is pixels (bmp), samples
    * (wav), or stub frame count (fallback mimes).
    */
  final case class MediaDecoded(
      media_id: Long,
      mime: String,
      width: Option[Long],
      height: Option[Long],
      sample_rate: Option[Long],
      n_units: Long,
      unit_sum: Option[Long],
      first_unit: Option[Long])

  /** BMP logical height / grey pattern and WAV sample pattern: simple
    * integer functions of (doc_id, index) so a DuckDB oracle reproduces
    * the DECODED stats in closed form without parsing any binary — the
    * equality then proves the whole encode→decode byte path.
    */
  def bmpHeight(docId: Long): Int = 1 + (docId % 4).toInt
  def bmpPixel(docId: Long, idx: Int): Int = ((docId + idx) % 256).toInt
  def wavSampleCount(docId: Long): Int = 1 + (docId % 6).toInt * 2
  def wavSample(docId: Long, i: Int): Int =
    ((docId * 31 + i.toLong * 7) % 65536).toInt - 32768

  /** Documents → REAL media payloads: every third doc becomes an actual
    * BMP / WAV bitstream ([[MediaCodec]]); the rest keep UTF-8 bytes as
    * the opaque-fallback mime. Deterministic per doc_id, so the payload
    * bytes themselves are reproducible.
    */
  def packMediaCodec(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id % 3) match {
          case 0 => (id, "image/bmp",
            MediaCodec.encodeBmp(MediaCodec.BmpWidth, bmpHeight(id), bmpPixel(id, _)))
          case 1 => (id, "audio/wav",
            MediaCodec.encodeWav(MediaCodec.WavRate,
              Array.tabulate(wavSampleCount(id))(wavSample(id, _))))
          case _ => (id, "video/mp4", text.getBytes("UTF-8"))
        }
      }
      .toDF("media_id", "mime", "payload")
  }

  /** PNG/JPEG pattern parameters — closed-form functions of doc_id so a
    * DuckDB oracle replays the DECODED stats without parsing bytes. PNG
    * carries a varying grey pattern (lossless ⇒ exact sums replay);
    * JPEG is one uniform-grey 8×8 DCT block (lossy ⇒ the oracle checks
    * a rated-error boolean, not the sum).
    */
  val PngWidth = 4
  def pngHeight(docId: Long): Int = 1 + (docId % 3).toInt
  def pngPixel(docId: Long, i: Int): Int = ((docId + i.toLong * 7) % 256).toInt
  val JpegSide = 8
  def jpegGrey(docId: Long): Int = (docId % 256).toInt

  /** Documents → REAL PNG/JPEG bitstreams through the JDK encoder
    * (alternating by doc_id parity). Same seam shape as
    * [[packMediaCodec]]; deterministic patterns per doc_id.
    */
  def packImageIo(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .map { id =>
        if (id % 2 == 0)
          (id, "image/png",
            MediaCodec.encodeImageIo("png", PngWidth, pngHeight(id), pngPixel(id, _)))
        else
          (id, "image/jpeg",
            MediaCodec.encodeImageIo("jpg", JpegSide, JpegSide, _ => jpegGrey(id)))
      }
      .toDF("media_id", "mime", "payload")
  }

  /** REAL decode through the batched mapPartitions seam: BMP and WAV
    * payloads go through [[MediaCodec]]'s actual binary parsers (header
    * fields, row padding, bottom-up pixel order, RIFF chunk walk); other
    * mimes fall back to the declared stub metadata. This is the seam a
    * JNI image/audio codec drops into — the batching, dispatch-on-mime,
    * and typed output schema are exactly what it would use.
    */
  def decodeMedia(media: DataFrame, frameStride: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch => // real decoders amortize setup per batch
          batch.iterator.map { case (id, mime, payload) =>
            mime match {
              case "image/bmp" =>
                val s = MediaCodec.decodeBmp(payload)
                MediaDecoded(id, mime, Some(s.width.toLong), Some(s.height.toLong),
                  None, s.nPixels, Some(s.channelSum), Some(s.firstPixel.toLong))
              case "audio/wav" =>
                val s = MediaCodec.decodeWav(payload)
                MediaDecoded(id, mime, None, None, Some(s.sampleRate.toLong),
                  s.nSamples, Some(s.sampleSum), Some(s.firstSample.toLong))
              case "image/png" | "image/jpeg" =>
                val s = MediaCodec.decodeImageIo(payload)
                MediaDecoded(id, mime, Some(s.width.toLong), Some(s.height.toLong),
                  None, s.nPixels, Some(s.channelSum), Some(s.firstPixel.toLong))
              case _ => // declared stub fallback (no codec for this mime)
                MediaDecoded(id, mime, None, None, None,
                  (payload.length.toLong + frameStride - 1) / frameStride, None, None)
            }
          }
        }
      }
      .toDF()
  }

  /** Perceptual-hash signatures over REAL decoded images — image-level
    * dedup that survives re-encoding (the same pixels through any
    * lossless codec hash identically; a byte-level md5 would not).
    * Batched mapPartitions like every codec seam here; only the named
    * mime passes (lossy codecs need a tolerance metric, not a hash
    * group-by — excluded by contract, not silently).
    *
    * Returns (media_id, width, height, ahash).
    */
  def perceptualHash(media: DataFrame,
      mime: String = "image/png"): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("mime") === mime)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val (w, h, bits) = MediaCodec.aHash(payload)
            (id, w.toLong, h.toLong, bits)
          }
        }
      }
      .toDF("media_id", "width", "height", "ahash")
  }

  final case class GrayBin(media_id: Long, bin: Long, n_px: Long)

  /** Luminance histogram over REAL decoded BMP payloads — the
    * image-level tonal profile (exposure audits, near-black/near-white
    * junk detection) through the same batched decode seam: gray values
    * bucket into `nBins` equal slices of [0, 256). Bins with zero
    * pixels are omitted (both engines derive the same sparse rows).
    */
  def bmpGrayHistogram(media: DataFrame, nBins: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(256 % nBins == 0, "nBins must divide 256")
    val width = 256 / nBins
    media.filter(col("mime") === "image/bmp")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            MediaCodec.decodeBmpPixels(payload)
              .groupBy(_ / width)
              .map { case (b, px) => GrayBin(id, b.toLong, px.length.toLong) }
          }
        }
      }
      .toDF()
  }

  final case class WavFrame(
      media_id: Long, frame_idx: Long, n_samples: Long, sum_sq: Long,
      rms_micro: Long, is_silence: Long)

  /** Frame-level audio energy over REAL decoded WAV payloads — the
    * VAD-lite primitive (silence trimming, speech-segment selection)
    * a speech-data curation pipeline runs before anything expensive:
    * per `frameLen`-sample frame, exact integer Σv² plus the RMS in
    * floor-micro units and a silence flag against `silenceRms`. The
    * decode runs through the same batched mapPartitions seam as every
    * codec here (byte-level RIFF walks have no Catalyst-expression
    * form); everything AFTER decode is exact integers except the one
    * fixed-order sqrt, so the frames hash-replay against the
    * closed-form generator oracle.
    */
  def wavFrameEnergy(
      media: DataFrame,
      frameLen: Int,
      silenceRms: Double): DataFrame = {
    import media.sparkSession.implicits._
    require(frameLen > 0, "wavFrameEnergy needs a positive frame length")
    media.filter(col("mime") === "audio/wav")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            val samples = MediaCodec.decodeWavSamples(payload)
            samples.grouped(frameLen).zipWithIndex.map { case (fr, fi) =>
              var ssq = 0L
              var i = 0
              while (i < fr.length) { ssq += fr(i).toLong * fr(i); i += 1 }
              val rms = math.sqrt(ssq.toDouble / fr.length)
              WavFrame(id, fi.toLong, fr.length.toLong, ssq,
                math.floor(rms * 1000000.0).toLong,
                if (rms < silenceRms) 1L else 0L)
            }
          }
        }
      }
      .toDF()
  }

  /** Per-partition batched feature extraction — the `mapInPandas` analog:
    * one iterator per partition, features computed batch-at-a-time. The
    * fake feature is 8 floats from the md5 (STUB — replace with codec).
    */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch => // batch shape: real decoders amortize setup
        batch.iterator.map { m =>
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(m.payload)
          val md5Hex = digest.map("%02x".format(_)).mkString
          val feature = digest.take(8).map(b => (b & 0xff) / 255.0f)
          MediaFeatures(
            m.media_id,
            m.payload.length.toLong,
            md5Hex,
            // ceil(len/stride): agrees with decodeStub for all lengths
            // including 0 (the floor((len-1)/stride)+1 form diverged at 0)
            (m.payload.length.toLong + frameStride - 1) / frameStride,
            feature)
        }
      }
    }
  }
}
