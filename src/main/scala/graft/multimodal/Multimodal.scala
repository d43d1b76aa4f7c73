package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus a feature-extraction pass.
  *
  * IMAGES decode FOR REAL since r13 (`javax.imageio` ships in the JDK —
  * the 12-round "no codecs in this container" premise was wrong for
  * images): [[plantPng]] / [[decodeImageStats]] / [[resizeNearest]] /
  * [[frameStats]] run actual PNG encode → decode → pixel math inside
  * the same partition-wise geometry, with DETERMINISTIC planted images
  * (pixels are affine formulas of (doc_id, x, y) mod 256, PNG is
  * lossless) so the pixel-stat projections are integer-exact and
  * DuckDB-oracled. The byte-level stub path below ([[decodeStub]])
  * remains the fallback shape for formats with no JDK codec
  * (audio/video containers). Either way the Spark shape is the real
  * one a production decode/resize/frame-sample stage uses at 100 TB:
  * schema (payload binary + metadata struct), typed Dataset boundary,
  * per-partition decoder init, `mapPartitions` batch streaming (the
  * Scala analogue of `mapInPandas`).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, format: String, width: Int, height: Int,
                            payload: Array[Byte])
  final case class FeatureRow(doc_id: Long, format: String, n_bytes: Int,
                              checksum: Long, feature: Array[Double])

  /** Pack a text corpus into media rows: payload = utf-8 bytes, fake
    * width/height metadata derived from the id (deterministic). */
  def pack(docs: DataFrame, idCol: String, textCol: String, fmtCol: String): Dataset[MediaRow] = {
    val df = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(fmtCol).as("format"),
      (pmod(col(idCol), lit(8)) * 160 + 320).cast("int").as("width"),
      (pmod(col(idCol), lit(8)) * 90 + 180).cast("int").as("height"),
      encode(col(textCol), "UTF-8").as("payload"))
    df.as(Encoders.product[MediaRow])
  }

  /** STUB decoder: a real implementation would decode the payload
    * (JPEG/PNG/WAV...) here; this derives a deterministic 4-dim
    * pseudo-feature + checksum so the pipeline is testable end-to-end. */
  private[multimodal] def decodeStub(m: MediaRow): FeatureRow = {
    var sum = 0L
    var i = 0
    while (i < m.payload.length) { sum += (m.payload(i) & 0xFF); i += 1 }
    val f = Array.tabulate(4) { j =>
      if (j < m.payload.length) (m.payload(j) & 0xFF) / 255.0 else 0.0
    }
    FeatureRow(m.doc_id, m.format, m.payload.length, sum % 1000000007L, f)
  }

  /** Partition-wise feature extraction over the typed boundary. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] =
    media.mapPartitions { it =>
      // per-partition init of the (stub) decoder would go here
      it.map(decodeStub)
    }(Encoders.product[FeatureRow])

  /** STUB resize: a real stage would decode, scale to target, and
    * re-encode; the stub resamples every stride-th payload byte so the
    * output size tracks the target deterministically. The metadata
    * update + per-partition map is the production geometry. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] =
    media.mapPartitions { it =>
      it.map { m =>
        val stride = math.max(1, (m.width.toLong * m.height /
          math.max(1, targetW.toLong * targetH)).toInt)
        val out = new Array[Byte]((m.payload.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = m.payload(i * stride); i += 1 }
        MediaRow(m.doc_id, m.format, targetW, targetH, out)
      }
    }(Encoders.product[MediaRow])

  // ------------------------------------------------ real image decode

  /** Integer-exact per-image pixel statistics (sums are over 8-bit
    * channel values — exact in Long at any image size). */
  final case class ImageStat(doc_id: Long, width: Int, height: Int,
                             n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-frame pixel statistics of a frame-stacked "video" image. */
  final case class FrameStat(doc_id: Long, frame_idx: Int,
                             sum_r: Long, sum_g: Long, sum_b: Long)

  /** The planted deterministic pixel: channel values are affine
    * formulas of (doc_id, frame, x, y) mod 256 — reproducible in plain
    * SQL, which is what lets the decode pipeline be DuckDB-oracled
    * end-to-end (PNG is lossless, so decode(encode(img)) returns these
    * exact values). */
  @inline private def plantR(id: Long, f: Long, x: Long, y: Long): Int =
    ((id * 31 + f * 101 + x * 7 + y * 13) % 256).toInt
  @inline private def plantG(id: Long, f: Long, x: Long, y: Long): Int =
    ((id * 17 + f * 101 + x * 5 + y * 11) % 256).toInt
  @inline private def plantB(id: Long, f: Long, x: Long, y: Long): Int =
    ((id * 23 + f * 101 + x * 3 + y * 19) % 256).toInt

  /** Planted image dims: width 8..20, height 6..14 — small and
    * id-varied so every (width, height) class is exercised. */
  @inline private[multimodal] def plantW(id: Long): Int = (8 + (id % 4) * 4).toInt
  @inline private[multimodal] def plantH(id: Long): Int = (6 + (id % 3) * 4).toInt

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def buildImage(id: Long, frames: Int, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h * frames,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var f = 0
    while (f < frames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, f * h + y,
            (plantR(id, f, x, y) << 16) | (plantG(id, f, x, y) << 8) |
              plantB(id, f, x, y))
          x += 1
        }
        y += 1
      }
      f += 1
    }
    img
  }

  /** Plant one REAL PNG per document (payload = actual PNG bytes of
    * the deterministic image above) — the ingest shape of an image
    * corpus: per-partition imperative encode, binary payload + typed
    * metadata, nothing driver-side. */
  def plantPng(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    ids.as(Encoders.scalaLong).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per task
      it.map { id =>
        val w = plantW(id); val h = plantH(id)
        MediaRow(id, "png", w, h, pngBytes(buildImage(id, 1, w, h)))
      }
    }(Encoders.product[MediaRow])
  }

  /** REAL decode: ImageIO-parse each payload and reduce to integer
    * pixel statistics. Fails loudly on an undecodable payload — a
    * silent skip would make a corrupt ingest look like a clean one. */
  def decodeImageStats(media: Dataset[MediaRow]): Dataset[ImageStat] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable ${m.format} payload for doc ${m.doc_id}")
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStat(m.doc_id, img.getWidth, img.getHeight,
          img.getWidth.toLong * img.getHeight, sr, sg, sb)
      }
    }(Encoders.product[ImageStat])

  /** REAL resize: decode, NEAREST-NEIGHBOR resample (src = ⌊x·sw/tw⌋ —
    * deterministic integer math, unlike Graphics2D interpolation whose
    * rounding is JDK-implementation-defined), re-encode PNG. The
    * round trip decode → resample → encode → (a later) decode is
    * integer-exact and therefore oracle-able. */
  def resizeNearest(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(src != null, s"undecodable ${m.format} payload for doc ${m.doc_id}")
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          val sy = y * src.getHeight / targetH
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y, src.getRGB(x * src.getWidth / targetW, sy))
            x += 1
          }
          y += 1
        }
        MediaRow(m.doc_id, "png", targetW, targetH, pngBytes(out))
      }
    }(Encoders.product[MediaRow])

  /** Plant a frame-stacked "video": one PNG of `frames(id)` = 2+(id%3)
    * frames stacked vertically (frame f occupies rows [f·h, (f+1)·h)),
    * each frame's pixels the planted formula with its frame index —
    * the fixed-frame-geometry container a real sampler sees, with a
    * real codec in the loop. Frame geometry rides the metadata struct
    * (width = frame width, height = FRAME height, not the stack's). */
  def plantFramePng(docs: DataFrame, idCol: String, frameW: Int = 12,
                    frameH: Int = 8): Dataset[MediaRow] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    ids.as(Encoders.scalaLong).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val frames = (2 + id % 3).toInt
        MediaRow(id, "png", frameW, frameH,
          pngBytes(buildImage(id, frames, frameW, frameH)))
      }
    }(Encoders.product[MediaRow])
  }

  /** REAL frame sampling: decode the stacked PNG, slice every
    * `everyN`-th frame band (capped at `maxFrames` — the
    * [[frameSample]] sampling contract on a real codec), emit each
    * sampled frame's integer pixel sums. One media row fans out to
    * many frame rows — the flatMap geometry of a video sampler. */
  def frameStats(media: Dataset[MediaRow], everyN: Int = 2,
                 maxFrames: Int = 8): Dataset[FrameStat] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"undecodable ${m.format} payload for doc ${m.doc_id}")
        val h = m.height
        val nFrames = img.getHeight / h
        (0 until nFrames by everyN).take(maxFrames).map { f =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = f * h
          while (y < (f + 1) * h) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          FrameStat(m.doc_id, f, sr, sg, sb)
        }
      }
    }(Encoders.product[FrameStat])

  // ------------------------------------------- real multi-frame container

  /** The 256-entry identity gray ramp palette: index v renders as
    * (v, v, v). With ≤256 colors GIF is LOSSLESS, so a planted palette
    * index round-trips the codec exactly. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Plant one REAL ANIMATED GIF per document — a genuine
    * one-file-many-frames container (the frame-stacked PNG of
    * [[plantFramePng]] proved the codec; this closes the remaining
    * simulation: the container geometry itself). `javax.imageio`'s GIF
    * plugin writes and reads multi-frame files
    * (prepareWriteSequence / getNumImages / read(i)); each frame here
    * is full-size at offset (0, 0) with no inter-frame compositing, so
    * read(i) IS frame i. Pixels are the planted GRAY formula
    * (value = plantR(id, f, x, y), identity gray palette), so the
    * decoded per-frame sums are integer-exact and DuckDB-oracle-able
    * through the real container. Frame COUNT deliberately does NOT
    * ride the metadata struct — the sampler discovers it from the
    * container, as a real video pipeline must. */
  def plantGif(docs: DataFrame, idCol: String, frameW: Int = 12,
               frameH: Int = 8): Dataset[MediaRow] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    ids.as(Encoders.scalaLong).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = it.map { id =>
        val frames = (2 + id % 3).toInt
        val baos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(frameW, frameH,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          val raster = img.getRaster
          var y = 0
          while (y < frameH) {
            var x = 0
            while (x < frameW) {
              raster.setSample(x, y, 0, plantR(id, f, x, y))
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        MediaRow(id, "gif", frameW, frameH, baos.toByteArray)
      }
      // one writer per partition (the per-partition decoder-init
      // geometry); disposal rides the iterator's end
      new Iterator[MediaRow] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) writer.dispose(); h }
        def next(): MediaRow = out.next()
      }
    }(Encoders.product[MediaRow])
  }

  /** REAL multi-frame sampling: open the GIF container, discover the
    * frame count FROM THE FILE (ImageReader.getNumImages), decode and
    * emit every `everyN`-th frame's integer pixel sums under the
    * `maxFrames` cap — the [[frameStats]] contract on a genuine
    * container instead of a stacked-band convention. Fails loudly on
    * an unreadable payload or a frame whose size disagrees with the
    * metadata struct (a corrupt container must not pass silently). */
  def gifFrameStats(media: Dataset[MediaRow], everyN: Int = 2,
                    maxFrames: Int = 8): Dataset[FrameStat] =
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // one reader per partition, like plantGif's writer: setInput
      // resets all decoder state per payload, disposal rides the
      // iterator's end (r14 review fix — the per-row registry lookup
      // + reader construction paid codec init once per DOCUMENT)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val out = it.flatMap { m =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        try {
          reader.setInput(iis, false, true)
          val nFrames = reader.getNumImages(true)
          require(nFrames > 0, s"unreadable gif payload for doc ${m.doc_id}")
          (0 until nFrames by everyN).take(maxFrames).map { f =>
            val img = reader.read(f)
            require(img.getWidth == m.width && img.getHeight == m.height,
              s"frame $f of doc ${m.doc_id} is ${img.getWidth}x${img.getHeight}, " +
                s"metadata says ${m.width}x${m.height}")
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            FrameStat(m.doc_id, f, sr, sg, sb)
          }
        } finally { iis.close() }
      }
      new Iterator[FrameStat] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) reader.dispose(); h }
        def next(): FrameStat = out.next()
      }
    }(Encoders.product[FrameStat])

  // ------------------------------------------------ real audio decode
  //
  // The JDK also ships a REAL audio codec: javax.sound.sampled parses
  // RIFF/WAV PCM with no sound hardware involved (the reader is pure
  // byte parsing), so the audio arm gets the image arm's r13 upgrade —
  // planted deterministic PCM16 samples, a REAL WAV encode → decode
  // round trip, integer-exact sample statistics, DuckDB-oracled.
  // Lossy audio (MP3/OGG) and video containers remain the declared
  // stub: the JDK genuinely carries no codec for them.

  /** Integer-exact per-clip sample statistics. */
  final case class AudioStat(doc_id: Long, n_samples: Long, sample_rate: Int,
                             sum_amp: Long, sum_abs: Long)

  /** The planted sample: a deterministic integer formula of
    * (doc_id, i) in [−2048, 2047] ⊂ PCM16 range — reproducible in
    * plain SQL, lossless through 16-bit PCM. */
  @inline private def plantSample(id: Long, i: Long): Int =
    (((id * 37 + i * 17) % 4096) - 2048).toInt

  @inline private[multimodal] def plantSamples(id: Long): Int =
    (50 + (id % 5) * 25).toInt

  private val WavRate = 8000f

  /** Plant one REAL WAV (PCM16 mono, RIFF container written by
    * AudioSystem) per document. */
  def plantWav(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    ids.as(Encoders.scalaLong).mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(WavRate, 16, 1,
        true /* signed */, false /* little-endian */)
      it.map { id =>
        val n = plantSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = plantSample(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        MediaRow(id, "wav", n, 1, baos.toByteArray)
      }
    }(Encoders.product[MediaRow])
  }

  /** REAL decode: AudioSystem-parse each WAV payload and reduce to
    * integer sample statistics (sum of signed samples + sum of
    * absolute amplitudes — the pair downstream loudness/silence gates
    * read). Fails loudly on an unparseable payload, like the image
    * arm. */
  def decodeWavStats(media: Dataset[MediaRow]): Dataset[AudioStat] =
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected WAV shape for doc ${m.doc_id}: $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L; var abs = 0L
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt // sign-carrying high byte
          val s = (hi << 8) | lo
          sum += s; abs += math.abs(s)
          i += 1
        }
        AudioStat(m.doc_id, n.toLong, fmt.getSampleRate.toInt, sum, abs)
      }
    }(Encoders.product[AudioStat])

  final case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** STUB frame sampling: treat the payload as a fixed-frame-size
    * "video" and emit every `everyN`-th frame (capped at `maxFrames`).
    * One media row fans out to many frame rows — the flatMap geometry a
    * real video sampler has; each frame row carries its own stats so
    * downstream stages (dedup, embedding) treat frames as documents. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
                  everyN: Int = 2, maxFrames: Int = 8): Dataset[FrameRow] =
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = m.payload.length / frameBytes
        (0 until nFrames by everyN).take(maxFrames).map { f =>
          var sum = 0L
          var i = f * frameBytes
          val end = (f + 1) * frameBytes
          while (i < end) { sum += (m.payload(i) & 0xFF); i += 1 }
          FrameRow(m.doc_id, f, frameBytes, sum % 1000000007L)
        }
      }
    }(Encoders.product[FrameRow])
}
