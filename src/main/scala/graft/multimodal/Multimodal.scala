package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, plus a feature-extraction pass.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic pseudo-features
  * from the raw bytes. Everything around it — the schema
  * (payload binary + metadata struct), the typed Dataset boundary, and
  * the partition-wise batch extraction (`mapPartitions`, the Scala
  * analogue of `mapInPandas`: decoder state is initialized once per
  * partition, rows stream through in batches) — is the real shape a
  * production decode/resize/frame-sample stage would use at 100 TB.
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
