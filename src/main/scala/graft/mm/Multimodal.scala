package graft.mm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * typed mapPartitions batches (the Scala analog of `mapInPandas`).
  *
  * The real pipeline decodes PNG/JPEG via javax.imageio
  * (graft.gen.SyntheticCorpus.decode / phashOf); for formats without a JVM
  * codec in this container the decode step is STUBBED with a deterministic
  * fake (clearly marked) while the Spark-side plumbing — schema, batching,
  * partition shape — is real and oracle-tested.
  */
object Multimodal {

  final case class PayloadMeta(
      doc_id: Long, n_bytes: Int, first_byte: Int, fake_w: Int, fake_h: Int)

  /** Extract metadata from a binary payload column in batched mapPartitions.
    * STUB: fake_w/fake_h stand in for a real image decode (no general codec
    * in this container); they are deterministic functions of the payload so
    * the plumbing is end-to-end testable. */
  def extractMeta(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xFF else 0
          val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
          // --- STUB decode: replace with a real codec on a real cluster ---
          PayloadMeta(id, bytes.length, b0, 1 + b0 % 64, 1 + b1 % 64)
        }
      }.toDF()
  }

  final case class DecodedMeta(
      doc_id: Long, fmt_detected: String, w: Int, h: Int, phash: Long)

  /** REAL decode for the formats with a JVM codec: payloads are sniffed by
    * magic bytes (PNG `89 50 4E 47`, JPEG `FF D8`) and decoded via
    * javax.imageio inside batched mapPartitions — width/height/pHash come
    * from actual pixels (the same decode+phash the corpus generator and the
    * PSNR payload-fidelity check use). Unknown formats degrade to the
    * deterministic fake with fmt_detected = "unknown" (the documented stub:
    * no audio/video codec ships in this container; the Spark-side plumbing
    * is identical for them). */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val isPng = bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 &&
            bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
          val isJpg = bytes.length > 2 && (bytes(0) & 0xFF) == 0xFF &&
            (bytes(1) & 0xFF) == 0xD8
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xFF else 0
          val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
          if (isPng || isJpg) {
            // Corrupt/truncated payloads can pass the magic sniff but fail
            // the codec: ImageIO.read returns null or throws. Real-world
            // corpora always contain some — degrade the ROW (fmt_detected =
            // "corrupt", deterministic fake dims) instead of crashing the
            // stage after task retries (ADVICE r2, medium).
            val decoded =
              try Option(graft.gen.SyntheticCorpus.decode(bytes))
              catch { case _: Exception => None }
            decoded match {
              case Some(img) =>
                DecodedMeta(id, if (isPng) "png" else "jpg",
                  img.getWidth, img.getHeight, graft.gen.SyntheticCorpus.phashOf(img))
              case None =>
                DecodedMeta(id, "corrupt", 1 + b0 % 64, 1 + b1 % 64, 0L)
            }
          } else {
            DecodedMeta(id, "unknown", 1 + b0 % 64, 1 + b1 % 64, 0L)
          }
        }
      }.toDF()
  }

  /** Frame-sampling analog: deterministic k byte-offsets per payload
    * (the video-frame sampler's plumbing, sampling bytes instead of frames). */
  def sampleOffsets(spark: SparkSession, payloads: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until k).iterator.flatMap { i =>
          if (bytes.isEmpty) None
          else {
            val off = (bytes.length.toLong * i / k).toInt
            Some((id, i, off, bytes(off) & 0xFF))
          }
        }
      }.toDF("doc_id", "sample_idx", "byte_offset", "byte_value")
  }
}
