package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB; everything Spark-side is real —
  * schema (binary + metadata struct), typed Dataset, and the
  * `mapPartitions` batch shape where a real decoder would amortize codec /
  * model initialization once per partition (the Scala analogue of a
  * `mapInPandas` batch UDF).
  */
object Multimodal {

  /** Extracted per-media features (what a decoder would emit). */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      checksum: Long,
      brightness: Double)

  /** STUB "decode": a real implementation would decode `payload` with an
    * image codec. Deterministic fake: rolling checksum + derived stats. */
  private def decodeStub(id: Long, payload: Array[Byte],
      width: Int, height: Int): MediaFeature = {
    var crc = 1125899906842597L
    var i = 0
    while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
    MediaFeature(id, payload.length, width, height, crc,
      math.abs(crc % 1000) / 1000.0)
  }

  /** Binary payload + metadata → per-partition batched feature extraction.
    * Payload is synthesized from text (no binary column in testdata); the
    * pipeline downstream of the scan is exactly what real media takes. */
  val decodeFeatures = Q.noOracle("mm_decode_features") { (s, dir) =>
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        struct(
          (pmod(col("doc_id"), lit(64)) * 8 + 64).cast("int").as("width"),
          (pmod(col("doc_id"), lit(48)) * 8 + 48).cast("int").as("height"),
          lit("fake/rgb8").as("format")).as("meta"))
    media
      .select(col("doc_id"), col("payload"),
        col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // One decoder init per partition would go here (codec / model).
        rows.map { case (id, bytes, w, h) => decodeStub(id, bytes, w, h) }
      }
      .toDF()
  }

  /** Video-style frame sampling: each media item expands to every Nth
    * "frame" (deterministic pseudo-frame-count from metadata), each frame a
    * row with its own byte-slice payload — the explode-then-process shape a
    * real frame sampler produces. Narrow ops only (explode is per-row). */
  val frameSample = Q.noOracle("mm_frame_sample") { (s, dir) =>
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        (pmod(col("doc_id"), lit(24)) + 2).cast("int").as("n_frames"))
    media
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // stub "frame decode": a deterministic slice of the payload
        substring(base64(col("payload")), 1, 16).as("frame_sig"),
        (col("frame_idx") / greatest(col("n_frames") - 1, lit(1)))
          .as("timestamp_frac"))
  }

  /** Resize: recompute target dimensions preserving aspect ratio to fit a
    * 224×224 budget (the ViT-style input), with the pixel resample itself a
    * stub (deterministic fake checksum over payload + target dims). Pure
    * per-row projection. */
  val resize = Q.noOracle("mm_resize") { (s, dir) =>
    val target = 224
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 8 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 8 + 48).cast("int").as("height"))
    media.select(
      col("doc_id"), col("width"), col("height"),
      least(lit(target) / col("width").cast("double"),
        lit(target) / col("height").cast("double")).as("scale"))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("scale"), 6).as("scale"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
  }

  def all: Seq[Q] = Seq(decodeFeatures, frameSample, resize)
}
