package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The image and audio paths are REAL: payloads are genuine PNGs
  * (`javax.imageio`) and RIFF/WAVE PCM files (`javax.sound.sampled`),
  * synthesized deterministically per doc (testdata has no binary column)
  * and decoded back through the actual codecs inside `mapPartitions`
  * batches (one codec warm-up per partition — the Scala analogue of a
  * `mapInPandas` batch UDF). Video codecs don't ship in the JDK, so frame
  * sampling demonstrates the explode-then-process shape over byte slices.
  */
object Multimodal {

  /** Extracted per-media features (what the decoder emits). */
  final case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      brightness: Double)

  /** Per-doc media payload: a real PNG whose dims + pixels derive from
    * doc_id, then a real decode back out of the bytes. */
  val decodeFeatures = Q.noOracle("mm_decode_features") { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      // bounded deterministic corpus (the PQ-demo precedent): the demo
      // exercises the encode→decode pipeline shape at a fixed cost
      // regardless of SF — decode cost is linear in media count, and the
      // bench should not turn into an ImageIO throughput test at sf1+
      .filter(col("doc_id") < 5000)
      .select(col("doc_id"),
        (pmod(col("doc_id"), lit(48)) * 2 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(32)) * 2 + 12).cast("int").as("height"))
      // decode parallelism must not be hostage to the source file layout:
      // a single small parquet file arrives as ONE partition, serializing
      // the codec work. The exchange moves 16 bytes/row; decode is the
      // expensive stage — same reason a 100 TB decode job repartitions
      // metadata before firing the codecs.
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        // codec init amortized once per partition (ImageIO scans plugins on
        // first use); each row: encode payload PNG -> decode real stats
        rows.map { case (id, w, h) =>
          val png = Images.synthPng(id, w, h)
          val (dw, dh, bright) = Images.decodeStats(png)
          MediaFeature(id, png.length, dw, dh, math.rint(bright * 1e6) / 1e6)
        }
      }
      .toDF()
  }

  /** Extracted per-audio features (what the WAV decoder emits). */
  final case class AudioFeature(
      doc_id: Long,
      n_bytes: Int,
      sample_rate: Int,
      n_frames: Long,
      duration_sec: Double,
      rms: Double)

  /** Per-doc audio payload: a real 16-bit PCM WAV (sine whose frequency/
    * amplitude/length derive from doc_id), decoded back through the JDK's
    * real WAV parser — same mapPartitions batch shape as the image path. */
  val audioFeatures = Q.noOracle("mm_audio_features") { (s, dir) =>
    import s.implicits._
    // bounded deterministic corpus: the real synth+parse path at fixed
    // cost regardless of SF (same rationale as the PQ index demo)
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 10000)
      .select(col("doc_id"),
        (pmod(col("doc_id"), lit(20)) * 50 + 200).cast("double").as("freq"),
        ((pmod(col("doc_id"), lit(9)) + 1) / 10.0).as("amp"),
        (pmod(col("doc_id"), lit(16)) * 128 + 512).cast("int").as("n"))
      .repartition(s.sparkContext.defaultParallelism) // see decodeFeatures
      .as[(Long, Double, Double, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, freq, amp, n) =>
          val wav = Audio.synthWav(freq, amp, n)
          val (rate, frames, dur, rms) = Audio.decodeStats(wav)
          AudioFeature(id, wav.length, rate, frames,
            math.rint(dur * 1e6) / 1e6, math.rint(rms * 1e6) / 1e6)
        }
      }
      .toDF()
  }

  /** Video-style frame sampling: each media item expands to every 4th
    * "frame" (deterministic pseudo-frame-count from metadata), each frame a
    * row with its own byte-slice signature — the explode-then-process shape
    * a real frame sampler produces. Narrow ops only (explode is per-row). */
  val frameSample = Q(
    "mm_frame_sample",
    """SELECT doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
      |  substring(base64(encode(text)), 1, 16) AS frame_sig,
      |  round(CAST(f.frame_idx AS DOUBLE) / greatest(n_frames - 1, 1), 6)
      |    AS timestamp_frac
      |FROM (SELECT doc_id, text, CAST(doc_id % 24 + 2 AS INT) AS n_frames
      |      FROM documents) t,
      |  unnest(generate_series(0, n_frames - 1, 4)) AS f(frame_idx)""".stripMargin
  ) { (s, dir) =>
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        (pmod(col("doc_id"), lit(24)) + 2).cast("int").as("n_frames"))
    media
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // frame "decode": a deterministic slice of the payload bytes
        substring(base64(col("payload")), 1, 16).as("frame_sig"),
        round(col("frame_idx").cast("double") /
          greatest(col("n_frames") - 1, lit(1)), 6).as("timestamp_frac"))
  }

  /** Resize planning: target dimensions preserving aspect ratio to fit a
    * 224×224 budget (the ViT-style input). Pure per-row integer/double
    * arithmetic — oracle-checked; the pixel resample kernel itself
    * ([[Images.resizePng]]) is real and pinned by MultimodalSpec. */
  val resize = Q(
    "mm_resize",
    """SELECT doc_id, width, height,
      |  round(scale, 6) AS scale,
      |  CAST(floor(width * scale) AS INT) AS out_w,
      |  CAST(floor(height * scale) AS INT) AS out_h
      |FROM (
      |  SELECT doc_id, width, height,
      |    least(224.0 / width, 224.0 / height) AS scale
      |  FROM (SELECT doc_id,
      |          CAST((doc_id % 64) * 8 + 64 AS INT) AS width,
      |          CAST((doc_id % 48) * 8 + 48 AS INT) AS height
      |        FROM documents) t) s""".stripMargin) { (s, dir) =>
    val target = 224
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
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

  /** Per-image perceptual hash over a corpus with planted duplicate
    * structure: ~1 image "scene" per 40 docs, each doc carrying either
    * the scene image verbatim, a bilinear 1.5× upscale, or a +18
    * brightness edit ([[Images.phash64]], real PNG encode→decode→DCT per
    * row inside `mapPartitions`). Output is (doc, scene, variant, hash) —
    * the MultimodalSpec pins that edits stay within a small Hamming
    * radius of their scene and distinct scenes stay far. */
  val phash = Q.noOracle("mm_phash") { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 2000)
      // variant derives from the BLOCK index (doc_id / 40), not doc_id
      // itself: scene = id % 40 makes id % 5 constant per scene (40 ≡ 0
      // mod 5), which would leave some scenes with only edited copies
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(40)).as("scene"),
        pmod(floor(col("doc_id") / 40), lit(5)).as("variant"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, scene, variant) =>
          // 64×48 frames: the hash area-averages to 9×8 anyway, and PNG
          // encode/decode per row is this operator's whole cost
          val base = Images.wavePng(scene, 64, 48)
          val payload = variant match {
            case 3 => Images.resizePng(base, 96, 72)
            case 4 => Images.brightenPng(base, 18)
            case _ => base
          }
          (id, scene, variant, Images.phash64(payload))
        }
      }
      .toDF("doc_id", "scene", "variant", "phash")
  }

  /** Image near-duplicate detection over [[phash]]: 8 bands of 8 bits
    * bucket the corpus (pigeonhole-complete for Hamming ≤ 7 — same shape
    * as SimHash text dedup), candidate pairs from the per-band equi-join
    * only, verified with a codegen'd `bit_count(xor)`. Summary output:
    * distinct near-dup pairs and docs involved, at threshold 6. Never an
    * all-pairs product — at 100 TB the band join shuffles 16-byte rows
    * and hot buckets cap like the text-dedup path. */
  val phashNearDup = Q.noOracle("mm_phash_neardup") { (s, dir) =>
    nearDupSummary(phash.run(s, dir), "phash", maxHamming = 6)
  }

  /** Banded Hamming near-dup over any 64-bit perceptual hash column:
    * 8 bands of 8 bits bucket the corpus (pigeonhole-complete through
    * Hamming 7), candidate pairs come only from the per-band equi-join,
    * verified with codegen'd `bit_count(xor)`. Shared by the image and
    * audio paths — and by any future modality that hashes to 64 bits. */
  private[pipeline] def bandedNearDup(hashes0: org.apache.spark.sql.DataFrame,
      hashCol: String, maxHamming: Int): org.apache.spark.sql.DataFrame = {
    // Pin the hash frame before the self-join: both join sides re-evaluate
    // their lineage, and here the lineage is the per-row codec kernel (PNG
    // encode→decode→DCT / WAV encode→band-energies) — the operator's whole
    // cost, paid 2× without the pin. The pinned frame is (doc_id, hash) —
    // 16 bytes/row at any scale.
    val hashes = graft.Materialize.pin(hashes0)
    val banded = hashes.select(col("doc_id"), col(hashCol),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftright(col(hashCol), b * 8).bitwiseAND(lit(0xffL))
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col(hashCol),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  private def nearDupSummary(hashes: org.apache.spark.sql.DataFrame,
      hashCol: String, maxHamming: Int): org.apache.spark.sql.DataFrame =
    bandedNearDup(hashes.select("doc_id", hashCol), hashCol, maxHamming)
      .agg(
        count(lit(1)).as("n_pairs"),
        count_distinct(col("doc_a")).as("n_left"),
        count_distinct(col("doc_b")).as("n_right"))

  /** Per-audio spectral fingerprint over a corpus with planted duplicate
    * structure, mirroring [[phash]]: ~1 chord "track" per 40 docs, each
    * doc carrying the track verbatim, at 0.6× gain, or at 0.8× gain
    * ([[Audio.afp64]] — real WAV encode→decode→band energies per row).
    * 36 tracks, the chord generator's full period: beyond it seeds
    * repeat chords, which would plant cross-track exact dups. */
  val audioFp = Q.noOracle("mm_audiofp") { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(36)).as("track"),
        pmod(floor(col("doc_id") / 36), lit(5)).as("variant"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, track, variant) =>
          val base = Audio.chordWav(track, 2048)
          val payload = variant match {
            case 3 => Audio.gainWav(base, 0.6)
            case 4 => Audio.gainWav(base, 0.8)
            case _ => base
          }
          (id, track, variant, Audio.afp64(payload))
        }
      }
      .toDF("doc_id", "track", "variant", "afp")
  }

  /** Audio near-dup summary at Hamming ≤ 6 over [[audioFp]] — identical
    * machinery to the image path, different modality kernel. */
  val audioFpNearDup = Q.noOracle("mm_audiofp_neardup") { (s, dir) =>
    nearDupSummary(audioFp.run(s, dir), "afp", maxHamming = 6)
  }

  def all: Seq[Q] =
    Seq(decodeFeatures, audioFeatures, frameSample, resize, phash,
      phashNearDup, audioFp, audioFpNearDup)
}
