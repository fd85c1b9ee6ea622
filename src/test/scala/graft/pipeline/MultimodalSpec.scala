package graft.pipeline

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("decode pipeline emits one feature row per media item, deterministic") {
    val df = Multimodal.decodeFeatures.run(spark, sf0001)
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "brightness"))
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getInt(1) > 0))
    // decoded dims must equal the metadata dims the PNG was synthesized at
    assert(rows.forall { r =>
      val id = r.getLong(0)
      r.getInt(2) == (id % 48) * 2 + 16 && r.getInt(3) == (id % 32) * 2 + 12
    })
    assert(rows.forall { r =>
      val bright = r.getDouble(4)
      bright >= 0.0 && bright < 1.0
    })
    val again = Multimodal.decodeFeatures.run(spark, sf0001).collect()
    assert(rows.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq ==
      again.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString).toSeq)
  }

  test("decode extracts exact dims and brightness from real pixels") {
    // constant color (60, 120, 240): brightness = (60+120+240)/3/255
    val png = Images.constPng(10, 8, 60, 120, 240)
    val (w, h, bright) = Images.decodeStats(png)
    assert(w == 10 && h == 8)
    assert(math.abs(bright - (60 + 120 + 240) / (3.0 * 255.0)) < 1e-12)
    // PNG round-trip is lossless: synth -> decode -> re-encode -> same stats
    val png2 = Images.synthPng(42L, 33, 17)
    val s1 = Images.decodeStats(png2)
    val s2 = Images.decodeStats(Images.toPng(Images.fromPng(png2)))
    assert(s1 == s2)
  }

  test("audio decode: exact format and sine RMS from real WAV bytes") {
    // a sine of amplitude A has RMS A/sqrt(2); use a whole number of
    // periods so the discrete RMS matches the analytic value closely
    val wav = Audio.synthWav(freqHz = 400, amp = 0.5, n = 8000)
    val (rate, frames, dur, rms) = Audio.decodeStats(wav)
    assert(rate == 8000 && frames == 8000)
    assert(math.abs(dur - 1.0) < 1e-9)
    assert(math.abs(rms - 0.5 / math.sqrt(2.0)) < 1e-3, s"rms=$rms")
    // silence decodes to rms 0
    assert(Audio.decodeStats(Audio.synthWav(100, 0.0, 1000))._4 == 0.0)
  }

  test("audio pipeline emits one feature row per doc, deterministic") {
    val df = Multimodal.audioFeatures.run(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val id = r.getLong(0)
      r.getLong(3) == (id % 16) * 128 + 512 && r.getInt(2) == 8000
    })
    assert(rows.forall(r => r.getDouble(5) >= 0.0 && r.getDouble(5) < 0.72))
  }

  test("real resize kernel: output dims exact, constant image preserved") {
    val png = Images.constPng(64, 48, 200, 100, 50)
    val out = Images.resizePng(png, 32, 24)
    val (w, h, bright) = Images.decodeStats(out)
    assert(w == 32 && h == 24)
    // bilinear resample of a constant image is the same constant
    assert(math.abs(bright - (200 + 100 + 50) / (3.0 * 255.0)) < 1e-12)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash: identical bytes hash identically; edits stay near, scenes far") {
    val scenes = (0L until 12L).map(s => s -> Images.wavePng(s, 96, 72)).toMap
    // determinism + identity
    scenes.foreach { case (s, png) =>
      assert(Images.phash64(png) == Images.phash64(Images.wavePng(s, 96, 72)))
    }
    // a resize and a brightness edit are perceptual near-dups
    scenes.foreach { case (_, png) =>
      val h = Images.phash64(png)
      assert(hamming(h, Images.phash64(Images.resizePng(png, 144, 108))) <= 6)
      assert(hamming(h, Images.phash64(Images.brightenPng(png, 18))) <= 6)
    }
    // distinct scenes are far apart — pairwise, not just on average
    val hs = scenes.toSeq.map { case (s, png) => s -> Images.phash64(png) }
    for ((sa, ha) <- hs; (sb, hb) <- hs if sa < sb)
      assert(hamming(ha, hb) > 10,
        s"scenes $sa/$sb too close: ${hamming(ha, hb)}")
  }

  test("phash operator groups scene variants; near-dup summary is exact") {
    val hashes = Multimodal.phash.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(hashes.nonEmpty)
    // every doc's hash is within the edit radius of its scene's base hash
    val base = hashes.collect { case (id, scene, h) if (id / 40) % 5 <= 2 =>
      scene -> h }.toMap
    hashes.foreach { case (_, scene, h) =>
      assert(hamming(base(scene), h) <= 6) }
    // the band join is COMPLETE for the ≤6 threshold (8 bands of 8 bits:
    // pigeonhole guarantees a shared band through Hamming 7), so the
    // operator's pair count must equal the brute-force all-pairs count
    val hs = hashes.map { case (id, _, h) => (id, h) }
    val expectPairs = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && hamming(ha, hb) <= 6
    } yield 1L).sum
    assert(expectPairs > 0)
    val row = Multimodal.phashNearDup.run(spark, sf0001).collect().head
    assert(row.getLong(0) == expectPairs, s"got ${row.getLong(0)}, want $expectPairs")
  }

  test("audio fingerprint: gain-invariant, deterministic, chords discriminate") {
    val tracks = (0L until 36L).map(s => s -> Audio.chordWav(s, 2048)).toMap
    tracks.foreach { case (s, wav) =>
      val h = Audio.afp64(wav)
      assert(h == Audio.afp64(Audio.chordWav(s, 2048))) // deterministic
      // uniform gain scales every band energy equally: sign bits hold
      assert(hamming(h, Audio.afp64(Audio.gainWav(wav, 0.6))) <= 2)
      assert(hamming(h, Audio.afp64(Audio.gainWav(wav, 0.8))) <= 2)
    }
    // discrimination is statistical, not pairwise-guaranteed: chords
    // sharing 2 of 3 notes legitimately land close
    val hs = tracks.toSeq.map { case (s, w) => Audio.afp64(w) }
    val cross = for (a <- hs; b <- hs if a != b) yield hamming(a, b)
    assert(cross.sum.toDouble / cross.size > 15.0)
  }

  test("audio near-dup operator pair count matches brute force") {
    val hashes = Multimodal.audioFp.run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(hashes.nonEmpty)
    // same-track variants stay within the edit radius
    val base = hashes.collect { case (id, track, h) if (id / 36) % 5 <= 2 =>
      track -> h }.toMap
    hashes.foreach { case (_, track, h) =>
      assert(hamming(base(track), h) <= 2) }
    val hs = hashes.map { case (id, _, h) => (id, h) }
    val expectPairs = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && hamming(ha, hb) <= 6
    } yield 1L).sum
    assert(expectPairs > 0)
    val row = Multimodal.audioFpNearDup.run(spark, sf0001).collect().head
    assert(row.getLong(0) == expectPairs,
      s"got ${row.getLong(0)}, want $expectPairs")
  }
}
