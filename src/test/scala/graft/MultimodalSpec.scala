package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decode pipeline produces features through mapPartitions") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.decodePipeline(spark, docs)
    val n = docs.count()
    assert(feats.count() == n)
    val r = feats.filter(_.doc_id == 0).head()
    assert(Set("png", "jpg", "wav").contains(r.fmt))
    assert(r.byte_len > 0 && r.n_frames == r.byte_len / 256 + 1)
    assert(r.checksum >= 0 && r.checksum < 1000003)
  }

  test("media metadata is deterministic and schema-typed") {
    val m = Multimodal.mediaMeta(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("doc_id", "fmt", "byte_len", "n_frames", "width", "height"))
    val again = Multimodal.mediaMeta(spark, sfDir)
    assert(m.collect().toSeq == again.collect().toSeq)
  }

  test("frame sampling covers every char exactly once per document") {
    val docs = Tables.load(spark, sfDir, "documents")
    val frames = Multimodal.frameSample(spark, sfDir)
    // per doc: frame count = ceil(len/256), frame lengths sum to len
    val byDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), max("n_frames").as("declared"),
        sum("frame_len").as("covered"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
    assert(byDoc.filter(col("nf") =!= col("declared")).count() == 0)
    assert(byDoc.filter(col("covered") =!= col("len")).count() == 0,
      "frame lengths do not cover the payload exactly")
    assert(frames.filter(col("frame_len") <= 0).count() == 0, "empty frame emitted")
  }

  test("ImageIO decode recovers a known-pixel image exactly") {
    // hand-built 2×1 image: pixel (0,0) = RGB(10, 20, 30),
    // pixel (1,0) = RGB(255, 0, 128) — encode via the JDK, decode via
    // the real decoder, expect exact stats and the row-major hash
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (255 << 16) | (0 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.ImageDecoder.decodeImageIO(
      Iterator(Multimodal.ImageRow(7L, bos.toByteArray))).toSeq
    assert(feats.size == 1)
    val f = feats.head
    assert(f.width == 2 && f.height == 1 && f.channels == 3)
    assert(f.sum_r == 265 && f.sum_g == 20 && f.sum_b == 158)
    val px0 = (10 << 16) | (20 << 8) | 30
    val px1 = (255 << 16) | (0 << 8) | 128
    assert(f.pixel_hash == ((0L * 31 + px0) % 1000003 * 31 + px1) % 1000003)
  }

  test("image decode pipeline round-trips synthetic PNGs distributed") {
    val out = Multimodal.imageDecode(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(out.length == n)
    // dimensions follow the doc_id derivation; stats in range
    assert(out.forall { r =>
      val id = r.getLong(0)
      r.getInt(1) == (id % Multimodal.DimWMod + Multimodal.DimWBase).toInt &&
      r.getInt(2) == (id % Multimodal.DimHMod + Multimodal.DimHBase).toInt &&
      r.getInt(3) == 3 &&
      r.getLong(4) <= 255L * r.getInt(1) * r.getInt(2)
    })
    // spot-check one doc against the pixel formula computed directly
    val r0 = out.find(_.getLong(0) == 1L).get
    val (w, h) = (r0.getInt(1), r0.getInt(2))
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w) sr += (1 * 31 + x * 7 + y * 13) % 256
    assert(r0.getLong(4) == sr, s"sum_r ${r0.getLong(4)} != formula $sr")
  }

  test("AudioSystem decode recovers known PCM samples exactly") {
    // hand-built stereo WAV, 3 frames: L = (100, -200, 32767),
    // R = (-32768, 0, 1) — encode via the JDK writer, decode via the
    // real decoder, expect exact format, sums, and interleave hash
    val samples = Array[Int](100, -32768, -200, 0, 32767, 1) // interleaved L/R
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, p) =>
      val u = v & 0xffff
      raw(p * 2) = (u & 0xff).toByte
      raw(p * 2 + 1) = ((u >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, 3L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val feats = Multimodal.AudioDecoder.decodeWav(
      Iterator(Multimodal.AudioRow(7L, bos.toByteArray))).toSeq
    assert(feats.size == 1)
    val f = feats.head
    assert(f.sample_rate == 16000 && f.channels == 2 && f.n_samples == 3)
    assert(f.sum_ch0 == 100L - 200L + 32767L)
    assert(f.sum_ch1 == -32768L + 0L + 1L)
    val expHash = samples.map(_ & 0xffff)
      .foldLeft(0L)((a, u) => (a * 31 + u) % 1000003)
    assert(f.sample_hash == expHash)
  }

  test("audio decode pipeline round-trips synthetic WAVs distributed") {
    val out = Multimodal.audioDecode(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(out.length == n)
    assert(out.forall { r =>
      val id = r.getLong(0)
      r.getInt(1) == Multimodal.AudRateBase * (id % Multimodal.AudRateMod + 1).toInt &&
      r.getInt(2) == (id % Multimodal.AudChMod + 1).toInt &&
      r.getLong(3) == id % Multimodal.AudLenMod + Multimodal.AudLenBase
    })
    // mono docs must leave channel 1 untouched
    assert(out.filter(_.getInt(2) == 1).forall(_.getLong(5) == 0L))
    // spot-check one doc against the sample formula computed directly
    val r1 = out.find(_.getLong(0) == 1L).get
    val (ch, frames) = (r1.getInt(2), r1.getLong(3).toInt)
    var s0 = 0L
    for (i <- 0 until frames) {
      val u = Multimodal.sampleU16(1L, 0, i)
      s0 += (if (u >= 32768) u - 65536 else u)
    }
    assert(r1.getLong(4) == s0, s"sum_ch0 ${r1.getLong(4)} != formula $s0")
    assert(ch == (1 % Multimodal.AudChMod + 1))
  }

  test("m12 audio fingerprint clusters same-tune different-loudness " +
       "docs that byte dedup separates, one cluster per tone group") {
    import spark.implicits._
    // amplitude invariance: docs 0 and 40 share group 0 (same band
    // sequence) at amplitudes 2000 vs 2000+40·300 — raw payload bytes
    // differ, the decoded fingerprint is identical
    val fp = Multimodal.AudioDecoder.decodeFingerprint(Iterator(
      Multimodal.AudioRow(0L, Multimodal.tonePayload(0L)),
      Multimodal.AudioRow(40L, Multimodal.tonePayload(40L)),
      Multimodal.AudioRow(1L, Multimodal.tonePayload(1L)))).toSeq
    assert(!java.util.Arrays.equals(Multimodal.tonePayload(0L),
      Multimodal.tonePayload(40L)), "amplitudes must change the bytes")
    assert(fp(0).fingerprint == fp(1).fingerprint,
      s"same group, different loudness must share a fingerprint: $fp")
    assert(fp(0).fingerprint != fp(2).fingerprint,
      s"different groups must differ: $fp")
    assert(fp.forall(_.n_windows == Multimodal.ToneSegs.toLong))
    // the fingerprint digits are exactly the planted band sequence:
    // the dominant Goertzel bin of a pure period-p integer wave is
    // the bin whose fundamental matches — decoded end to end through
    // the real WAV round-trip
    val want0 = (0 until Multimodal.ToneSegs)
      .map(s => ('0' + Multimodal.toneBand(0L, s)).toChar).mkString
    assert(fp(0).fingerprint == want0,
      s"fingerprint ${fp(0).fingerprint} != planted band sequence $want0")
    // corpus: exactly one cluster per tone group (the iterated-knuth
    // band sequences are collision-free at 40 groups — checked, not
    // hoped), sizes cover every doc, min_doc recovers each group id
    val got = Multimodal.m12AudioFingerprint(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(got.length == Multimodal.ToneGroups, s"clusters: ${got.length}")
    assert(got.map(_.getLong(1)).sum == n, "cluster sizes must cover corpus")
    assert(got.map(_.getLong(2)).sorted.toSeq ==
      (0L until Multimodal.ToneGroups.toLong),
      "min_doc per cluster must be exactly the group ids")
  }

  test("GIF demux recovers frame count, order, and exact pixels") {
    // hand-built 2-frame 3×5 animated GIF (≥ 5 rows — below that the
    // JDK writer's default interlace path corrupts rows, see the
    // Multimodal VidHBase note): frame f pixel (x, y) holds gray
    // 10 + f*100 + x*7 + y*3 — decode must see both frames in write
    // order with exact values
    val gray = Array.tabulate(256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    wr.setOutput(ios); wr.prepareWriteSequence(null)
    val vals = for (f <- 0 until 2) yield {
      val img = new java.awt.image.BufferedImage(3, 5,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 5; x <- 0 until 3)
        img.getRaster.setSample(x, y, 0, 10 + f * 100 + x * 7 + y * 3)
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      for (y <- 0 until 5; x <- 0 until 3) yield 10L + f * 100 + x * 7 + y * 3
    }
    wr.endWriteSequence(); wr.dispose(); ios.close()
    val feats = Multimodal.VideoDecoder.decodeGif(
      Iterator(Multimodal.VideoRow(3L, baos.toByteArray))).toSeq
    assert(feats.size == 1)
    val f = feats.head
    assert(f.n_frames == 2 && f.width == 3 && f.height == 5,
      s"demux shape wrong: $f")
    val flat = vals.flatten
    assert(f.sum_gray == flat.sum, s"pixel sum drifted: $f")
    assert(f.frame_hash == flat.foldLeft(0L)((a, v) => (a * 31 + v) % 1000003),
      "frame/pixel order hash mismatch")
  }

  test("binary payload round-trips the text bytes") {
    val docs = Tables.load(spark, sfDir, "documents").limit(5)
    val back = Multimodal.withMediaColumns(docs)
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("text2"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("text") =!= col("text2"))
    assert(back.count() == 0)
  }

  test("sobel energy on a hand-built step edge equals the closed form") {
    import graft.operators.Multimodal
    // 5x5, red = 0 left of x=2, 255 from x=2: every interior row sees
    // |Gx| = 4*255 at x=1 and x=2, 0 at x=3; Gy = 0 (rows identical)
    // => energy = 3 rows * (1020 + 1020 + 0) = 6120
    val img = new java.awt.image.BufferedImage(5, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 5) {
      val v = if (x >= 2) 255 else 0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.ImageDecoder.decodeSobel(Iterator(
      Multimodal.ImageRow(7L, bos.toByteArray))).next()
    assert(out.width == 5 && out.height == 5 && out.interior_px == 9L)
    assert(out.edge_energy == 6120L, s"step-edge energy ${out.edge_energy}")
    assert(out.mean_edge == 680.0)
    // and a constant image has zero gradient everywhere
    val flat = new java.awt.image.BufferedImage(6, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 6) flat.setRGB(x, y, 0x555555)
    val b2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", b2)
    val out2 = Multimodal.ImageDecoder.decodeSobel(Iterator(
      Multimodal.ImageRow(8L, b2.toByteArray))).next()
    assert(out2.edge_energy == 0L, s"flat image energy ${out2.edge_energy}")
  }

  test("goertzel energies equal an independent complex-DFT evaluation") {
    import graft.operators.Multimodal
    // Goertzel power at ω must equal |Σ x·e^{-jωi}|² — check the
    // integer recurrence against direct complex arithmetic (an
    // INDEPENDENT formulation, not the recurrence replayed) for the
    // three ω with 2cos(ω) = 1, 0, -1
    val res = Multimodal.audioFeatures(spark, sfDir)
      .filter(col("doc_id") < 8).collect()
    assert(res.length == 8)
    res.foreach { r =>
      val id = r.getLong(0); val n = r.getLong(1).toInt
      val omegas = Seq(math.Pi / 3, math.Pi / 2, 2 * math.Pi / 3)
      val expected = omegas.map { w =>
        var (re, im) = (0.0, 0.0)
        (0 until n).foreach { i =>
          val u = Multimodal.sampleU16(id, 0, i)
          val v = (if (u >= 32768) u - 65536 else u).toDouble
          re += v * math.cos(w * i); im -= v * math.sin(w * i)
        }
        re * re + im * im
      }
      Seq(r.getLong(2), r.getLong(3), r.getLong(4)).zip(expected)
        .zipWithIndex.foreach { case ((got, exp), k) =>
          val rel = math.abs(got - exp) / math.max(1.0, math.abs(exp))
          assert(rel < 1e-6,
            s"doc $id bin $k: goertzel $got vs DFT $exp (rel $rel)")
        }
    }
  }

  test("robust decode survives truncated and garbage payloads, " +
       "recovering exactly the uncorrupted set") {
    import graft.operators.Multimodal
    val rows = Multimodal.imageDecodeRobust(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.get(4)))))
      .toMap
    assert(rows.size == 500)
    rows.foreach { case (id, (valid, hash)) =>
      if (id % Multimodal.CorruptEvery == 0)
        assert(!valid && hash.isEmpty, s"corrupted doc $id decoded: $hash")
      else assert(valid && hash.nonEmpty, s"good doc $id rejected")
    }
    // direct decoder-level checks: truncated PNG (throws inside
    // ImageIO) and garbage bytes (read returns null) both fold to
    // invalid rows; a valid payload still decodes
    val good = Multimodal.pngPayload(7L, 5, 4)
    val out = Multimodal.ImageDecoder.decodeRobust(Iterator(
      Multimodal.ImageRow(1L, good),
      Multimodal.ImageRow(2L, good.take(8)),
      Multimodal.ImageRow(3L, Array.fill[Byte](64)(0x5A)))).toSeq
    assert(out(0).is_valid && out(0).width.contains(5))
    assert(!out(1).is_valid && !out(2).is_valid)
  }

  test("image dedup finds exactly the mod-256 twins through the real " +
       "PNG decode path") {
    import graft.operators.Multimodal
    // the synthetic pixel forms are linear mod 256 and both dims
    // divide 256, so doc id and id+256 carry IDENTICAL rasters inside
    // DIFFERENT PNG byte streams — content dedup must find exactly
    // those pairs (and nothing else) on the 500-doc corpus
    val rows = Multimodal.imageDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    assert(rows.size == 500)
    rows.foreach { case (id, (canon, nCopies, isDup)) =>
      if (id >= 256)
        assert((canon, nCopies, isDup) == ((id - 256, 2L, true)),
          s"doc $id: ($canon, $nCopies, $isDup)")
      else {
        val hasTwin = id + 256 < 500
        assert((canon, nCopies, isDup) ==
          ((id, if (hasTwin) 2L else 1L, false)),
          s"doc $id: ($canon, $nCopies, $isDup)")
      }
    }
  }

  test("audio segmentation finds planted loud regions through the " +
       "real WAV decode, with exact segment structure") {
    // silence ∥ loud ∥ silence ∥ loud ∥ silence: 10 windows of 16
    // samples — windows 2,3 and 6,7 carry ±20000 square waves, the
    // rest are zeros. Mean window energy = 4·E_loud/10 < E_loud, so
    // exactly the 4 loud windows are active, merging into 2 segments.
    val w = Multimodal.SegWindow
    val frames = 10 * w
    val raw = new Array[Byte](frames * 2)
    def loudWindow(wi: Int): Boolean = wi == 2 || wi == 3 || wi == 6 || wi == 7
    for (i <- 0 until frames) {
      val v = if (loudWindow(i / w)) { if (i % 2 == 0) 20000 else -20000 }
        else 0
      val u = if (v < 0) v + 65536 else v
      raw(i * 2) = (u & 0xff).toByte
      raw(i * 2 + 1) = ((u >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.SegmentDecoder.decodeSegments(
      Iterator(Multimodal.AudioRow(7L, bos.toByteArray))).toSeq
    assert(out.size == 1)
    val s = out.head
    assert(s.n_samples == frames && s.n_windows == 10 &&
      s.n_active == 4 && s.n_segments == 2 && s.active_ratio == 0.4,
      s.toString)
    // degenerate flat payload: no window beats the (equal) mean —
    // zero active, zero segments, not a divide-by-zero
    val flat = new Array[Byte](4 * w * 2)
    java.util.Arrays.fill(flat, 1.toByte)
    val ais2 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(flat), fmt, (4L * w))
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais2,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos2)
    val f = Multimodal.SegmentDecoder.decodeSegments(
      Iterator(Multimodal.AudioRow(8L, bos2.toByteArray))).toSeq.head
    assert(f.n_active == 0 && f.n_segments == 0 && f.active_ratio == 0.0,
      f.toString)
  }
}
