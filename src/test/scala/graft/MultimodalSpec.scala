package graft

import java.nio.charset.StandardCharsets.US_ASCII

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq((1L, "abc"), (2L, ""), (3L, "zz")).toDF("doc_id", "text")

  test("media table: opaque binary + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType.typeName === "binary")
    val meta = m.where($"doc_id" === 1).select("meta.mime", "meta.n_bytes").collect()(0)
    assert(meta.getString(0) === "image/x-portable-pixmap")
    // "abc" → sum 294 → 54×22 → header "P6\n54 22\n255\n" (13 B) + 3 B payload
    assert(meta.getLong(1) === 16L)
  }

  test("decode parses the real PPM binary header; batch plumbing intact") {
    val f = Multimodal.mediaFeatures(spark, docs, batchSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toList
    // byte_sum('abc') = 97+98+99 = 294 → w = 16+294%64 = 54, h = 16+294%48 = 22
    // empty payload → sum 0 → 16×16; 'zz' → 244 → 68×20
    assert(f === List(
      (1L, 3L, 294L, 54L, 22L),
      (2L, 0L, 0L, 16L, 16L),
      (3L, 2L, 244L, 68L, 20L)))
  }

  test("encode→parse round trip recovers header dims and payload offset") {
    val payload = "some pixel-ish bytes ÿ".getBytes(US_ASCII)
    val ppm = Multimodal.encodePpm(payload)
    val Some((w, h, off)) = Multimodal.parsePpmHeader(ppm)
    assert(ppm.length - off === payload.length)
    assert(w >= 16 && w < 80 && h >= 16 && h < 64)
    assert(ppm.slice(off, ppm.length).toSeq === payload.toSeq)
  }

  test("parser handles PPM comments per the grammar") {
    val bytes = "P6\n# a comment line\n2 3\n255\nXYZXYZ".getBytes(US_ASCII)
    assert(Multimodal.parsePpmHeader(bytes) === Some((2L, 3L, 28)))
  }

  test("frame sampling matches a text-side brute force on real testdata") {
    val real = graft.sources.Tables(spark, testdataDir, "documents")
    val texts = real.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes(US_ASCII)
      val n = bytes.length / 64
      if (n == 0) None
      else {
        val kept = (0 until n).filter(_ % 4 == 0)
        val sum = kept.map { f =>
          bytes.slice(f * 64, f * 64 + 64).map(_ & 0xff).map(_.toLong).sum
        }.sum
        Some((id, n.toLong, kept.length.toLong, sum))
      }
    }.sortBy(_._1).toList
    val got = Multimodal.frameSample(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got === expect)
    assert(got.nonEmpty, "no document held a whole frame — vacuous")
    // stride arithmetic: kept = ceil(n_frames / 4)
    assert(got.forall { case (_, n, kept, _) => kept === (n + 3) / 4 })
  }

  test("frame sampler degrades to whole-blob framing on a malformed header") {
    // 130 junk bytes, no PPM magic: offset 0, 2 whole frames, frame 0 kept
    val junk = Array.fill[Byte](130)(65)
    assert(Multimodal.sampleFrames(junk, 64, 4) === Some((2L, 1L, 64L * 65L)))
    // fewer bytes than one frame -> dropped entirely
    assert(Multimodal.sampleFrames(Array.fill[Byte](63)(1), 64, 4) === None)
  }

  test("malformed payloads yield sentinel dims, never a stage failure") {
    val bad = Seq(
      7L -> "not a ppm".getBytes(US_ASCII),     // wrong magic
      8L -> "P6\n12".getBytes(US_ASCII),        // truncated header
      9L -> "P6\n4 4\n0\nxx".getBytes(US_ASCII), // maxval out of range
      10L -> Array.empty[Byte])
    val out = Multimodal.decodeBatch(bad)
    assert(out.map(m => (m.doc_id, m.fake_width, m.fake_height)) ===
      Seq((7L, -1L, -1L), (8L, -1L, -1L), (9L, -1L, -1L), (10L, -1L, -1L)))
    // stats still computed over the whole blob so nothing is silently lost
    assert(out.head.n_bytes === 9L)
  }

  test("wav encode→parse round trip: features match the per-byte formula") {
    val text = "abc xyz"
    val bytes = text.getBytes(US_ASCII)
    val wav = Multimodal.encodeWav(bytes)
    val Some((sr, off, n)) = Multimodal.parseWav(wav)
    assert(sr === 8000L + bytes.map(_ & 0xff).sum % 4000)
    assert(off === 44 && n === text.length)
    val f = Multimodal.audioFeaturesOf(1L, wav)
    val samples = bytes.map(b => ((b & 0xff) - 128) * 256L)
    assert(f.energy === samples.map(s => s * s).sum)
    assert(f.peak_abs === samples.map(math.abs).max)
    assert(f.duration_micros === n.toLong * 1000000L / sr)
  }

  test("wav parser walks unknown RIFF chunks (LIST before data), rejects non-PCM") {
    val payload = "hi".getBytes(US_ASCII)
    val plain = Multimodal.encodeWav(payload)
    // splice a LIST chunk between fmt and data — real WAVs carry these
    val listChunk = "LIST".getBytes(US_ASCII) ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes(US_ASCII)
    val spliced = plain.slice(0, 36) ++ listChunk ++ plain.drop(36)
    // RIFF size field is now stale, but chunk walking must still find data
    val direct = Multimodal.audioFeaturesOf(5L, plain)
    val walked = Multimodal.audioFeaturesOf(5L, spliced)
    assert(walked === direct.copy(doc_id = 5L))
    // flip the fmt audioFormat to 2 (ADPCM): must become the sentinel row
    val nonPcm = plain.clone(); nonPcm(20) = 2
    assert(Multimodal.audioFeaturesOf(6L, nonPcm).sample_rate === -1L)
    // truncated garbage: sentinel, no exception
    assert(Multimodal.audioFeaturesOf(7L, "RIFFxx".getBytes(US_ASCII))
      .sample_rate === -1L)
  }

  test("q219: AudioSystem decode ≡ the hand-rolled walker on every corpus file") {
    // the two kernels share one feature contract; on every well-formed
    // encoded doc they must agree field for field (the shared-oracle
    // gate, pinned here without Spark in the loop)
    val docs = graft.sources.Tables(spark, testdataDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val wav = Multimodal.encodeWav(r.getString(1).getBytes(US_ASCII))
      val hand = Multimodal.audioFeaturesOf(r.getLong(0), wav)
      val lib = Multimodal.decodeWavAudioSystem(r.getLong(0), wav)
      assert(lib === hand, s"doc ${r.getLong(0)}: library ≠ walker")
    }
    // poison payloads: sentinel, never an exception — garbage bytes,
    // a truncated header, and an off-contract format (stereo flag)
    assert(Multimodal.decodeWavAudioSystem(1L,
      "not audio at all".getBytes(US_ASCII)).sample_rate === -1L)
    val wav = Multimodal.encodeWav("hi".getBytes(US_ASCII))
    assert(Multimodal.decodeWavAudioSystem(2L,
      wav.take(30)).sample_rate === -1L)
    val stereo = wav.clone(); stereo(22) = 2 // channels = 2 in fmt
    assert(Multimodal.decodeWavAudioSystem(3L, stereo).sample_rate === -1L)
    // the distributed path carries the sentinel rule too
    import spark.implicits._
    val poisoned = Seq((1L, "good text"), (2L, "also fine")).toDF("doc_id", "text")
    val out = Multimodal.audioFeaturesLib(spark, poisoned).collect()
    assert(out.length === 2 && out.forall(_.getLong(1) > 0))
  }

  test("q128 audio features on real testdata ≡ text-side brute force") {
    val real = graft.sources.Tables(spark, testdataDir, "documents")
    val got = Multimodal.audioFeatures(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val texts = real.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    got.foreach { case (id, sr, n, dur, energy, peak) =>
      val bs = texts(id).getBytes(US_ASCII).map(_ & 0xff)
      val ss = bs.map(b => (b - 128) * 256L)
      assert(sr === 8000L + bs.sum % 4000)
      assert(n === bs.length.toLong)
      assert(dur === n * 1000000L / sr)
      assert(energy === ss.map(s => s * s).sum)
      assert(peak === (if (ss.isEmpty) 0L else ss.map(math.abs).max))
    }
  }

  test("q203: the encoded blob is a genuine PNG and ImageIO round-trips it exactly") {
    val payload = "hello png".getBytes(US_ASCII)
    val png = Multimodal.encodePng(payload)
    // real PNG container: 8-byte signature, IHDR first chunk
    assert(png.take(8).toSeq ===
      Seq[Int](0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    assert(new String(png.slice(12, 16), US_ASCII) === "IHDR")
    val Seq(f) = Multimodal.decodePngBatch(Seq((1L, png)))
    val sum = payload.map(_ & 0xff).sum
    val (w, h) = (8 + sum % 24, 8 + sum % 16)
    assert(f.width === w.toLong && f.height === h.toLong)
    // exact per-channel sums from the pixel formulas (lossless PNG)
    val px = (0 until w * h).map { i =>
      val r = payload(i % payload.length) & 0xff
      val g = (i * 31 + 7) % 256
      (r, g, (r + g) % 256)
    }
    assert(f.r_sum === px.map(_._1.toLong).sum)
    assert(f.g_sum === px.map(_._2.toLong).sum)
    assert(f.b_sum === px.map(_._3.toLong).sum)
  }

  test("q203: malformed PNG payloads degrade to the sentinel row, no stage failure") {
    val garbage = "not a png at all".getBytes(US_ASCII)
    val truncated = Multimodal.encodePng("abc".getBytes(US_ASCII)).take(20)
    val good = Multimodal.encodePng("ok".getBytes(US_ASCII))
    // fuzzed IHDR: valid signature, width field zeroed — ImageIO's PNG
    // reader throws (often a RuntimeException, not IOException) on
    // such headers; the kernel must degrade, not fail the stage
    val fuzzed = Multimodal.encodePng("ok".getBytes(US_ASCII)).clone()
    fuzzed(16) = 0; fuzzed(17) = 0; fuzzed(18) = 0; fuzzed(19) = 0
    val out = Multimodal.decodePngBatch(
      Seq((1L, garbage), (2L, truncated), (3L, good), (4L, fuzzed)))
    assert(out(0).width === -1L && out(0).height === -1L)
    assert(out(1).width === -1L)
    assert(out(2).width > 0L && out(2).height > 0L)
    assert(out(3).width === -1L, "fuzzed IHDR must yield the sentinel")
    // and through the full distributed path: a poisoned corpus still
    // completes with sentinels in place
    val docs = Seq((1L, "fine document"), (2L, "also fine"))
      .toDF("doc_id", "text")
    assert(Multimodal.pngFeatures(spark, docs).count() === 2L)
  }

  test("jpeg: genuine JFIF blob, per-JVM deterministic decode, poison sentinels") {
    val payload = "hello jpeg".getBytes(US_ASCII)
    val jpg = Multimodal.encodeJpeg(payload)
    // real JPEG container: SOI marker FFD8, EOI trailer FFD9
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8)
    assert((jpg(jpg.length - 2) & 0xff) === 0xff &&
      (jpg(jpg.length - 1) & 0xff) === 0xd9)
    // dimensions survive the lossy round trip EXACTLY
    val Seq(f) = Multimodal.decodePngBatch(Seq((1L, jpg)))
    val sum = payload.map(_ & 0xff).sum
    assert(f.width === (8 + sum % 24).toLong && f.height === (8 + sum % 16).toLong)
    // per-JVM determinism: encode+decode twice → bit-identical features
    val again = Multimodal.decodePngBatch(
      Seq((1L, Multimodal.encodeJpeg(payload)))).head
    assert(again === f, "JPEG decode is not deterministic within this JVM")
    // poison payloads: garbage, truncation, fuzzed SOF — sentinel rows,
    // never a stage failure (the q31/q128/q203 contract)
    val truncated = jpg.take(jpg.length / 3)
    val garbage = "not a jpeg".getBytes(US_ASCII)
    val out = Multimodal.decodePngBatch(
      Seq((1L, garbage), (2L, truncated), (3L, jpg)))
    assert(out(0).width === -1L)
    assert(out(1).width === -1L, "truncated JPEG must yield the sentinel")
    assert(out(2).width > 0L)
    // and the distributed path over a real corpus completes
    val real = graft.sources.Tables(spark, testdataDir, "documents").limit(64)
    assert(Multimodal.jpegFeatures(spark, real).count() === 64L)
  }

  test("jpeg vs png feature agreement: same dims, channel sums within the lossy budget") {
    // the q219 library ≡ walker pattern applied ACROSS formats: the
    // same synthesized image through the lossless and lossy codecs
    // must agree exactly on dimensions and closely on channel mass —
    // JPEG's DCT+quantization error is a few percent of full scale,
    // so a 5%-of-full-scale budget catches any real defect (channel
    // swap, stride bug, wrong colorspace) while tolerating the codec
    val real = graft.sources.Tables(spark, testdataDir, "documents").limit(128)
    val png = Multimodal.pngFeatures(spark, real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val jpg = Multimodal.jpegFeatures(spark, real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(png.keySet === jpg.keySet && png.nonEmpty)
    png.foreach { case (id, (pw, ph, pr, pg, pb)) =>
      val (jw, jh, jr, jg, jb) = jpg(id)
      assert(pw === jw && ph === jh, s"doc $id: dims diverge under JPEG")
      val full = pw * ph * 255.0
      for ((a, b, c) <- Seq((pr, jr, "r"), (pg, jg, "g"), (pb, jb, "b")))
        assert(math.abs(a - b) / full <= 0.05,
          s"doc $id channel $c: |$a - $b| exceeds 5% of full scale")
    }
  }

  test("q203 png features on real testdata ≡ text-side brute force") {
    val real = graft.sources.Tables(spark, testdataDir, "documents")
    val got = Multimodal.pngFeatures(spark, real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val texts = real.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    got.foreach { case (id, w, h, rs, gs, bs) =>
      val bytes = texts(id).getBytes(US_ASCII)
      val sum = bytes.map(_ & 0xff).map(_.toLong).sum
      assert(w === 8 + sum % 24)
      assert(h === 8 + sum % 16)
      val px = (0 until (w * h).toInt).map { i =>
        val r = if (bytes.isEmpty) 0 else bytes((i % bytes.length).toInt) & 0xff
        val g = (i * 31 + 7) % 256
        (r.toLong, g.toLong, ((r + g) % 256).toLong)
      }
      assert(rs === px.map(_._1).sum)
      assert(gs === px.map(_._2).sum)
      assert(bs === px.map(_._3).sum)
    }
  }
}
