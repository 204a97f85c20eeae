package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** RIFF/WAV parser correctness: round-trip vs the synthesizer, stereo
  * frame accounting, chunk-walk robustness (extra + odd-sized chunks),
  * and the guaranteed stub fallback on malformed bytes. */
class MultimodalSpec extends SparkSpec {

  test("parseWav round-trips the synthesized container exactly") {
    val samples = Array[Short](100, -200, 32000, -32000, 0, 7)
    val wav = Multimodal.wavBytes(16000, 1, samples)
    val w = Multimodal.parseWav(wav).get
    assert(w.numChannels == 1 && w.sampleRate == 16000 && w.bitsPerSample == 16)
    assert(w.nFrames == 6L)
    assert(w.peak == 32000)
  }

  test("stereo: frames counted per blockAlign, peak across channels") {
    // 2 channels → 3 frames from 6 samples; peak is channel-agnostic
    val samples = Array[Short](10, -500, 300, 20, -1, 2)
    val w = Multimodal.parseWav(Multimodal.wavBytes(44100, 2, samples)).get
    assert(w.numChannels == 2 && w.sampleRate == 44100)
    assert(w.nFrames == 3L)
    assert(w.peak == 500)
  }

  test("parser skips unknown and odd-sized chunks before data") {
    val base = Multimodal.wavBytes(8000, 1, Array[Short](5, -9))
    // splice an odd-sized junk chunk between fmt and data
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // size 3 + pad
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix the RIFF size field
    val buf = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, spliced.length - 8)
    val w = Multimodal.parseWav(spliced).get
    assert(w.sampleRate == 8000 && w.nFrames == 2L && w.peak == 9)
  }

  test("malformed payloads fall back to the deterministic stub") {
    for (bad <- Seq(
        "not audio at all".getBytes("US-ASCII"),
        Array.empty[Byte],
        Multimodal.wavBytes(8000, 1, Array[Short](1, 2)).take(30))) { // truncated
      assert(Multimodal.parseWav(bad).isEmpty)
      assert(Multimodal.audioDecode(7L, bad) == Multimodal.fakeAudioDecode(7L, bad))
    }
  }

  test("parsePng round-trips, verifies the IHDR CRC, rejects corruption") {
    import graft.ops.Multimodal._
    val png = pngBytes(640, 480, idatLen = 20)
    assert(parsePng(png).contains((640, 480, 8)))
    // flip one IHDR data byte: the CRC check must reject, not misread
    val corrupted = png.clone(); corrupted(17) = (corrupted(17) ^ 0x01).toByte
    assert(parsePng(corrupted).isEmpty, "corrupted IHDR must fail the CRC")
    // truncations and wrong signature never throw
    assert(parsePng(png.take(20)).isEmpty)
    assert(parsePng(Array.empty[Byte]).isEmpty)
    val badSig = png.clone(); badSig(0) = 'B'.toByte
    assert(parsePng(badSig).isEmpty)
    // a PNG payload routes through the real parser in imageDecode
    val meta = imageDecode(7L, png)
    assert(meta.width == 640 && meta.height == 480 && meta.n_frames == 1)
    assert(meta.header_hex == "89504e470d0a1a0a")
  }

  test("parseJpeg walks markers to SOF, rejects malformed inputs") {
    import graft.ops.Multimodal._
    val jpg = jpegBytes(1920, 1080, comLen = 11)
    assert(jpg.length == 45 + 11)
    assert(parseJpeg(jpg).contains((1920, 1080, 3)))
    // truncation mid-segment, empty, and wrong signature never throw
    assert(parseJpeg(jpg.take(30)).isEmpty)
    assert(parseJpeg(Array.empty[Byte]).isEmpty)
    val badSig = jpg.clone(); badSig(1) = 0x00
    assert(parseJpeg(badSig).isEmpty)
    // a segment whose declared length runs past the buffer is rejected
    val badLen = jpg.clone(); badLen(4) = 0x7f // APP0 length high byte
    assert(parseJpeg(badLen).isEmpty)
    // SOS/EOI before any SOF → None (no frame header to trust)
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(parseJpeg(noSof).isEmpty)
    // a JPEG payload routes through the real parser in imageDecode
    val meta = imageDecode(9L, jpg)
    assert(meta.width == 1920 && meta.height == 1080 && meta.n_frames == 1)
    assert(meta.header_hex == "ffd8ffe000104a46")
  }

  test("parseBmp round-trips the synthesized container exactly") {
    val bmp = Multimodal.bmpBytes(17, 9, 0x7f.toByte) // odd width exercises row padding
    val (w, h, bpp) = Multimodal.parseBmp(bmp).get
    assert(w == 17 && h == 9 && bpp == 24)
    assert(bmp.length == 54 + ((3 * 17 + 3) / 4) * 4 * 9)
  }

  test("parseBmp rejects malformed payloads; imageDecode falls back to the stub") {
    val truncated = Multimodal.bmpBytes(8, 8, 0).take(60) // header ok, pixels missing
    for (bad <- Seq("BMnot really a bitmap at all".getBytes("US-ASCII"),
        Array.empty[Byte], truncated)) {
      assert(Multimodal.parseBmp(bad).isEmpty)
      assert(Multimodal.imageDecode(3L, bad) == Multimodal.fakeDecode(3L, bad))
    }
  }

  test("negative-height (top-down) BMP reports magnitude height") {
    val bmp = Multimodal.bmpBytes(10, 4, 0)
    java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -4)
    assert(Multimodal.parseBmp(bmp).get == ((10, 4, 24)))
  }

  test("adversarial containers are rejected, never thrown on") {
    // RIFF/WAVE with a chunk declaring size near Int.MaxValue: the
    // off+8+size truncation guard must compare as Long, not wrap
    val wavBomb = Multimodal.wavBytes(8000, 1, Array[Short](1, 2))
    java.nio.ByteBuffer.wrap(wavBomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 4) // fmt chunk size
    assert(Multimodal.parseWav(wavBomb).isEmpty)
    val aviBomb = Multimodal.aviBytes(10, 320, 240)
    java.nio.ByteBuffer.wrap(aviBomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 4) // LIST chunk size
    assert(Multimodal.parseAvi(aviBomb).isEmpty)
    // BMP height Int.MinValue (abs is still negative) and billboard
    // dims on a truncated payload must both fall back, not parse
    val bmpMin = Multimodal.bmpBytes(4, 4, 0)
    java.nio.ByteBuffer.wrap(bmpMin).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    assert(Multimodal.parseBmp(bmpMin).isEmpty)
    val bmpHuge = Multimodal.bmpBytes(4, 4, 0)
    java.nio.ByteBuffer.wrap(bmpHuge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, Int.MaxValue).putInt(22, Int.MaxValue).putShort(28, -1)
    assert(Multimodal.parseBmp(bmpHuge).isEmpty)
  }

  test("parseAvi round-trips the synthesized header exactly") {
    assert(Multimodal.parseAvi(Multimodal.aviBytes(75, 640, 480)).get == ((75, 640, 480)))
  }

  test("parseAvi rejects malformed containers; imageDecode stubs them") {
    val truncated = Multimodal.aviBytes(10, 320, 240).take(40)
    val wavNotAvi = Multimodal.wavBytes(8000, 1, Array[Short](1, 2)) // RIFF but WAVE
    for (bad <- Seq(truncated, wavNotAvi, "RIFFxxxx".getBytes("US-ASCII"))) {
      assert(Multimodal.parseAvi(bad).isEmpty)
    }
    val m = Multimodal.imageDecode(5L, truncated)
    assert(m == Multimodal.fakeDecode(5L, truncated))
  }

  test("decodeAviFrames round-trips movi payloads; malformed frames fail") {
    def pix(f: Int, x: Int, y: Int) = (f * 50 + x * 3 + y * 7) % 256
    val b = Multimodal.aviBytesMovi(9, 5, 3, pix) // odd frame size -> RIFF pad
    val (w, h, frames) = Multimodal.decodeAviFrames(b).get
    assert(w == 9 && h == 5 && frames.length == 3)
    for (f <- 0 until 3; y <- 0 until 5; x <- 0 until 9)
      assert(frames(f)(y * 9 + x) == pix(f, x, y), s"pixel ($f,$x,$y)")
    // header-only AVI (no movi) and frame-count mismatch both fail
    assert(Multimodal.decodeAviFrames(Multimodal.aviBytes(3, 9, 5)).isEmpty)
    val lying = Multimodal.aviBytesMovi(9, 5, 2, pix)
    // patch the avih totalFrames to disagree with the movi chunk count
    val buf = java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(32 + 16, 7) // avih data starts at 32; totalFrames at +16
    assert(Multimodal.decodeAviFrames(lying).isEmpty)
  }

  test("aviNearDupPairs: planted re-renders pair with their source, slot quota holds") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val corpus = Multimodal.synthAviPixelCorpus(spark, base, "doc_id")
      .unionByName(Multimodal.synthAviShiftedCorpus(spark,
        base.filter(col("doc_id") % 4 === 0), "doc_id", 10000L, 1))
    val pairs = Multimodal.aviNearDupPairs(spark, corpus, "doc_id", "payload",
        maxFrames = 4, maxHamming = 2, minMatch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted (base, base+10000) re-render must surface
    val planted = (0L until 40L by 4).map(id => (id, id + 10000L)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(got),
      s"missing planted re-render pairs: ${planted.diff(got)}")
    // matched-slot counts respect the quota bounds
    assert(pairs.forall(p => p._3 >= 3 && p._3 <= 4))
    // exactness: a brute-force per-slot Hamming check over the hashes
    // agrees on every reported pair
    val hs = Multimodal.aviFrameAHash(spark, corpus, "doc_id", "payload", 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        Seq(r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    pairs.foreach { case (a, b, n) =>
      val m = (0 until 4).count { t =>
        hs((a, t)).zip(hs((b, t)))
          .map { case (x, y) => Integer.bitCount(x ^ y) }.sum <= 2
      }
      assert(m.toLong == n, s"pair ($a,$b): reported $n matched slots, brute $m")
    }
  }

  test("aviClipNearDupPairs finds re-cut variants the aligned matcher provably misses") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    // clips only for nf ∈ {4, 5} (doc_id % 5 <= 1): the 4-slot grids
    // of base and shifted video overlap in exactly 3 frames
    val clipped = base.filter(col("doc_id") % 5 <= 1)
    val corpus = Multimodal.synthAviMotionCorpus(spark, base, "doc_id")
      .unionByName(Multimodal.synthAviMotionCorpus(spark, clipped, "doc_id", 20000L, 1))
    val plantedIds = clipped.select("doc_id").collect().map(_.getLong(0))
    val planted = plantedIds.map(id => (id, id + 20000L)).toSet
    val clipPairs = Multimodal.aviClipNearDupPairs(spark, corpus, "doc_id", "payload",
        maxFrames = 4, maxHamming = 0, minMatch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(clipPairs),
      s"slot-free matcher missed planted clips: ${planted.diff(clipPairs)}")
    // the slot-ALIGNED matcher cannot see a single planted pair: frame
    // content matches only across different slots
    val aligned = Multimodal.aviNearDupPairs(spark, corpus, "doc_id", "payload",
        maxFrames = 4, maxHamming = 0, minMatch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.intersect(aligned).isEmpty,
      s"aligned matcher should miss all re-cut pairs: ${planted.intersect(aligned)}")
  }

  test("imageDecode dispatches by container: BMP, AVI, stub") {
    val bmp = Multimodal.imageDecode(1L, Multimodal.bmpBytes(20, 10, 0))
    assert(bmp.width == 20 && bmp.height == 10 && bmp.n_frames == 1)
    val avi = Multimodal.imageDecode(2L, Multimodal.aviBytes(30, 640, 360))
    assert(avi.width == 640 && avi.height == 360 && avi.n_frames == 30)
  }

  test("audioFeats over a synthesized WAV corpus matches the analytic contract") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.audioFeats(spark,
      Multimodal.synthWavCorpus(spark, docs, "doc_id"), "doc_id", "payload")
    val bad = feats.filter(
      col("n_samples") =!= (lit(100) + col("doc_id") % 50) ||
      col("sample_rate") =!= (lit(8000) * (lit(1) + col("doc_id") % 3)).cast("int") ||
      col("peak") =!= ((col("doc_id") * 997) % 32768).cast("int")).count()
    assert(bad == 0)
    assert(feats.count() == docs.count())
  }

  test("parseGif round-trips the synthesized container exactly") {
    for (frames <- Seq(1, 2, 4, 7); (w, h) <- Seq((1, 1), (16, 215), (640, 480))) {
      val b = Multimodal.gifBytes(w, h, frames)
      assert(Multimodal.parseGif(b).contains((frames, w, h)),
        s"($w x $h x $frames)")
      // analytic length contract the oracle leans on
      val expect = 14 + (0 until frames).map(f => 22 + f % 5).sum
      assert(b.length == expect, s"byte_len $frames: ${b.length} vs $expect")
    }
  }

  test("parseGif rejects malformed containers; imageDecode dispatches GIF") {
    val good = Multimodal.gifBytes(20, 30, 2)
    assert(Multimodal.parseGif(good).contains((2, 20, 30)))
    // truncations anywhere must parse to None, never throw
    (1 until good.length).foreach { cut =>
      assert(Multimodal.parseGif(good.take(cut)).isEmpty, s"cut=$cut")
    }
    assert(Multimodal.parseGif("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseGif(Array.empty[Byte]).isEmpty)
    // frameless (header straight to trailer) is malformed by contract
    assert(Multimodal.parseGif(good.take(13) :+ 0x3b.toByte).isEmpty)
    // unknown block type aborts
    val bad = good.clone(); bad(13) = 0x55.toByte
    assert(Multimodal.parseGif(bad).isEmpty)
    // dispatch: the GIF branch feeds MediaMeta with the frame count
    val m = Multimodal.imageDecode(7L, good)
    assert((m.width, m.height, m.n_frames) == ((20, 30, 2)))
    assert(m.header_hex.startsWith("474946383961"))
  }

  test("decodePngPixels round-trips a real deflated grayscale image") {
    val png = Multimodal.pngBytesPixels(5, 3, (x, y) => 10 * y + x)
    val (w, h, sum, mn, mx) = Multimodal.decodePngPixels(png).get
    // pixels: rows (0..4), (10..14), (20..24) → sum 3·(0+..+4) + 15·(0+10+20)
    assert((w, h) == ((5, 3)))
    assert(sum == (0 to 4).sum * 3 + 5 * (10 + 20))
    assert(mn == 0 && mx == 24)
  }

  test("decodePngPixels rejects corruption instead of misreading") {
    val png = Multimodal.pngBytesPixels(8, 8, (x, y) => x ^ y)
    assert(Multimodal.decodePngPixels(png).isDefined)
    // flip one IDAT payload byte → chunk CRC must catch it
    val idatData = 33 + 8 + 2 // first chunk after IHDR: len+type, skip into data
    val bad = png.clone(); bad(idatData) = (bad(idatData) ^ 0x41).toByte
    assert(Multimodal.decodePngPixels(bad).isEmpty)
    // truncation anywhere in the chunk stream
    assert(Multimodal.decodePngPixels(png.take(png.length - 7)).isEmpty)
    // declared dimensions must match the inflated payload: lie about h
    val lied = png.clone()
    val bb = java.nio.ByteBuffer.wrap(lied); bb.putInt(20, 9) // h 8→9
    val crc = new java.util.zip.CRC32; crc.update(lied, 12, 17)
    bb.putInt(29, crc.getValue.toInt) // re-sign IHDR so only the LIE differs
    assert(Multimodal.decodePngPixels(lied).isEmpty)
  }

  test("wavSampleStats: exact energy and zero-crossings by hand") {
    val samples = Array[Short](100, -50, -2, 3, 0, -1)
    val wav = Multimodal.wavBytes(8000, 1, samples)
    val (n, energy, zc) = Multimodal.wavSampleStats(wav).get
    assert(n == 6L)
    assert(energy == 100L * 100 + 50 * 50 + 2 * 2 + 3 * 3 + 0 + 1)
    // sign runs: + | - - | + + (0 counts non-negative) | - → 3 crossings
    assert(zc == 3L)
    // stereo and truncated payloads refuse
    assert(Multimodal.wavSampleStats(
      Multimodal.wavBytes(8000, 2, samples)).isEmpty)
    assert(Multimodal.wavSampleStats(wav.take(wav.length - 3)).isEmpty)
  }

  test("aHashBands: bits are strict above-mean on the 8x8 grid, packed per band") {
    // 8x8 image, pixel = x (column index): row-constant gradient.
    // mean = 3.5 ⇒ bits set exactly where x >= 4, in every row.
    val w = 8; val h = 8
    val px = Array.tabulate(w * h)(idx => idx % w)
    val bands = Multimodal.aHashBands(w, h, px)
    // per 8-bit row the pattern is 0b11110000 (bits 4-7 of each row)
    val expectRow = (4 to 7).map(1 << _).sum // 0xF0
    assert(bands.toSeq == Seq.fill(4)(expectRow | (expectRow << 8)))
    // round-trips through a real PNG encode/decode
    val png = Multimodal.pngBytesPixels(w, h, (x, _) => x)
    val (dw, dh, raster) = Multimodal.decodePngRaster(png).get
    assert((dw, dh) == (w, h) && raster.toSeq == px.toSeq)
    assert(Multimodal.aHashBands(dw, dh, raster).toSeq == bands.toSeq)
  }

  test("pngAHashPairs equals brute-force hamming <= 3 (banding is lossless)") {
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val corpus = Multimodal.synthPngPixelCorpus(spark, ids, "doc_id")
      .unionByName(Multimodal.synthPngShiftedCorpus(spark,
        ids.filter(col("doc_id") % 5 === 0), "doc_id", 1000L, 1))
    val got = Multimodal.pngAHashPairs(spark, corpus, "doc_id", "payload", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    val h = Multimodal.pngAHash(spark, corpus, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    val brute = for {
      a <- h.keys.toSeq; b <- h.keys.toSeq if a < b
      d = h(a).zip(h(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (a, b)
    assert(got == brute.sorted && got.nonEmpty)
    // the bound is enforced: hamming 4 could slip the 4-band pigeonhole
    intercept[IllegalArgumentException] {
      Multimodal.pngAHashPairs(spark, corpus, "doc_id", "payload", 4)
    }
  }

  test("wavEnvelopeBits: exact bits, re-encode invariance, short/stereo → None") {
    def sample(id: Long, i: Int) = Multimodal.nearDupSample(id, i)
    val base = Multimodal.wavBytes(16000, 1, Array.tabulate(120)(sample(7L, _)))
    // reference computation straight off the definition
    val want = {
      val e = Array.tabulate(24) { w =>
        (0 until 4).map { j =>
          val s = sample(7L, 4 * w + j).toLong; s * s
        }.sum
      }
      val t = e.sum
      e.zipWithIndex.collect { case (x, w) if x * 24 > t => 1L << w }
        .foldLeft(0L)(_ | _)
    }
    assert(Multimodal.wavEnvelopeBits(base, 24, 4).contains(want))
    // header relabel + tail padding (the re-encode transforms) keep the
    // fingerprint; byte equality obviously doesn't survive them
    val reenc = Multimodal.wavBytes(8000, 1, Array.tabulate(136)(sample(7L, _)))
    assert(!java.util.Arrays.equals(base, reenc))
    assert(Multimodal.wavEnvelopeBits(reenc, 24, 4).contains(want))
    // a different signal fingerprints differently
    val other = Multimodal.wavBytes(16000, 1, Array.tabulate(120)(sample(8L, _)))
    assert(Multimodal.wavEnvelopeBits(other, 24, 4).exists(_ != want))
    // shorter than the grid / non-mono → None
    val short = Multimodal.wavBytes(16000, 1, Array.tabulate(90)(sample(7L, _)))
    assert(Multimodal.wavEnvelopeBits(short, 24, 4).isEmpty)
    val stereo = Multimodal.wavBytes(16000, 2, Array.tabulate(120)(sample(7L, _)))
    assert(Multimodal.wavEnvelopeBits(stereo, 24, 4).isEmpty)
  }

  test("mm_audio_neardup pairs every planted re-encode with its source at Hamming 0") {
    val out = graft.SparkEntry.queries("mm_audio_neardup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0))
    val off = docs.max + 1
    val planted = docs.filter(_ % 5 == 0).map(id => (id, off + id)).toSet
    val found = out.map { case (a, b, _) => (a, b) }.toSet
    assert(planted.subsetOf(found),
      s"missing planted pairs: ${planted -- found}")
    planted.foreach { p =>
      val h = out.find(r => (r._1, r._2) == p).get._3
      assert(h == 0L, s"planted pair $p must be envelope-identical, got hamming $h")
    }
  }

  test("wavWindowEnergyRows + the mean gate segment a hand-built wav exactly") {
    import spark.implicits._
    import graft.ops.Multimodal
    // 6 windows x 2 samples: loud at windows 0,1,3,4; near-silence at 2,5
    val samples = Array[Short](1000, 1000, 1000, 1000, 1, 1,
      1000, 1000, 1000, 1000, 1, 1)
    val df = Seq((7L, Multimodal.wavBytes(16000, 1, samples))).toDF("doc_id", "payload")
    val en = Multimodal.wavWindowEnergyRows(spark, df, "doc_id", "payload", 6, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(en.toSeq == Seq((0L, 2000000L), (1L, 2000000L), (2L, 2L),
      (3L, 2000000L), (4L, 2000000L), (5L, 2L)))
  }

  test("VAD gate on engine-decoded bytes recovers the planted voiced pattern") {
    import spark.implicits._
    import graft.ops.Multimodal
    val ids = Seq(1L, 2L, 3L, 4L, 5L)
    val corpus = Multimodal.synthWavVadCorpus(spark, ids.toDF("doc_id"), "doc_id")
    val en = Multimodal.wavWindowEnergyRows(spark, corpus, "doc_id", "payload", 24, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    ids.foreach { id =>
      val es = (0 until 24).map(w => en((id, w.toLong)))
      val te = es.sum
      val gate = (0 until 24).map(w => es(w) * 24 * 256 > te)
      val planted = (0 until 24).map(w => Multimodal.vadVoiced(id, w))
      assert(gate.exists(identity) && !gate.forall(identity),
        s"doc $id: degenerate pattern, test corpus must mix")
      assert(gate == planted,
        s"doc $id: the mean/256 gate must recover the ~2^14x-separated plant")
    }
  }
}
