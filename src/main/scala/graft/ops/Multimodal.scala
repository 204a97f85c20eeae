package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads modeled as
 * opaque `BINARY` columns with typed metadata, processed in batched
 * partition passes.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * libraries): `fakeDecode` derives deterministic pseudo-metadata from
 * the bytes. Everything around the stub — schema, batch iteration,
 * partition sizing, metadata struct shape — is the real distributed
 * plumbing a decode UDF would ride on. In production, swap `fakeDecode`
 * for a JNI/process-isolated decoder inside the same `mapPartitions`
 * (one decoder init per partition, not per row — the Spark analogue of
 * a pandas-UDF batch).
 */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      header_hex: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: deterministic fake dimensions from payload bytes.
    * Replace with a real codec at the marked line. */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length.toLong
    val header = payload.take(8).map("%02x".format(_)).mkString
    // ??? real decode goes here — e.g. ImageIO / ffmpeg via process pool
    val w = 64 + (math.abs(len * 2654435761L) % 1024).toInt
    val h = 64 + (math.abs(len * 40503L) % 768).toInt
    MediaMeta(id, len, header, w, h, 1 + (len % 30).toInt)
  }

  /** REAL BMP container parser — pure JVM. Validates the 'BM' magic,
    * reads the BITMAPINFOHEADER fields little-endian, and sanity-checks
    * the declared pixel-array size against the actual payload. Returns
    * None (callers fall back to the stub) for anything malformed;
    * never throws. Height may be negative in BMP (top-down rows) —
    * reported as its magnitude. */
  def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dibSize = buf.getInt(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    if (hRaw == Int.MinValue) return None // abs(MinValue) is negative
    val h = math.abs(hRaw)
    val bpp = buf.getShort(28) & 0xffff
    val dataOff = buf.getInt(10)
    if (w <= 0 || h == 0 || bpp == 0 || bpp > 32 ||
      dataOff < 54 || dataOff > b.length) return None
    // row stride pads to 4 bytes; the payload must hold the pixel
    // array. Bound each factor by the payload length FIRST so the
    // product below cannot overflow Long (len² ≤ 2⁶² for any real array)
    val rowBytes = ((w.toLong * bpp + 31) / 32) * 4
    if (rowBytes > b.length || h > b.length) return None
    if (dataOff + rowBytes * h > b.length) return None
    Some((w, h, bpp))
  }

  /** Minimal canonical 24bpp BMP (54-byte header + padded pixel rows) —
    * the synthesis side of the parser's tests and oracle. */
  def bmpBytes(w: Int, h: Int, pixelByte: Byte): Array[Byte] = {
    val rowBytes = ((3 * w + 3) / 4) * 4
    val dataLen = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    java.util.Arrays.fill(buf.array(), 54, 54 + dataLen, pixelByte)
    buf.array()
  }

  /** REAL PNG container parser — pure JVM. Validates the 8-byte PNG
    * signature and the mandatory FIRST chunk (IHDR: declared length 13,
    * type bytes "IHDR"), reads width/height/bitDepth BIG-endian (PNG is
    * network byte order, unlike BMP/RIFF), and VERIFIES the IHDR CRC32
    * (type + data, java.util.zip.CRC32 — the polynomial the PNG spec
    * mandates), so a corrupted header is rejected, not misread. Returns
    * `(width, height, bitDepth)`; None for anything malformed. */
  def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 33 || !(0 until 8).forall(i => (b(i) & 0xff) == sig(i))) return None
    val buf = java.nio.ByteBuffer.wrap(b) // big-endian by default
    if (buf.getInt(8) != 13) return None // IHDR data length
    if (!(new String(b, 12, 4, "US-ASCII") == "IHDR")) return None
    val w = buf.getInt(16)
    val h = buf.getInt(20)
    val bitDepth = b(24) & 0xff
    if (w <= 0 || h <= 0 || !Set(1, 2, 4, 8, 16).contains(bitDepth)) return None
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13) // chunk type + data
    if (crc.getValue != (buf.getInt(29).toLong & 0xffffffffL)) return None
    Some((w, h, bitDepth))
  }

  /** Minimal well-formed PNG (signature + CRC-correct IHDR + one fake
    * IDAT + IEND) — the synthesis side of [[parsePng]]'s tests and
    * oracle. The IDAT body is opaque filler (a real encoder would
    * deflate scanlines); the container structure is real. */
  def pngBytes(w: Int, h: Int, idatLen: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array.tabulate(idatLen)(i => (i % 251).toByte)) ++
      chunk("IEND", Array.empty)
  }

  /** FULLY-DECODED 8-bit grayscale PNG (color type 0): real scanline
    * serialization (filter byte 0 + w pixel bytes per row), REAL zlib
    * deflate of the image data, CRC-correct chunks — a PNG any viewer
    * opens, and the synthesis side of [[decodePngPixels]]. */
  def pngBytesPixels(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // 8-bit grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      raw(y * (1 + w)) = 0 // filter type 0 (None)
      var x = 0
      while (x < w) { raw(y * (1 + w) + 1 + x) = (pix(x, y) & 0xff).toByte; x += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // loop until finished(): zlib stored-block worst case (~5 B/16 KiB
    // + header) exceeds any fixed slack on large incompressible images
    val idat = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++ chunk("IEND", Array.empty)
  }

  /** REAL PNG pixel decode — pure JVM, the full read path: signature +
    * IHDR (8-bit grayscale only), chunk walk collecting IDAT payloads
    * with each chunk's CRC32 VERIFIED, zlib inflate, per-scanline
    * filter-byte check (only filter 0 accepted — these are our own
    * encodes; a real filter reconstructor would slot in here), then
    * pixel statistics. Returns `(w, h, pixSum, pixMin, pixMax)`;
    * None for anything malformed, truncated, or CRC-corrupt. */
  def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Long, Int, Int)] = {
    val hdr = parsePng(b)
    if (hdr.isEmpty) return None
    val (w, h, depth) = hdr.get
    if (depth != 8 || (b(25) & 0xff) != 0) return None // grayscale only
    val buf = java.nio.ByteBuffer.wrap(b)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33 // first chunk after IHDR
    var ended = false
    while (!ended) {
      if (off + 8 > b.length) return None
      val len = buf.getInt(off)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue != (buf.getInt(off + 8 + len).toLong & 0xffffffffL)) return None
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") ended = true
      off += 12 + len
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    val got = try inflater.inflate(raw) finally inflater.end()
    if (got != raw.length) return None
    var sum = 0L; var mn = 255; var mx = 0
    var y = 0
    while (y < h) {
      if (raw(y * (1 + w)) != 0) return None // unsupported filter
      var x = 0
      while (x < w) {
        val v = raw(y * (1 + w) + 1 + x) & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    Some((w, h, sum, mn, mx))
  }

  /** Deterministic REAL-pixel PNG corpus: id-keyed dimensions, pixel
    * (x,y) = (id + 7x + 13y) mod 256 — an oracle predicts every pixel
    * statistic analytically while the bytes exercise the full
    * deflate→inflate→defilter read path. */
  def synthPngPixelCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 3) % 9).toInt
      (id, pngBytesPixels(w, h, (x, y) => ((id + 7L * x + 13L * y) % 256).toInt))
    }.toDF(idCol, "payload")
  }

  /** Like [[synthPngPixelCorpus]] but emitting VARIANT images: ids
    * offset by `idOffset`, dimensions still derived from the BASE id,
    * pixels shifted by `pixShift` before the mod-256 wrap — the
    * brightness-nudged re-encode of an existing image that a
    * perceptual-hash dedup pass exists to catch. */
  def synthPngShiftedCorpus(spark: SparkSession, docs: DataFrame, idCol: String,
                            idOffset: Long, pixShift: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 3) % 9).toInt
      (id + idOffset, pngBytesPixels(w, h,
        (x, y) => ((id + pixShift + 7L * x + 13L * y) % 256).toInt))
    }.toDF(idCol, "payload")
  }

  /** Full PNG decode returning the raster (row-major, w·h ints) —
    * the pixel source for [[pngAHash]]. Same walk as
    * [[decodePngPixels]]: per-chunk CRC verification, inflate,
    * filter-0 defilter; None on anything malformed. */
  def decodePngRaster(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val hdr = parsePng(b)
    if (hdr.isEmpty) return None
    val (w, h, depth) = hdr.get
    if (depth != 8 || (b(25) & 0xff) != 0) return None
    val buf = java.nio.ByteBuffer.wrap(b)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var ended = false
    while (!ended) {
      if (off + 8 > b.length) return None
      val len = buf.getInt(off)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue != (buf.getInt(off + 8 + len).toLong & 0xffffffffL)) return None
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") ended = true
      off += 12 + len
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    val got = try inflater.inflate(raw) finally inflater.end()
    if (got != raw.length) return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      if (raw(y * (1 + w)) != 0) return None
      var x = 0
      while (x < w) {
        px(y * w + x) = raw(y * (1 + w) + 1 + x) & 0xff
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Average-hash (aHash) of a raster as four 16-bit bands: sample an
    * 8×8 nearest-neighbor grid (x = i·w/8, y = j·h/8), set bit
    * k = j·8+i when `64·v_k > Σv` (strictly above the mean, kept in
    * exact integers), and pack k∈[16b, 16b+16) into band b — the
    * SimHash-style banding that makes Hamming-≤3 search an equi-join. */
  def aHashBands(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    val v = new Array[Int](64)
    var s = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val p = px((j * h / 8) * w + (i * w / 8))
        v(j * 8 + i) = p; s += p
        i += 1
      }
      j += 1
    }
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      if (64L * v(k) > s) bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands
  }

  case class PngAHash(doc_id: Long, width: Int, height: Int,
                      b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual hash over a binary PNG column: full decode (CRC walk,
    * inflate, defilter) then [[aHashBands]], one pass per partition. */
  def pngAHash(spark: SparkSession, docs: DataFrame,
               idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[PngAHash]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val (w, h, px) = decodePngRaster(r.getAs[Array[Byte]](1)).getOrElse(
            throw new IllegalStateException(s"undecodable PNG payload for id $id"))
          val b = aHashBands(w, h, px)
          PngAHash(id, w, h, b(0), b(1), b(2), b(3))
        }
      }(enc)
      .toDF()
  }

  /**
   * Image NEAR-DUP pairs by perceptual hash: all pairs with aHash
   * Hamming distance ≤ `maxHamming`, found by the banded equi-join —
   * with 4 bands, any pair within Hamming 3 shares at least one
   * identical band (pigeonhole), so candidates come from one join on
   * (band index, band value) and the exact XOR-popcount check runs
   * only on them. `maxHamming ≤ 3` is enforced: beyond it the banding
   * would silently lose recall. The multimodal twin of
   * [[Dedup]]'s SimHash text path — brightness-shifted / re-encoded
   * images land within a few bits of their source while the
   * byte-level hashes differ completely. Hashes are computed once
   * (localCheckpoint) — the self-join must not re-decode the corpus.
   */
  def pngAHashPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                    payloadCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"pngAHashPairs: maxHamming=$maxHamming exceeds the 4-band pigeonhole bound (3)")
    val hashes = pngAHash(spark, docs, idCol, payloadCol).localCheckpoint()
    val bands = hashes.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "bidx", "bval")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bidx") === col("b.bidx") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val ha = hashes.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hashes.select(col("doc_id").as("id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  case class PngPixelStats(doc_id: Long, width: Int, height: Int,
                           n_pixels: Long, pix_sum: Long, pix_min: Int, pix_max: Int)

  /** Distributed pixel-statistics pass over a binary PNG column — the
    * [[decodeMeta]] shape with the FULL decode inside the partition
    * loop. A payload that fails the decode fails the JOB (these are
    * pipeline-owned encodes; silent nulls would hide corruption). */
  def pngPixelStats(spark: SparkSession, docs: DataFrame,
                    idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[PngPixelStats]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val s = decodePngPixels(r.getAs[Array[Byte]](1)).getOrElse(
            throw new IllegalStateException(s"undecodable PNG payload for id $id"))
          PngPixelStats(id, s._1, s._2, s._1.toLong * s._2, s._3, s._4, s._5)
        }
      }(enc)
      .toDF()
  }

  /** Strided PNG decode — the nearest-neighbor DOWNSCALE primitive:
    * the same full read path as [[decodePngPixels]] (CRC walk, inflate,
    * defilter), but only every `step`-th pixel in both axes is kept —
    * exactly the pixels a step-factor nearest-neighbor resize would
    * emit. Returns `(outW, outH, pixSum)` over the sampled grid
    * (outW = ⌈w/step⌉); None on anything malformed. The thumbnail /
    * preview / training-resolution pass of an image pipeline, with its
    * statistics analytic under the synthetic corpus. */
  def decodePngPixelsStrided(b: Array[Byte], step: Int): Option[(Int, Int, Long)] = {
    require(step >= 1, s"decodePngPixelsStrided: step=$step")
    val hdr = parsePng(b)
    if (hdr.isEmpty) return None
    val (w, h, depth) = hdr.get
    if (depth != 8 || (b(25) & 0xff) != 0) return None
    val buf = java.nio.ByteBuffer.wrap(b)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var ended = false
    while (!ended) {
      if (off + 8 > b.length) return None
      val len = buf.getInt(off)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue != (buf.getInt(off + 8 + len).toLong & 0xffffffffL)) return None
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") ended = true
      off += 12 + len
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    val got = try inflater.inflate(raw) finally inflater.end()
    if (got != raw.length) return None
    var sum = 0L
    var y = 0
    while (y < h) {
      if (raw(y * (1 + w)) != 0) return None
      if (y % step == 0) {
        var x = 0
        while (x < w) {
          if (x % step == 0) sum += raw(y * (1 + w) + 1 + x) & 0xff
          x += step // only sampled columns are even touched
        }
      }
      y += 1
    }
    Some(((w + step - 1) / step, (h + step - 1) / step, sum))
  }

  case class PngResizeStats(doc_id: Long, out_w: Int, out_h: Int,
                            n_pixels: Long, pix_sum: Long)

  /** Distributed strided-decode pass — [[pngPixelStats]]'s shape with
    * the downscale sampler inside the partition loop. */
  def pngResizeStats(spark: SparkSession, docs: DataFrame,
                     idCol: String, payloadCol: String, step: Int): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[PngResizeStats]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val s = decodePngPixelsStrided(r.getAs[Array[Byte]](1), step).getOrElse(
            throw new IllegalStateException(s"undecodable PNG payload for id $id"))
          PngResizeStats(id, s._1, s._2, s._1.toLong * s._2, s._3)
        }
      }(enc)
      .toDF()
  }

  /** REAL GIF (87a/89a) parser — pure JVM. Validates the signature,
    * reads the little-endian logical-screen dimensions, skips the
    * global color table per the packed flags, then walks the block
    * stream — 0x21 extensions and 0x2C image descriptors (each with
    * its local color table, LZW min-code byte, and length-prefixed
    * data sub-blocks) — to the 0x3B trailer, counting frames. Returns
    * (frames, w, h); None for anything malformed, truncated, or
    * frameless — a parser that guesses on a 100 TB crawl poisons every
    * downstream sample. */
  def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 14) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8) // little-endian
    val w = u16(6); val h = u16(8)
    if (w <= 0 || h <= 0) return None
    var off = 13
    if ((u8(10) & 0x80) != 0) off += 3 * (1 << ((u8(10) & 0x07) + 1))
    // length-prefixed sub-blocks until a 0 terminator; -1 = truncated
    def skipSubBlocks(start: Int): Int = {
      var o = start
      while (o < b.length) {
        val n = u8(o); o += 1
        if (n == 0) return o
        o += n
      }
      -1
    }
    var frames = 0
    while (off < b.length) {
      u8(off) match {
        case 0x3b =>
          return if (frames > 0) Some((frames, w, h)) else None
        case 0x2c =>
          if (off + 10 > b.length) return None
          val lp = u8(off + 9)
          var o = off + 10
          if ((lp & 0x80) != 0) o += 3 * (1 << ((lp & 0x07) + 1))
          if (o >= b.length) return None
          o += 1 // LZW min code size
          o = skipSubBlocks(o)
          if (o < 0) return None
          frames += 1; off = o
        case 0x21 =>
          if (off + 2 > b.length) return None
          val o = skipSubBlocks(off + 2)
          if (o < 0) return None
          off = o
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Minimal well-formed animated GIF (89a, no global color table,
    * per-frame graphic-control extension + image descriptor + one
    * id-keyed data sub-block) — the synthesis side of [[parseGif]]'s
    * tests and oracle. Frame f carries 1 + (f % 5) payload bytes for
    * 21 + 1 + (f % 5) frame bytes total, so byte_len is analytically
    * 14 + Σ_f (22 + f % 5). */
  def gifBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && w < 65536 && h > 0 && h < 65536 && frames > 0,
      s"gifBytes: bad ($w x $h x $frames)")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    out ++= "GIF89a".getBytes("US-ASCII")
    u16(w); u16(h)
    out += 0.toByte // packed: no global color table
    out += 0.toByte // background color index
    out += 0.toByte // pixel aspect ratio
    (0 until frames).foreach { f =>
      out += 0x21.toByte; out += 0xf9.toByte; out += 4.toByte // GCE
      out += 0.toByte; out += 10.toByte; out += 0.toByte; out += 0.toByte
      out += 0.toByte // GCE terminator
      out += 0x2c.toByte // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out += 0.toByte // no local color table
      out += 2.toByte // LZW min code size
      val n = 1 + (f % 5)
      out += n.toByte
      (0 until n).foreach(i => out += ((f + i) % 251).toByte)
      out += 0.toByte // sub-block terminator
    }
    out += 0x3b.toByte
    out.toArray
  }

  /** Deterministic GIF corpus with id-keyed dimensions and frame
    * counts ([[gifBytes]]), so the oracle predicts every decoded
    * column analytically. */
  def synthGifCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      (id, gifBytes((16 + id % 200).toInt, (16 + (id * 7) % 200).toInt,
        frames = (1 + id % 4).toInt))
    }.toDF(idCol, "payload")
  }

  /** REAL AVI (RIFF video) header parser — pure JVM. Validates the
    * RIFF/'AVI ' container, walks top-level chunks into the LIST(hdrl)
    * sub-list, and reads the avih main header little-endian:
    * (totalFrames, width, height). None for anything malformed. */
  def parseAvi(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12) return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def findAvih(off0: Int, end: Int): Option[Int] = {
      var off = off0
      while (off + 8 <= end) {
        val id = ascii(off, 4)
        val size = buf.getInt(off + 4)
        // Long compare, same overflow guard as parseWav's chunk walk
        if (size < 0 || off.toLong + 8 + size > end) return None
        if (id == "avih") return Some(off + 8)
        val found = // recurse into header lists only
          if (id == "LIST" && size >= 4 && ascii(off + 8, 4) == "hdrl")
            findAvih(off + 12, off + 8 + size)
          else None
        if (found.isDefined) return found
        off += 8 + size + (size & 1)
      }
      None
    }
    findAvih(12, b.length).flatMap { at =>
      if (at + 40 > b.length) None
      else {
        val frames = buf.getInt(at + 16)
        val w = buf.getInt(at + 32)
        val h = buf.getInt(at + 36)
        if (frames <= 0 || w <= 0 || h <= 0) None else Some((frames, w, h))
      }
    }
  }

  /** Minimal canonical AVI header (RIFF → LIST hdrl → avih) — the
    * synthesis side of the parser's tests and oracle. No movi payload:
    * frame SAMPLING planning needs only the main header, which is the
    * point (prune before decoding any frame). */
  def aviBytes(frames: Int, w: Int, h: Int): Array[Byte] = {
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize       // 'hdrl' + avih chunk
    val riffSize = 4 + 8 + hdrlSize       // 'AVI ' + LIST chunk
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize).put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(avihSize)
    buf.putInt(33333).putInt(0).putInt(0).putInt(0) // usec/frame, maxbps, pad, flags
    buf.putInt(frames).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufsize
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)     // reserved
    buf.array()
  }

  /** Canonical AVI with a REAL movi payload on top of [[aviBytes]]'s
    * header: RIFF → LIST hdrl (avih) → LIST movi with one '00db' chunk
    * per frame of raw 8-bit grayscale (row-major, top-down, odd sizes
    * padded per RIFF). The synthesis side of the video near-dup path's
    * tests and oracle — every pixel an analytic function of
    * (frame, x, y). */
  def aviBytesMovi(w: Int, h: Int, frames: Int,
                   pix: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0, s"aviBytesMovi: bad ($w, $h, $frames)")
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize
    val frameSize = w * h
    val pad = frameSize & 1
    val moviSize = 4 + frames * (8 + frameSize + pad)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize).put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(avihSize)
    buf.putInt(33333).putInt(0).putInt(0).putInt(0)
    buf.putInt(frames).putInt(0).putInt(1).putInt(0)
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviSize).put("movi".getBytes("US-ASCII"))
    var f = 0
    while (f < frames) {
      buf.put("00db".getBytes("US-ASCII")).putInt(frameSize)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { buf.put((pix(f, x, y) & 0xff).toByte); x += 1 }
        y += 1
      }
      if (pad == 1) buf.put(0.toByte)
      f += 1
    }
    buf.array()
  }

  /** Decode an [[aviBytesMovi]]-shaped AVI: dimensions and frame count
    * from the avih header ([[parseAvi]]'s walk), then the movi LIST's
    * '00db' chunks as w·h-byte grayscale rasters. None for anything
    * malformed — a missing movi list, a frame chunk of the wrong size,
    * or a frame count that disagrees with the header. */
  def decodeAviFrames(b: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    parseAvi(b).flatMap { case (nf, w, h) =>
      def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var movi = -1
      var moviEnd = -1
      while (off + 8 <= b.length && movi < 0) {
        val id = ascii(off, 4)
        val size = buf.getInt(off + 4)
        if (size < 0 || off.toLong + 8 + size > b.length) return None
        if (id == "LIST" && size >= 4 && ascii(off + 8, 4) == "movi") {
          movi = off + 12; moviEnd = off + 8 + size
        }
        off += 8 + size + (size & 1)
      }
      if (movi < 0) return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var o = movi
      while (o + 8 <= moviEnd) {
        val id = ascii(o, 4)
        val size = buf.getInt(o + 4)
        if (size < 0 || o.toLong + 8 + size > moviEnd) return None
        if (id == "00db") {
          if (size != w * h) return None
          val base = o + 8
          frames += Array.tabulate(w * h)(i => b(base + i) & 0xff)
        }
        o += 8 + size + (size & 1)
      }
      if (frames.size != nf) None else Some((w, h, frames.toArray))
    }
  }

  /** Deterministic AVI corpus WITH frame payloads: id-keyed dims and
    * frame counts, pixel(f, x, y) = (id + 17f + 7x + 13y) mod 256 —
    * analytic, so the oracle replays the hash decode-free. */
  def synthAviPixelCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 3) % 9).toInt
      val nf = (4 + id % 5).toInt
      (id, aviBytesMovi(w, h, nf,
        (f, x, y) => ((id + 17L * f + 7L * x + 13L * y) % 256).toInt))
    }.toDF(idCol, "payload")
  }

  /** Like [[synthAviPixelCorpus]] but emitting RE-ENCODE variants: ids
    * offset, same dims/frames as the BASE id, every pixel shifted by
    * `pixShift` before the mod-256 wrap — the brightness-nudged
    * re-render a video near-dup pass exists to catch (hashes a few
    * bits away where the bytes differ everywhere). */
  def synthAviShiftedCorpus(spark: SparkSession, docs: DataFrame, idCol: String,
                            idOffset: Long, pixShift: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 3) % 9).toInt
      val nf = (4 + id % 5).toInt
      (id + idOffset, aviBytesMovi(w, h, nf,
        (f, x, y) => ((id + pixShift + 17L * f + 7L * x + 13L * y) % 256).toInt))
    }.toDF(idCol, "payload")
  }

  /** Deterministic AVI corpus with MOTION — per-frame STRUCTURED
    * content, pixel(f, x, y) = (id + (f + frameShift + 1)·x·y + 7x +
    * 13y) mod 256: the f-dependent curvature term changes each frame's
    * thresholded BIT LAYOUT, where [[synthAviPixelCorpus]]'s constant
    * per-frame offset is invisible to the brightness-invariant aHash
    * (any two frames there hash alike — fine for slot-aligned
    * re-render matching, useless for distinguishing frames). With
    * `frameShift` = s, frame f renders the unshifted corpus's frame
    * f + s EXACTLY — the re-cut variant whose frames match pairwise
    * but never at the same slot. */
  def synthAviMotionCorpus(spark: SparkSession, docs: DataFrame, idCol: String,
                           idOffset: Long = 0L, frameShift: Int = 0): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 3) % 9).toInt
      val nf = (4 + id % 5).toInt
      (id + idOffset, aviBytesMovi(w, h, nf,
        (f, x, y) => ((id + (f + frameShift + 1L) * x * y + 7L * x + 13L * y)
          % 256).toInt))
    }.toDF(idCol, "payload")
  }

  case class AviFrameHash(doc_id: Long, slot: Int, frame_idx: Int,
                          b0: Int, b1: Int, b2: Int, b3: Int)

  /** Per-video SAMPLED-FRAME perceptual hashes: decode the movi
    * payload once per partition pass, take `maxFrames` evenly-strided
    * frame slots (slot t reads frame ⌊t·nf/maxFrames⌋ — duplicates
    * when nf < maxFrames, so every video fills every slot
    * deterministically), and [[aHashBands]] each sampled raster.
    * Returns `(doc_id, slot, frame_idx, b0..b3)` — the bounded
    * per-video sketch (maxFrames × 4 ints) downstream dedup joins on,
    * the "never ship rasters across the shuffle" discipline. */
  def aviFrameAHash(spark: SparkSession, docs: DataFrame,
                    idCol: String, payloadCol: String, maxFrames: Int): DataFrame = {
    import spark.implicits._
    require(maxFrames >= 1 && maxFrames <= 64, s"aviFrameAHash: maxFrames=$maxFrames")
    val enc = org.apache.spark.sql.Encoders.product[AviFrameHash]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .flatMap { r: Row =>
        val id = r.getLong(0)
        val (w, h, frames) = decodeAviFrames(r.getAs[Array[Byte]](1)).getOrElse(
          throw new IllegalStateException(s"undecodable AVI payload for id $id"))
        (0 until maxFrames).map { t =>
          val fi = t * frames.length / maxFrames
          val b = aHashBands(w, h, frames(fi))
          AviFrameHash(id, t, fi, b(0), b(1), b(2), b(3))
        }
      }(enc)
      .toDF()
  }

  /**
   * VIDEO NEAR-DUP pairs — [[pngAHashPairs]]'s temporal composition:
   * two videos are near-dups when at least `minMatch` of their
   * `maxFrames` aligned frame slots hash within Hamming ≤ `maxHamming`.
   * Candidates come from one banded equi-join on (slot, band index,
   * band value) — within a slot, any pair ≤ Hamming 3 shares a band
   * (pigeonhole) — then the exact XOR-popcount runs per candidate
   * (pair, slot) and a keyed count gates on `minMatch`. Slot alignment
   * is the re-encode model (same content, same sampling grid); a
   * clipped/re-cut video needs slot-free matching, which is the same
   * join minus the slot key at band-collision × maxFrames² cost.
   * Output: `(id_a, id_b, n_matched)`, id_a < id_b.
   */
  def aviNearDupPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                      payloadCol: String, maxFrames: Int,
                      maxHamming: Int, minMatch: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"aviNearDupPairs: maxHamming=$maxHamming exceeds the 4-band pigeonhole bound (3)")
    require(minMatch >= 1 && minMatch <= maxFrames,
      s"aviNearDupPairs: minMatch in [1, maxFrames], got $minMatch")
    val hashes = aviFrameAHash(spark, docs, idCol, payloadCol, maxFrames)
      .localCheckpoint() // the self-join must not re-decode the corpus
    val bands = hashes.select(col("doc_id"), col("slot"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "slot", "bidx", "bval")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.slot") === col("b.slot") && col("a.bidx") === col("b.bidx") &&
          col("a.bval") === col("b.bval") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("a.slot").as("slot"))
      .distinct()
    val ha = hashes.select(col("doc_id").as("id_a"), col("slot"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hashes.select(col("doc_id").as("id_b"), col("slot"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, Seq("id_a", "slot")).join(hb, Seq("id_b", "slot"))
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /**
   * CLIP-ROBUST video near-dup — [[aviNearDupPairs]] minus the slot
   * alignment, for re-CUT videos (trimmed intros, shifted sampling
   * grids) whose frames match pairwise but never at the same slot:
   * candidates come from the banded equi-join on (band index, band
   * value) across ALL slot pairs, the exact popcount runs per
   * (pair, slot_a, slot_b), and a pair reports when ≥ `minMatch`
   * DISTINCT slots of the smaller-id video find a Hamming-≤
   * `maxHamming` partner anywhere in the other. Costs the aligned
   * form's band-collision volume × up to maxFrames² per colliding
   * pair — run it on the residue the aligned pass left, not instead
   * of it. Output: `(id_a, id_b, n_matched)`, id_a < id_b,
   * n_matched = matched distinct slots of id_a.
   */
  def aviClipNearDupPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                          payloadCol: String, maxFrames: Int,
                          maxHamming: Int, minMatch: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"aviClipNearDupPairs: maxHamming=$maxHamming exceeds the 4-band pigeonhole bound (3)")
    require(minMatch >= 1 && minMatch <= maxFrames,
      s"aviClipNearDupPairs: minMatch in [1, maxFrames], got $minMatch")
    val hashes = aviFrameAHash(spark, docs, idCol, payloadCol, maxFrames)
      .localCheckpoint()
    val bands = hashes.select(col("doc_id"), col("slot"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "slot", "bidx", "bval")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bidx") === col("b.bidx") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.slot").as("slot_a"),
        col("b.doc_id").as("id_b"), col("b.slot").as("slot_b"))
      .distinct()
    val ha = hashes.select(col("doc_id").as("id_a"), col("slot").as("slot_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hashes.select(col("doc_id").as("id_b"), col("slot").as("slot_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, Seq("id_a", "slot_a")).join(hb, Seq("id_b", "slot_b"))
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("slot_a")).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /** Decode one image/video payload: real BMP or AVI parse when the
    * container is recognized, deterministic stub otherwise. */
  /** REAL JPEG header parser — pure JVM marker-segment walk: validates
    * SOI, steps marker segments by their big-endian lengths (skipping
    * 0xFF fill bytes), and reads the first SOF0/SOF1/SOF2 frame
    * header: (width, height, components). None for anything malformed,
    * for SOS/EOI reached before any SOF, and for segments running past
    * the buffer — a truncated file can never mis-parse. */
  def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
      val marker = b(j + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before SOF
      if (j + 3 >= b.length) return None
      val len = ((b(j + 2) & 0xff) << 8) | (b(j + 3) & 0xff)
      if (len < 2 || j + 2 + len > b.length) return None
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (len < 8) return None
        val h = ((b(j + 5) & 0xff) << 8) | (b(j + 6) & 0xff)
        val w = ((b(j + 7) & 0xff) << 8) | (b(j + 8) & 0xff)
        val comps = b(j + 9) & 0xff
        if (w <= 0 || h <= 0 || comps <= 0) return None
        return Some((w, h, comps))
      }
      i = j + 2 + len
    }
    None
  }

  /** Minimal well-formed JPEG (SOI + JFIF APP0 + a COM segment of
    * `comLen` filler bytes + SOF0 with 3 components + EOI) — the
    * synthesis side of [[parseJpeg]]: container structure real, no
    * entropy-coded data. Total bytes = 45 + comLen. */
  def jpegBytes(w: Int, h: Int, comLen: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(45 + comLen)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte) // version 1.1
      .put(0.toByte).putShort(1).putShort(1) // no units, 1:1 aspect
      .put(0.toByte).put(0.toByte) // no thumbnail
    out.put(0xff.toByte).put(0xfe.toByte).putShort((comLen + 2).toShort) // COM
    (0 until comLen).foreach(k => out.put((k % 251).toByte))
    out.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len 8 + 3*3
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    (1 to 3).foreach { c =>
      out.put(c.toByte).put(0x11.toByte).put(0.toByte) // 1x1 sampling, QT 0
    }
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  /** Deterministic JPEG corpus with id-keyed dimensions and COM
    * padding, so an oracle predicts width/height/byte_len analytically
    * while the bytes exercise the REAL marker-walk parse. */
  def synthJpegCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (16 + id % 256).toInt
      val h = (16 + (id * 5) % 256).toInt
      (id, jpegBytes(w, h, comLen = (id % 40).toInt))
    }.toDF(idCol, "payload")
  }

  def imageDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val header = () => payload.take(8).map("%02x".format(_)).mkString
    parsePng(payload) match {
      case Some((w, h, _)) => MediaMeta(id, payload.length.toLong, header(), w, h, 1)
      case None => parseBmp(payload) match {
        case Some((w, h, _)) => MediaMeta(id, payload.length.toLong, header(), w, h, 1)
        case None => parseJpeg(payload) match {
          case Some((w, h, _)) => MediaMeta(id, payload.length.toLong, header(), w, h, 1)
          case None => parseAvi(payload) match {
            case Some((frames, w, h)) =>
              MediaMeta(id, payload.length.toLong, header(), w, h, frames)
            case None => parseGif(payload) match {
              case Some((frames, w, h)) =>
                MediaMeta(id, payload.length.toLong, header(), w, h, frames)
              case None => fakeDecode(id, payload)
            }
          }
        }
      }
    }
  }

  /** Deterministic AVI-header corpus with id-keyed dimensions/frames. */
  def synthAviCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val frames = (10 + id % 120).toInt
      val w = (320 + (id % 8) * 160).toInt
      val h = (240 + (id % 5) * 120).toInt
      (id, aviBytes(frames, w, h))
    }.toDF(idCol, "payload")
  }

  /** Deterministic PNG corpus with id-keyed dimensions and IDAT size,
    * so an oracle predicts width/height/byte_len analytically while
    * the bytes exercise the REAL (CRC-verified) container parse. */
  def synthPngCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (16 + id % 128).toInt
      val h = (16 + (id * 3) % 128).toInt
      (id, pngBytes(w, h, idatLen = (10 + id % 50).toInt))
    }.toDF(idCol, "payload")
  }

  /** Deterministic BMP corpus with id-keyed dimensions, so an oracle
    * predicts width/height/byte_len analytically while the bytes
    * exercise the REAL container parse. */
  def synthBmpCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (16 + id % 64).toInt
      val h = (16 + (id * 7) % 64).toInt
      (id, bmpBytes(w, h, (id % 256).toByte))
    }.toDF(idCol, "payload")
  }

  /**
   * Frame-sampling + aspect-preserving resize PLAN over decoded
   * metadata: for each media item, ≤ `maxFrames` evenly-strided frame
   * indices and the output dimensions fitting `fitBox`² (never
   * upscaled). Pure integer/double expressions — at scale this column
   * drives the actual decode pass (sample exactly these frames), so
   * the expensive codec work is pruned before it happens.
   */
  def frameSamplePlan(meta: DataFrame, maxFrames: Int = 8, fitBox: Int = 256): DataFrame = {
    // ceil(n_frames / maxFrames) in exact integer arithmetic
    val stride = ((col("n_frames") + (maxFrames - 1)) - ((col("n_frames") + (maxFrames - 1)) % maxFrames)) / maxFrames
    val scale = least(
      lit(fitBox.toDouble) / col("width"),
      lit(fitBox.toDouble) / col("height"),
      lit(1.0))
    meta.select(
      col("doc_id"), col("n_frames"),
      stride.cast(IntegerType).as("stride"),
      array_join(sequence(lit(0L), (col("n_frames") - 1).cast(LongType),
        stride.cast(LongType)), ",").as("frame_csv"),
      floor(col("width") * scale).cast(IntegerType).as("out_w"),
      floor(col("height") * scale).cast(IntegerType).as("out_h"))
  }

  /** Attach a binary payload column plus the metadata struct, decoded
    * in batched partition passes: BMP payloads take the REAL container
    * parse ([[parseBmp]]), anything else the deterministic stub. */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
                 idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        // per-partition init of a real decoder would happen HERE, once
        rows.map { r: Row => imageDecode(r.getLong(0), r.getAs[Array[Byte]](1)) }
      }(enc)
      .toDF()
  }

  case class AudioMeta(
      doc_id: Long,
      n_samples: Long,
      sample_rate: Int,
      duration_s: Double,
      peak: Int)

  /** STUB audio decoder for non-RIFF payloads: PCM16-shaped
    * deterministic pseudo-features from the payload bytes (2 bytes per
    * sample; fake rate ∈ {8,16,24} kHz). The REAL path is [[parseWav]];
    * this fallback keeps opaque/unknown containers flowing (swap it for
    * ffprobe/JNI in production). */
  def fakeAudioDecode(id: Long, payload: Array[Byte]): AudioMeta = {
    val len = payload.length.toLong
    val nSamples = len / 2
    val rate = (8000L * (1 + len % 3)).toInt
    AudioMeta(id, nSamples, rate, nSamples.toDouble / rate,
      (math.abs(len * 2654435761L) % 32768).toInt)
  }

  case class WavInfo(numChannels: Int, sampleRate: Int, bitsPerSample: Int,
                     nFrames: Long, peak: Int)

  /** REAL RIFF/WAVE parser — pure JVM, no codec library needed. Walks
    * the chunk list (honoring the odd-size pad byte), reads PCM fmt
    * fields little-endian, counts data frames via blockAlign, and scans
    * the PCM16 payload for the true peak amplitude. Returns None for
    * anything that is not a well-formed PCM16 WAV (callers fall back to
    * the stub), never throws on malformed bytes. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44) return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= b.length) {
      val id = ascii(off, 4)
      val size = buf.getInt(off + 4)
      // Long compare: a near-Int.MaxValue declared size would wrap
      // `off + 8 + size` negative and walk past the guard
      if (size < 0 || off.toLong + 8 + size > b.length) return None // truncated chunk
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(off + 8) & 0xffff
          if (audioFormat != 1) return None // PCM only
          fmt = Some((buf.getShort(off + 10) & 0xffff, buf.getInt(off + 12),
            buf.getShort(off + 22) & 0xffff, buf.getShort(off + 20) & 0xffff))
        case "data" => dataOff = off + 8; dataLen = size
        case _ => () // LIST/INFO/fact/... chunks are skipped
      }
      off += 8 + size + (size & 1) // chunks pad to even offsets
    }
    fmt match {
      case Some((ch, rate, bits, blockAlign))
          if dataOff >= 0 && ch > 0 && rate > 0 && bits == 16 && blockAlign == ch * 2 =>
        val nFrames = dataLen.toLong / blockAlign
        var peak = 0
        var i = dataOff
        val end = dataOff + dataLen
        while (i + 1 < end) {
          val s = buf.getShort(i).toInt
          val a = if (s < 0) -s else s
          if (a > peak) peak = a
          i += 2
        }
        Some(WavInfo(ch, rate, bits, nFrames, peak))
      case _ => None
    }
  }

  /** Minimal canonical PCM16 WAV container (RIFF/fmt/data) — the
    * synthesis side of the parser's unit + oracle tests. */
  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode one audio payload: real RIFF/WAV parse when the bytes are a
    * PCM16 WAV, deterministic stub otherwise. */
  def audioDecode(id: Long, payload: Array[Byte]): AudioMeta = parseWav(payload) match {
    case Some(w) =>
      AudioMeta(id, w.nFrames, w.sampleRate, w.nFrames.toDouble / w.sampleRate, w.peak)
    case None => fakeAudioDecode(id, payload)
  }

  /** Audio-column analogue of [[decodeMeta]]: same batched
    * mapPartitions plumbing, audio-shaped metadata struct; WAV payloads
    * take the real parser, anything else the stub. */
  def audioFeats(spark: SparkSession, docs: DataFrame,
                 idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[AudioMeta]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row => audioDecode(r.getLong(0), r.getAs[Array[Byte]](1)) }
      }(enc)
      .toDF()
  }

  /** Deterministic PCM16 WAV corpus derived from doc ids (rate, frame
    * count, and amplitude are all id-keyed), so an oracle can predict
    * every parsed field analytically while the bytes exercise the REAL
    * container parse. Alternating ±A samples make the true peak A. */
  def synthWavCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val rate = (8000L * (1 + id % 3)).toInt
      val nFrames = (100 + id % 50).toInt
      val amp = ((id * 997L) % 32768L).toShort
      val samples = Array.tabulate(nFrames)(i => if (i % 2 == 0) amp else (-amp).toShort)
      (id, wavBytes(rate, 1, samples))
    }.toDF(idCol, "payload")
  }

  /** FULL PCM16 sample decode — the real DSP-feature read path next to
    * [[parseWav]]'s header walk: container validated, the data chunk's
    * little-endian int16 samples scanned once for exact integer energy
    * (Σ s², BIGINT — no floats in the statistic) and zero-crossing
    * count (sign change between consecutive samples, 0 counted
    * non-negative). Mono 16-bit only; None for anything else or
    * malformed. */
  def wavSampleStats(b: Array[Byte]): Option[(Long, Long, Long)] = {
    val info = parseWav(b)
    if (info.isEmpty || info.get.bitsPerSample != 16 || info.get.numChannels != 1)
      return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= b.length) {
      val id = ascii(off, 4)
      val size = buf.getInt(off + 4)
      if (size < 0 || off.toLong + 8 + size > b.length) return None
      if (id == "data") {
        val n = size / 2
        var i = 0; var energy = 0L; var zc = 0L; var prevNonNeg = true
        while (i < n) {
          val s = buf.getShort(off + 8 + 2 * i).toLong
          energy += s * s
          val nonNeg = s >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          i += 1
        }
        return Some((n.toLong, energy, zc))
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Deterministic SIGNAL corpus for [[wavSampleStats]]: sample i of
    * doc `id` is `((id·31 + i·17) mod 65536) − 32768` — an oracle
    * replays energy and zero-crossings per-sample. */
  def synthWavSignalCorpus(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val nFrames = (120 + id % 40).toInt
      val samples = Array.tabulate(nFrames)(i =>
        (((id * 31 + i * 17) % 65536) - 32768).toShort)
      (id, wavBytes(16000, 1, samples))
    }.toDF(idCol, "payload")
  }

  case class WavSignalStats(doc_id: Long, n_samples: Long, energy: Long,
                            zero_crossings: Long, rms: Double)

  /** Distributed PCM16 feature pass ([[decodeMeta]] shape, full sample
    * scan inside the partition loop). Pipeline-owned encodes: an
    * undecodable payload fails the job, never nulls. */
  def wavFeatureStats(spark: SparkSession, docs: DataFrame,
                      idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[WavSignalStats]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val (n, energy, zc) = wavSampleStats(r.getAs[Array[Byte]](1)).getOrElse(
            throw new IllegalStateException(s"undecodable WAV payload for id $id"))
          WavSignalStats(id, n, energy, zc,
            math.sqrt(energy.toDouble / n.toDouble))
        }
      }(enc)
      .toDF()
  }

  /**
   * Leading-grid ENVELOPE FINGERPRINT of a mono PCM16 WAV: the first
   * `nWindows · windowLen` samples are cut into `nWindows` windows,
   * window w sets bit w iff its exact integer energy exceeds the grid
   * mean — cross-multiplied (`energy_w · nWindows > Σ energies`), so no
   * division and no floats anywhere. The sketch hears the amplitude
   * PROFILE, which survives the two transforms audio re-encoders apply
   * that byte hashes can't see through: header relabeling (sample-rate
   * remark) and tail padding/truncation past the grid. None when
   * undecodable, not mono 16-bit, or shorter than the grid.
   */
  def wavEnvelopeBits(b: Array[Byte], nWindows: Int, windowLen: Int): Option[Long] = {
    require(nWindows >= 1 && nWindows <= 63 && windowLen >= 1,
      s"wavEnvelopeBits: bad grid ($nWindows × $windowLen)")
    val info = parseWav(b)
    if (info.isEmpty || info.get.bitsPerSample != 16 || info.get.numChannels != 1)
      return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= b.length) {
      val id = ascii(off, 4)
      val size = buf.getInt(off + 4)
      if (size < 0 || off.toLong + 8 + size > b.length) return None
      if (id == "data") {
        val need = nWindows * windowLen
        if (size / 2 < need) return None
        val energies = Array.fill(nWindows)(0L)
        var i = 0
        while (i < need) {
          val s = buf.getShort(off + 8 + 2 * i).toLong
          energies(i / windowLen) += s * s
          i += 1
        }
        val total = energies.sum
        var fp = 0L; var w = 0
        while (w < nWindows) {
          if (energies(w) * nWindows > total) fp |= 1L << w
          w += 1
        }
        return Some(fp)
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Per-sample signal for [[synthWavNearDupCorpus]]: md5("id_i")'s
    * first 16 bits, shifted to int16. NONLINEAR by construction — both
    * cheaper schemes failed measurably: [[synthWavSignalCorpus]]'s
    * linear ramp drifts ~1.6k counts across the grid (every window
    * equal energy → every fingerprint 0 → all C(n,2) pairs "matched"),
    * and a Knuth multiplicative hash is still linear mod 2¹⁶ (every doc
    * = the same wrapped ramp at a different phase → correlated
    * envelopes, 7.7% of pairs inside Hamming 2). md5 makes window
    * energies independent across docs; the DuckDB mirror replays the
    * identical digest. */
  def nearDupSample(id: Long, i: Int): Short = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${id}_$i".getBytes("US-ASCII"))
    val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    (v - 32768).toShort
  }

  /** Near-dup WAV corpus: per doc a [[nearDupSample]] signal (16 kHz,
    * 120 + id%40 frames); every id%5==0 doc additionally gets a
    * RE-ENCODED copy at `maxId+1 + id` — same leading samples, 8 kHz
    * header relabel, 16 extra tail frames (the signal formula
    * continued) — byte-different but envelope-identical, the planted
    * truth [[wavEnvelopeBits]] banding must recover. */
  def synthWavNearDupCorpus(spark: SparkSession, docs: DataFrame,
                            idCol: String): DataFrame = {
    import spark.implicits._
    val off = docs.agg(coalesce(max(col(idCol)), lit(0L))).head.getLong(0) + 1
    docs.select(col(idCol).cast(LongType)).as[Long].flatMap { id =>
      val nBase = (120 + id % 40).toInt
      val base = (id, wavBytes(16000, 1,
        Array.tabulate(nBase)(nearDupSample(id, _))))
      if (id % 5 == 0)
        Seq(base, (off + id, wavBytes(8000, 1,
          Array.tabulate(nBase + 16)(nearDupSample(id, _)))))
      else Seq(base)
    }.toDF(idCol, "payload")
  }

  /** Distributed envelope-fingerprint pass (the [[wavFeatureStats]]
    * shape): `(id, fp)` per payload; pipeline-owned encodes, so an
    * undecodable payload fails the job rather than nulling. */
  def wavEnvelopePass(spark: SparkSession, docs: DataFrame, idCol: String,
                      payloadCol: String, nWindows: Int, windowLen: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .map { r: Row =>
        val id = r.getLong(0)
        val fp = wavEnvelopeBits(r.getAs[Array[Byte]](1), nWindows, windowLen)
          .getOrElse(throw new IllegalStateException(
            s"undecodable/short WAV payload for id $id"))
        (id, fp)
      }.toDF(idCol, "fp")
  }

  /** Leading-grid WINDOW ENERGIES of a mono PCM16 WAV — the
    * [[wavEnvelopeBits]] decode without the bitmask reduction: the raw
    * per-window exact integer Σs² the VAD segmentation thresholds.
    * None when undecodable, not mono 16-bit, or shorter than the grid. */
  def wavWindowEnergies(b: Array[Byte], nWindows: Int,
                        windowLen: Int): Option[Array[Long]] = {
    require(nWindows >= 1 && windowLen >= 1,
      s"wavWindowEnergies: bad grid ($nWindows × $windowLen)")
    val info = parseWav(b)
    if (info.isEmpty || info.get.bitsPerSample != 16 || info.get.numChannels != 1)
      return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= b.length) {
      val id = ascii(off, 4)
      val size = buf.getInt(off + 4)
      if (size < 0 || off.toLong + 8 + size > b.length) return None
      if (id == "data") {
        val need = nWindows * windowLen
        if (size / 2 < need) return None
        val energies = Array.fill(nWindows)(0L)
        var i = 0
        while (i < need) {
          val s = buf.getShort(off + 8 + 2 * i).toLong
          energies(i / windowLen) += s * s
          i += 1
        }
        return Some(energies)
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Distributed window-energy pass: one `(id, w, e)` row per grid
    * window per payload (real RIFF decode inside the partition loop;
    * pipeline-owned encodes fail the job, never null). */
  def wavWindowEnergyRows(spark: SparkSession, docs: DataFrame, idCol: String,
                          payloadCol: String, nWindows: Int,
                          windowLen: Int): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .flatMap { r: Row =>
        val id = r.getLong(0)
        val es = wavWindowEnergies(r.getAs[Array[Byte]](1), nWindows, windowLen)
          .getOrElse(throw new IllegalStateException(
            s"undecodable/short WAV payload for id $id"))
        es.iterator.zipWithIndex.map { case (e, w) => (id, w.toLong, e) }
      }.toDF(idCol, "w", "e")
  }

  /** Per-window VOICED gate for [[synthWavVadCorpus]]: md5("id_w<w>")'s
    * first nibble ≥ 8 — a fair deterministic coin per (doc, window),
    * replayed in SQL as `substr(md5(...), 1, 1) >= '8'` (hex chars
    * 8..f sort above 0..7 in ASCII). */
  def vadVoiced(id: Long, w: Int): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${id}_w$w".getBytes("US-ASCII"))
    (d(0) & 0xff) >= 0x80
  }

  /** Per-sample signal for [[synthWavVadCorpus]]: [[nearDupSample]]'s
    * md5 noise, AMPLITUDE-MODULATED by the window's voiced gate —
    * voiced windows carry the full int16 range, silent windows only
    * the digest's low byte (−128..127, a ~2¹⁴× energy drop), so an
    * energy threshold separates them with no tuning. The silent branch
    * is `(v mod 256) − 128` on the NON-NEGATIVE 16-bit word, so `%`
    * agrees across Scala/Spark/DuckDB. */
  def vadSample(id: Long, i: Int, windowLen: Int): Short = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${id}_$i".getBytes("US-ASCII"))
    val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    if (vadVoiced(id, i / windowLen)) (v - 32768).toShort
    else ((v % 256) - 128).toShort
  }

  /** Speech-shaped VAD corpus: 96 samples (24 × 4 grid) of
    * [[vadSample]] per doc — alternating voiced/silent stretches a
    * segmentation must recover; real 16 kHz mono PCM16 RIFF bytes. */
  def synthWavVadCorpus(spark: SparkSession, docs: DataFrame,
                        idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      (id, wavBytes(16000, 1, Array.tabulate(96)(vadSample(id, _, 4))))
    }.toDF(idCol, "payload")
  }
}
