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

  /** Attach a binary payload column (here derived from text — the test
    * corpus has no real blobs) plus the metadata struct, decoded in
    * batched partition passes. */
  def decodeMeta(spark: SparkSession, docs: DataFrame,
                 idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        // per-partition init of the (stub) decoder happens HERE, once
        rows.map { r: Row => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)) }
      }(enc)
      .toDF()
  }

  case class AudioMeta(
      doc_id: Long,
      n_samples: Long,
      sample_rate: Int,
      duration_s: Double,
      peak: Int)

  /** STUB audio decoder: PCM16-shaped deterministic pseudo-features
    * from the payload bytes (2 bytes/sample; fake rate ∈ {8,16,24} kHz).
    * Replace at the marked line with a real parser (wav header / ffprobe). */
  def fakeAudioDecode(id: Long, payload: Array[Byte]): AudioMeta = {
    val len = payload.length.toLong
    // ??? real audio header parse goes here
    val nSamples = len / 2
    val rate = (8000L * (1 + len % 3)).toInt
    AudioMeta(id, nSamples, rate, nSamples.toDouble / rate,
      (math.abs(len * 2654435761L) % 32768).toInt)
  }

  /** Audio-column analogue of [[decodeMeta]]: same batched
    * mapPartitions plumbing, audio-shaped metadata struct. */
  def audioFeats(spark: SparkSession, docs: DataFrame,
                 idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[AudioMeta]
    docs.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .mapPartitions { rows =>
        rows.map { r: Row => fakeAudioDecode(r.getLong(0), r.getAs[Array[Byte]](1)) }
      }(enc)
      .toDF()
  }
}
