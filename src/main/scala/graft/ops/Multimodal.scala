package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Embed

/**
 * Multimodal-column plumbing: media payloads as opaque `binary`
 * columns with typed metadata, processed in batched `mapPartitions`
 * (the Scala analogue of pandas-UDF/mapInPandas batch processing).
 *
 * The decode step is REAL for two container formats with pure-JVM
 * parsers — BMP (24bpp uncompressed, bottom-up rows, 4-byte stride
 * padding) and WAV (RIFF/fmt/data chunk walk, PCM16) — over payloads
 * synthesized deterministically per doc_id, so an encode -> decode
 * roundtrip is verifiable against a closed-form DuckDB oracle: if the
 * header/stride/chunk parsing is wrong, the decoded stats can't match
 * the arithmetic the oracle computes. Formats with no sandbox codec
 * (video) keep the clearly-marked stub path ([[stubDecode]]).
 */
object Multimodal {

  /** Simulated media table: payload = utf-8 bytes of the doc text,
    * metadata = (kind, fake width/height derived from doc_id). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height")).as("meta"))

  // ---- deterministic synthetic encoders (payload generators) ----

  /** BMP geometry/pixels are pure functions of doc_id (the oracle
    * recomputes the same arithmetic without parsing bytes). */
  def bmpWidth(docId: Long): Int = (docId % 4 + 4).toInt
  final val BmpHeight = 4
  def bmpPixel(docId: Long, i: Long): Int = ((docId * 3 + i) % 256).toInt

  /** Minimal 24bpp uncompressed BMP: BITMAPFILEHEADER (14) +
    * BITMAPINFOHEADER (40) + bottom-up pixel rows padded to 4 bytes. */
  def makeBmp(docId: Long): Array[Byte] = {
    val w = bmpWidth(docId); val h = BmpHeight
    val stride = (w * 3 + 3) / 4 * 4
    val dataSize = stride * h
    val size = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    // rows stored bottom-up; logical pixel byte i is row-major top-down
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w * 3) {
        b.put(bmpPixel(docId, y.toLong * w * 3 + x).toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < stride) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  /** WAV parameters/samples are pure functions of doc_id. */
  def wavSampleRate(docId: Long): Int = (8000 + (docId % 8) * 1000).toInt
  final val WavSamples = 32
  def wavSample(docId: Long, i: Int): Short =
    ((docId * 7 + i.toLong * 13) % 2048 - 1024).toShort

  /** Minimal RIFF/WAVE: fmt chunk (PCM16 mono) + data chunk. */
  def makeWav(docId: Long): Array[Byte] = {
    val dataSize = WavSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sr = wavSampleRate(docId)
    b.put("RIFF".getBytes("ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("ASCII"))
    b.put("fmt ".getBytes("ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
    b.put("data".getBytes("ASCII")).putInt(dataSize)
    var i = 0
    while (i < WavSamples) { b.putShort(wavSample(docId, i)); i += 1 }
    b.array()
  }

  // ---- pure-JVM decoders (the REAL decode step) ----

  /** Parse a 24bpp uncompressed BMP: returns (width, height, sum of
    * logical pixel bytes). Honors the pixel-array offset, bottom-up
    * row order and the 4-byte row stride. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Long) = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B'.toByte && b.get(1) == 'M'.toByte, "not a BMP")
    val pixelOff = b.getInt(10)
    val w = b.getInt(18)
    val h = b.getInt(22)
    require(b.getShort(28) == 24, "not 24bpp")
    val stride = (w * 3 + 3) / 4 * 4
    var sum = 0L
    var y = 0
    while (y < h) {
      // row y (top-down logical) is stored at bottom-up position
      val rowOff = pixelOff + (h - 1 - y) * stride
      var x = 0
      while (x < w * 3) { sum += bytes(rowOff + x) & 0xff; x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  /** Walk RIFF chunks, parse fmt + data: returns (sampleRate,
    * nSamples, sum of |PCM16 sample|). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Long) = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int) = new String(bytes, off, 4, "ASCII")
    require(fourCC(0) == "RIFF" && fourCC(8) == "WAVE", "not a WAV")
    var off = 12
    var sampleRate = 0
    var bitsPerSample = 16
    var nSamples = 0
    var sumAbs = 0L
    while (off + 8 <= bytes.length) {
      val id = fourCC(off)
      val size = b.getInt(off + 4)
      if (id == "fmt ") {
        sampleRate = b.getInt(off + 12)
        bitsPerSample = b.getShort(off + 22).toInt
      } else if (id == "data") {
        require(bitsPerSample == 16, "not PCM16")
        nSamples = size / 2
        var i = 0
        while (i < nSamples) {
          sumAbs += math.abs(b.getShort(off + 8 + i * 2).toLong)
          i += 1
        }
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    (sampleRate, nSamples, sumAbs)
  }

  /**
   * STUB decoder for formats with no sandbox codec (video): stands in
   * for a frame decode and IS the video path of [[decodeFeatures]].
   * Deterministic byte-histogram "features" — replace with a real
   * codec at the marked point.
   */
  def stubDecode(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    // ??? <- real codec goes here (e.g. H.264 frame decode + CNN);
    // deterministic fake below keeps the pipeline shape testable.
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    Embed.l2normalize(out)
    out
  }

  /** Media table with REAL container payloads: BMP bytes for image
    * rows, WAV bytes for audio rows, raw utf-8 text for video (opaque
    * stub tier). */
  def mediaBinaryTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TextOps.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => makeBmp(id)
          case "audio" => makeWav(id)
          case _ => text.getBytes("UTF-8")
        }
        (id, kind, payload)
      }).toDF("doc_id", "kind", "payload")
  }

  /** Oracle-checkable metadata pass: byte length + md5 of payload. */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.kind").as("kind"),
      col("meta.width").cast("long").as("width"),
      col("meta.height").cast("long").as("height"))

  /**
   * Batched decode over the binary column: REAL header/chunk parsing
   * for BMP/WAV, stub byte stats for video. Output is uniform
   * (doc_id, kind, dim1, dim2, stat):
   *  - image: (width, height, sum of pixel bytes)
   *  - audio: (sample rate, n samples, sum |sample|)
   *  - video: (0, stub embedding dim, payload byte count) — the stub
   *    tier runs [[stubDecode]] for real (its histogram mass equals
   *    the byte count, which is what the oracle checks)
   * Every stat is a closed-form function of doc_id, so the DuckDB
   * oracle verifies the decode roundtrip bit-for-bit.
   */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaBinaryTable(spark, sfDir)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // partition == batch: decode amortizes any per-batch init cost
        batch.map { case (id, kind, payload) =>
          val (d1, d2, stat) = kind match {
            case "image" =>
              val (w, h, sum) = decodeBmp(payload)
              (w.toLong, h.toLong, sum)
            case "audio" =>
              val (sr, n, sumAbs) = decodeWav(payload)
              (sr.toLong, n.toLong, sumAbs)
            case _ =>
              val emb = stubDecode(payload)
              (0L, emb.length.toLong, payload.length.toLong)
          }
          (id, kind, d1, d2, stat)
        }
      }.toDF("doc_id", "kind", "dim1", "dim2", "stat")
  }
}
