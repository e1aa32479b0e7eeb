package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Embed

/**
 * Multimodal-column plumbing: treat media payloads as opaque `binary`
 * columns with typed metadata, processed in batched `mapPartitions`
 * (the Scala analogue of pandas-UDF/mapInPandas batch processing).
 *
 * No image/audio codecs ship in this container, so the DECODE step is
 * a clearly-marked deterministic STUB ([[stubDecode]]) — the Spark-side
 * plumbing (binary schema, metadata struct, batch iteration, feature
 * schema, partition-level batching) is real and tested. Swap
 * `stubDecode` for a JNI/codec call in production.
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

  /**
   * STUB decoder: stands in for image/audio decoding (no codec libs in
   * this sandbox). Deterministic byte-histogram "features" — replace
   * with a real decoder at the marked point.
   */
  def stubDecode(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    // ??? <- real codec goes here (e.g. JPEG decode + CNN features);
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

  /** Frame-sampling stub: every k-th byte — the batch/partition shape
    * of real frame extraction. */
  def sampleFrames(payload: Array[Byte], k: Int = 16): Array[Byte] =
    payload.indices.collect { case i if i % k == 0 => payload(i) }.toArray

  /** Oracle-checkable metadata pass: byte length + md5 of payload. */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("meta.kind").as("kind"),
      col("meta.width").cast("long").as("width"),
      col("meta.height").cast("long").as("height"))

  /** Batched decode -> features over the binary column (rows-only). */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
    media.mapPartitions { batch =>
      // partition == batch: decode amortizes any per-batch init cost
      batch.map { case (id, payload, kind) =>
        val feats = stubDecode(payload)
        val frames = sampleFrames(payload)
        (id, kind, feats.length, frames.length,
          math.round(feats.map(f => f.toDouble * f).sum * 1000000))
      }
    }.toDF("doc_id", "kind", "feat_dim", "n_frames", "feat_norm_micros")
  }
}
