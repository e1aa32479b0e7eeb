package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming operators over the `events` table
 * (event_id, ts, user_id, event_type, value, props).
 *
 * The reference is batch-only (SURVEY.md §1.4); these demonstrate the
 * engine's streaming surface: watermarked tumbling-window aggregation
 * driven to completion over the file source, with a batch-equivalent
 * DuckDB oracle (the windowed result of a bounded stream equals the
 * batch GROUP BY).
 */
object StreamOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /**
   * 5-minute tumbling windows per event_type with a 10-minute
   * watermark, executed as a real streaming query in APPEND mode to a
   * parquet FILE sink — the scale-correct shape: state for a window is
   * emitted once the watermark passes and then DROPPED, so neither
   * executor state nor any driver structure grows with the number of
   * distinct windows (a `complete`+memory-sink variant would hold all
   * windows forever). `value` is summed in exact cents (round half-up
   * per row) so results hash-match the oracle.
   *
   * The bounded file source never advances the watermark past the last
   * batch, so rows still buffered at end-of-input are flushed with one
   * final max-timestamp nudge row (filtered back out of the result) —
   * the standard trick for draining append-mode windows in a finite
   * test stream.
   */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // the streaming file source wants a directory; stage a symlink
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("part-00000.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(dir.toString)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_epoch"),
        col("event_type"), col("n"), col("value_cents"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckptDir.toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // drain: push the watermark past every real window with one far-
    // future row, process, then drop its window from the result
    val maxEpoch = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val nudge = spark.sql(
      s"""SELECT CAST(-1 AS BIGINT) AS event_id,
         timestamp_seconds(${maxEpoch + 3600}) AS ts,
         CAST(-1 AS BIGINT) AS user_id, '__drain__' AS event_type,
         CAST(0.0 AS DOUBLE) AS value, '' AS props""")
    nudge.coalesce(1).write.mode("append").parquet(dir.toString)
    val q2 = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckptDir.toString)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(outDir.toString)
      .filter(col("event_type") =!= "__drain__")
  }
}
