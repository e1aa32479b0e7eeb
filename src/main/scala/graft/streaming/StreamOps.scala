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
   * watermark, executed as a real streaming query (file source ->
   * memory sink, processAllAvailable). `value` is summed in exact
   * cents (round half-up per row) so results hash-match the oracle.
   */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val qName = s"graft_win_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // the streaming file source wants a directory; stage a symlink
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("part-00000.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
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
      .outputMode("complete")
      .format("memory")
      .queryName(qName)
      .start()
    try q.processAllAvailable() finally q.stop()
    // materialize before the in-memory sink table goes away
    val rows = spark.table(qName).collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), spark.table(qName).schema)
  }
}
