package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FnvMixFunctions.fnv_mix

/**
 * Deterministic stratified sampling over the documents table — the
 * training-data-pipeline primitive for rebalancing a corpus by
 * stratum (here: language) with exact, auditable, reproducible rates.
 *
 * Each document draws a uniform u20 (20-bit) value from the seeded
 * FNV-1a mix of its doc_id — a pure function of the row key, so the
 * sample is identical across runs, partitionings and cluster sizes —
 * and is kept iff the draw falls under its stratum's keep-rate (in
 * 2^-20 units; a power-of-two denominator makes the gate one bitmask,
 * no modulo). The filter is a single codegen'd scalar on the scan:
 * no shuffle, no state, embarrassingly parallel at any scale, and the
 * per-stratum rate table ships inside the plan as a literal CASE
 * (strata are few; a data-sized rate table would broadcast-join).
 *
 * The reference has no sampling operator (its FEBRL/census fixtures
 * are pre-sized); this extends the engine for LLM-corpus curation
 * where per-language rebalancing is routine.
 */
object Sample {

  final val RateBits = 20
  final val RateOne: Long = 1L << RateBits // keep-all
  /** Seed for the draw stream; a different salt = an independent
    * resample of the same corpus. */
  final val Salt = 77L

  /** Per-language keep rates in 2^-20 units: downsample the English
    * head to 25%, keep 75% of the other major strata, 50% default. */
  final val DefaultRateU20: Long = 1L << 19
  final val Rates: Seq[(String, Long)] = Seq(
    "en" -> (1L << 18),
    "fr" -> (3L << 18), "es" -> (3L << 18),
    "de" -> (3L << 18), "zh" -> (3L << 18))

  private def drawCol = fnv_mix(col("doc_id"), lit(Salt))
    .bitwiseAND(lit(RateOne - 1))

  private def rateCol = Rates.foldLeft(lit(DefaultRateU20)) {
    case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
  }

  /** Kept documents with their draw (exported for auditability: the
    * gate is re-checkable row by row downstream). */
  def stratified(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Scan.parquet(spark, s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), drawCol.as("draw_u20"))
      .filter(col("draw_u20") < rateCol)

  /** Per-stratum audit: configured rate, population, kept count —
    * one map-side-combined aggregation over the scan. */
  def strataStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Scan.parquet(spark, s"$sfDir/documents.parquet")
      .select(col("lang"), drawCol.as("draw"), rateCol.as("rate_u20"))
      .groupBy("lang")
      .agg(max("rate_u20").as("rate_u20"),
        count(lit(1)).as("n_total"),
        sum(when(col("draw") < col("rate_u20"), 1L).otherwise(0L))
          .as("n_kept"))
      .orderBy("lang")
}
