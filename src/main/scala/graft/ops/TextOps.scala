package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline,
 * over the driver's `documents` table (doc_id, text, lang, source,
 * n_chars). All pure Column expressions (whole-stage codegen; filters
 * and projections push into the parquet scan) with DuckDB oracles.
 */
object TextOps {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Scan.parquet(spark, s"$sfDir/documents.parquet")

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Language marker tokens (heuristic n-gram/stopword language ID). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "que"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "zh" -> Seq("de", "shi", "le"))

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t)))
      .cast("long")

  /** Per-doc quality facts: token counts, lengths, ratios, score. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    val t = toks(col("text"))
    d.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("len_chars"),
      aggregate(transform(t, x => length(x).cast("long")), lit(0L), _ + _)
        .as("sum_token_len"),
      countIn(t, Stopwords).as("n_stopwords"),
      size(split(col("text"), "[^a-z0-9\\s]")).cast("long").minus(1L)
        .as("n_punct"))
    .withColumn("avg_token_len", col("sum_token_len") / col("n_tokens"))
    .withColumn("stopword_ratio", col("n_stopwords") / col("n_tokens"))
    .withColumn("punct_ratio", col("n_punct") / col("len_chars"))
    .withColumn("quality_score",
      when(col("n_tokens") >= 10 && col("n_tokens") <= 2000, 1.0)
        .otherwise(0.5) * (lit(1.0) - col("stopword_ratio") * 0.5))
  }

  /** Heuristic language ID: argmax of marker-token counts, fixed
    * tie-break order; compared against the labeled `lang`. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    val t = toks(col("text"))
    val scored = d.select(
      (Seq(col("doc_id"), col("lang")) ++
        LangMarkers.map { case (l, ws) => countIn(t, ws).as(s"s_$l") }): _*)
    val langs = LangMarkers.map(_._1)
    // first language (in declaration order) achieving the max score
    val maxScore = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit("unknown")) { (l, acc) =>
      when(col(s"s_$l") === maxScore, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
      .withColumn("is_correct",
        (col("pred_lang") === col("lang")).cast("long"))
      .select("doc_id", "lang", "pred_lang", "is_correct")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    d.select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
        .cast("long").as("bpe_ish_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"))
  }

  /** Document fingerprinting: whole-text md5 + min 5-token-shingle md5
    * (the deterministic rolling-fingerprint analogue). */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    val t = toks(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    val nShingles = greatest(size(t) - 4, lit(1))
    d.select(
      col("doc_id"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("md5_full"),
      array_min(transform(sequence(lit(1), nShingles),
        i => md5(concat_ws(" ", slice(t, i, lit(5)))))).as("min_shingle_md5"))
  }
}
