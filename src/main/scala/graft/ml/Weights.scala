package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.EntryStages
import graft.eval.Metrics
import graft.sim.{RLTransE, Scorer}

/**
 * Learned per-column weights over RAW similarity scores — the engine
 * analogue of the reference's VEER and WERL record scorers:
 *
 * - VEER learns one weight per compared column over value-embedding
 *   distances and predicts via sigmoid(weighted sum)
 *   (/root/reference/veer.py:79-86): here the columns are the raw
 *   (jw, lev, cos) similarity channels of the flagship scorer, and the
 *   weights come from MLlib logistic regression with a fixed seed —
 *   a deterministic, distributed drop-in for the TF sigmoid trainer.
 * - WERL learns per-column weights over FIXED pre-trained embedding
 *   distances (/root/reference/werl.py:58-68): here the columns are
 *   RLTransE's per-field translated-cosine distances, embeddings
 *   frozen, only the combination learned.
 *
 * Both report their weights in integer micro-units (deterministic
 * export) and their test-split pair metrics.
 */
object Weights {

  final val VeerFeatures = Seq("jw", "lev", "cos")

  private def veerScored(spark: SparkSession, sfDir: String): DataFrame =
    Scorer.scoreDF(EntryStages.cand(spark, sfDir),
      Scorer.broadcastProjection(spark))

  private def withVec(df: DataFrame, feats: Seq[String]): DataFrame =
    df.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(
        array(feats.map(f => col(f).cast("double")): _*)))
      .withColumn("label_d", col("label").cast("double"))

  private def fitLr(train: DataFrame) =
    new LogisticRegression()
      .setLabelCol("label_d").setFeaturesCol("features")
      .setMaxIter(100).setRegParam(0.001).setTol(1e-9)
      .fit(train)

  /** (feature, weight_micros) rows + the intercept row. */
  private def weightRows(spark: SparkSession, feats: Seq[String],
                         coefs: Array[Double], intercept: Double): DataFrame = {
    import spark.implicits._
    (feats.zip(coefs).map { case (f, w) =>
      (f, math.round(w * 1000000)) } :+
      ("intercept", math.round(intercept * 1000000)))
      .toDF("feature", "weight_micros")
  }

  /** VEER: learned weights over the raw (jw, lev, cos) channels. */
  def veerWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = veerScored(spark, sfDir)
    val train = withVec(scored.filter(col("split_a") === "train" &&
      col("split_b") === "train"), VeerFeatures)
    val m = fitLr(train)
    weightRows(spark, VeerFeatures, m.coefficients.toArray, m.intercept)
  }

  /** VEER metrics: test F1 with the learned weighted combination —
    * must not fall below the fixed-weight flagship. */
  def veerMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = veerScored(spark, sfDir).persist()
    val train = withVec(scored.filter(col("split_a") === "train" &&
      col("split_b") === "train"), VeerFeatures)
    val m = fitLr(train)
    val test = m.transform(withVec(scored.filter(col("split_a") === "test" &&
      col("split_b") === "test"), VeerFeatures))
    val out = Metrics.pairMetrics(test,
      (col("prediction") === 1.0).cast("int"), col("label"))
    out.collect() // materialize before unpersist
    scored.unpersist()
    out
  }

  final val WerlFeatures: Seq[String] = RLTransE.ScoredRels.map(r => s"f_$r")

  /** WERL: weights over FROZEN RLTransE per-field distances. Memoized
    * per (session, sfDir): round 2's harness retrained the full
    * RLTransE + logistic stack once per registered query (werl_weights
    * AND werl_metrics); one fit now serves both, and the metrics row is
    * materialized into a local DataFrame so later actions on it can't
    * re-trigger the scoring lineage. */
  def werlWeightsAndMetrics(spark: SparkSession, sfDir: String):
      (DataFrame, DataFrame) =
    graft.EntryStages.memoModel(spark, sfDir, "werl") {
      val model = RLTransE.train(spark, sfDir)
      val fields = RLTransE.fieldScores(spark, sfDir, model, testOnly = false)
        .persist()
      val train = withVec(fields.filter(col("split_a") === "train" &&
        col("split_b") === "train"), WerlFeatures)
      val m = fitLr(train)
      val test = m.transform(withVec(fields.filter(col("split_a") === "test" &&
        col("split_b") === "test"), WerlFeatures))
      val metrics = Metrics.pairMetrics(test,
        (col("prediction") === 1.0).cast("int"), col("label"))
      val rows = metrics.collect()
      fields.unpersist()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), metrics.schema)
      (weightRows(spark, WerlFeatures, m.coefficients.toArray, m.intercept),
        local)
    }

  def werlWeights(spark: SparkSession, sfDir: String): DataFrame =
    werlWeightsAndMetrics(spark, sfDir)._1

  def werlMetrics(spark: SparkSession, sfDir: String): DataFrame =
    werlWeightsAndMetrics(spark, sfDir)._2
}
