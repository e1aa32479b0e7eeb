package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.EntryStages
import graft.eval.Metrics

/**
 * Fellegi-Sunter-style pairwise match classifiers over binary
 * comparator features, mirroring the reference's three baselines:
 * ECM (unsupervised EM, /root/reference/tests/fs/test_ecm_classifier.py),
 * supervised logistic regression
 * (/root/reference/tests/fs/test_logistic_regression.py), and k-means
 * k=2 (/root/reference/tests/fs/test_kmeans_clustering.py).
 *
 * Features (binary, per candidate pair): exact content equality and
 * thresholded JW/Levenshtein comparators — the engine analogue of the
 * reference's 6-comparator census set (JW@0.85 + exact,
 * /root/reference/data/census.py:140-168).
 */
object Classifiers {

  final val NFeatures = 5

  /** Adds f0..f4 binary features and the packed `pattern` in [0, 32). */
  def withFeatures(scoredp: DataFrame): DataFrame =
    scoredp
      .withColumn("f0", (col("content_a") === col("content_b")).cast("int"))
      .withColumn("f1", (col("jw") >= 0.85).cast("int"))
      .withColumn("f2", (col("lev") >= 0.9).cast("int"))
      .withColumn("f3", (col("jw") >= 0.95).cast("int"))
      .withColumn("f4", (col("lev") >= 0.75).cast("int"))
      .withColumn("pattern",
        (col("f0") * 16 + col("f1") * 8 + col("f2") * 4 + col("f3") * 2 +
          col("f4")).cast("int"))

  /** EM result: per-pattern posterior match probability. */
  final case class EcmModel(p: Double, m: Array[Double], u: Array[Double]) {
    def posterior(pattern: Int): Double = {
      var pm = p
      var pu = 1 - p
      var i = 0
      while (i < NFeatures) {
        val bit = (pattern >> (NFeatures - 1 - i)) & 1
        pm *= (if (bit == 1) m(i) else 1 - m(i))
        pu *= (if (bit == 1) u(i) else 1 - u(i))
        i += 1
      }
      if (pm + pu == 0) 0.0 else pm / (pm + pu)
    }
  }

  /**
   * ECM: expectation-maximization over the (tiny) histogram of binary
   * feature patterns — the EM loop runs driver-side over <= 32
   * aggregated counts (one distributed groupBy), exactly the right
   * split of work at any scale (/root/reference cites
   * recordlinkage.ECMClassifier; iterations fixed for determinism).
   */
  /** Fixed EM iteration count, single-sourced with the DuckDB oracle
    * (OracleSql.EcmIters) so BOTH engines run the identical number of
    * M-steps — no freeze-point assumption needed for the compare. 120
    * is past the measured bit-exact freeze at every gated SF (6 at
    * sf0.001, 84 at sf0.01) and is what DuckDB's parser depth allows
    * when unrolled. */
  final val EcmFitIters = 120

  def fitEcm(features: DataFrame, iters: Int = EcmFitIters): EcmModel = {
    val hist = features.groupBy("pattern").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map(_._2).sum.toDouble
    var p = 0.1
    var m = Array.fill(NFeatures)(0.9)
    var u = Array.fill(NFeatures)(0.1)
    var it = 0
    while (it < iters) {
      val model = EcmModel(p, m, u)
      // E-step: weight per pattern; M-step accumulators
      var wSum = 0.0
      val mNum = Array.fill(NFeatures)(0.0)
      val uNum = Array.fill(NFeatures)(0.0)
      var uSum = 0.0
      hist.foreach { case (pat, n) =>
        val w = model.posterior(pat)
        wSum += w * n
        uSum += (1 - w) * n
        var i = 0
        while (i < NFeatures) {
          val bit = (pat >> (NFeatures - 1 - i)) & 1
          if (bit == 1) { mNum(i) += w * n; uNum(i) += (1 - w) * n }
          i += 1
        }
      }
      p = math.min(math.max(wSum / total, 1e-9), 1 - 1e-9)
      var i = 0
      while (i < NFeatures) {
        m(i) = math.min(math.max(mNum(i) / wSum, 1e-9), 1 - 1e-9)
        u(i) = math.min(math.max(uNum(i) / uSum, 1e-9), 1 - 1e-9)
        i += 1
      }
      it += 1
    }
    EcmModel(p, m, u)
  }

  /** Per-pattern table: n, posterior (micro-units), predicted flag. */
  def ecmPatterns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = withFeatures(EntryStages.scoredp(spark, sfDir))
    val model = fitEcm(feats)
    val hist = feats.groupBy("pattern").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    hist.map { case (pat, n) =>
      val post = model.posterior(pat)
      (pat, n, math.round(post * 1000000), if (post >= 0.5) 1L else 0L)
    }.toSeq.toDF("pattern", "n", "posterior_micros", "predicted_match")
  }

  /** ECM predictions evaluated against truth on the test split. */
  def ecmMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = withFeatures(EntryStages.scoredp(spark, sfDir))
    val model = fitEcm(feats)
    val matchPatterns = (0 until (1 << NFeatures))
      .filter(p => model.posterior(p) >= 0.5)
    val predicted = col("pattern").isin(matchPatterns: _*).cast("int")
    Metrics.pairMetrics(EntryStages.testPairs(feats), predicted, col("label"))
  }

  private def withVec(features: DataFrame): DataFrame =
    features.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(array(
        (0 to 4).map(i => col(s"f$i").cast("double")): _*)))

  /** Supervised logistic regression (MLlib): train split -> test F1. */
  def logRegMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = withFeatures(EntryStages.scoredp(spark, sfDir))
    val train = withVec(EntryStages.trainPairs(feats))
      .withColumn("label_d", col("label").cast("double"))
    val lr = new LogisticRegression()
      .setLabelCol("label_d").setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.01).setTol(1e-9)
    val modelFit = lr.fit(train)
    val test = modelFit.transform(withVec(EntryStages.testPairs(feats)))
    Metrics.pairMetrics(test, (col("prediction") === 1.0).cast("int"),
      col("label"))
  }

  /** Unsupervised k-means (k=2, fixed seed); match cluster = the one
    * whose centroid is closer to the all-ones vector. */
  def kmeansMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = withFeatures(EntryStages.scoredp(spark, sfDir))
    val all = withVec(feats)
    val km = new KMeans().setK(2).setSeed(42L).setMaxIter(100)
      .setFeaturesCol("features")
    val model = km.fit(all)
    val ones = Vectors.dense(Array.fill(NFeatures)(1.0))
    val matchCluster = model.clusterCenters.zipWithIndex
      .minBy { case (c, _) => Vectors.sqdist(c, ones) }._2
    val test = model.transform(withVec(EntryStages.testPairs(feats)))
    Metrics.pairMetrics(test,
      (col("prediction") === matchCluster).cast("int"), col("label"))
  }
}
