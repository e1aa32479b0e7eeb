package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ckpt.Checkpoint
import graft.eval.Metrics
import graft.gen.Synth
import graft.pipe.{Blocking, Cluster, Normalize, Threshold}
import graft.sim.Scorer

/**
 * The flagship end-to-end linkage pipeline (SURVEY.md §7.2, mirroring
 * the reference's census RLTransE entry point, §3.3):
 *
 *   synth records -> normalize + sha -> block keys -> salted candidate
 *   join -> mapPartitions scoring (JW + Levenshtein + broadcast-matrix
 *   cosine) -> threshold sweep on the train split -> match edges ->
 *   large-star/small-star connected components -> pairwise F1 on the
 *   test split.
 *
 * Stages checkpoint to Parquet with lineage when `ckptRoot` is given.
 */
object Pipeline {

  final case class Outputs(
      records: DataFrame, keyed: DataFrame, candidates: DataFrame,
      scored: DataFrame, theta: Double, edges: DataFrame,
      clusters: DataFrame, testMetrics: DataFrame, summary: DataFrame)

  def run(spark: SparkSession, sfDir: String,
          ckptRoot: Option[String] = None, salts: Int = 64): Outputs = {

    def ck(name: String, fp: String)(df: => DataFrame): DataFrame =
      ckptRoot match {
        case Some(root) => Checkpoint.stage(spark, root, name, fp)(df).df
        case None => df
      }

    val fpBase = Checkpoint.fingerprint(sfDir, "v1", s"salts=$salts")

    val records = Synth.records(spark, sfDir)
    val keyed = ck("keyed", fpBase) {
      Blocking.withBlockKey(Normalize(records))
    }
    val candidates = ck("candidates", fpBase) {
      Blocking.candidates(keyed, salts)
    }
    val proj = Scorer.broadcastProjection(spark)
    val scored = ck("scored", fpBase) {
      Scorer.scoreDF(candidates, proj)
    }.persist()

    val dist = lit(1.0) - col("score")
    val train = scored.filter(col("split_a") === "train" && col("split_b") === "train")
    val theta = Threshold.bestThetaRobust(train, dist, col("label"))

    val edges = scored.filter(dist <= theta)
      .select(col("idA").as("src"), col("idB").as("dst"))
    val clusters = ck("clusters", Checkpoint.fingerprint(fpBase, theta.toString)) {
      Cluster.assign(keyed.select("id"), edges)
    }

    val test = scored.filter(col("split_a") === "test" && col("split_b") === "test")
    val testMetrics = Metrics.pairMetrics(test, (dist <= theta).cast("int"), col("label"))

    val m = testMetrics.head()
    val nClusters = clusters.select(countDistinct("cluster")).head().getLong(0)
    val nRecords = keyed.count()
    val nPairs = scored.count()
    import spark.implicits._
    val summary = Seq((theta, m.getAs[Double]("f1"), m.getAs[Double]("precision"),
        m.getAs[Double]("recall"), m.getAs[Long]("tp"), m.getAs[Long]("fp"),
        m.getAs[Long]("fn"), nPairs, nRecords, nClusters))
      .toDF("theta", "test_f1", "test_precision", "test_recall",
        "tp", "fp", "fn", "n_candidate_pairs", "n_records", "n_clusters")

    Outputs(records, keyed, candidates, scored, theta, edges, clusters,
      testMetrics, summary)
  }

  /** Flagship entry: summary row (driver smoke-checks rows > 0). */
  def summary(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir).summary
}
