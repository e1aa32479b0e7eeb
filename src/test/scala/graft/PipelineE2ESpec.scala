package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end flagship test — upgrades the reference's log-only quality
 * runs (e.g. /root/reference/tests/test_census_rl.py:129-135) to hard
 * assertions: F1 >= 0.99 on labeled candidate pairs at fixed blocking
 * keys (the north rule's quality bar).
 */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flagship pipeline reaches F1 >= 0.99 on the test split") {
    val out = Pipeline.run(spark, SparkTestSession.sf0001)
    val s = out.summary.head()
    val f1 = s.getAs[Double]("test_f1")
    assert(f1 >= 0.99, s"test F1 $f1 below target")
    // the synthetic data plants genuinely ambiguous pairs (near-twin
    // false positives, scrambled false negatives), so a PERFECT score
    // means the decision surface degenerated — assert non-degeneracy
    assert(f1 < 1.0, "F1 == 1.0: ambiguous tier not exercised")
    assert(s.getAs[Double]("test_precision") >= 0.99)
    assert(s.getAs[Double]("test_recall") >= 0.98)
    assert(s.getAs[Long]("n_clusters") > 0)
    assert(out.theta > 0 && out.theta < 1)
  }

  test("clusters are near-pure and complete wrt ground truth at theta") {
    val out = Pipeline.run(spark, SparkTestSession.sf0001)
    val withDni = out.keyed.select(col("id"), col("dni"))
      .join(out.clusters, "id")
    // purity: the planted near-twin tier merges a few same-customer
    // entities by design; everything else must stay pure
    val nClusters = withDni.select(countDistinct("cluster")).head().getLong(0)
    val impure = withDni.groupBy("cluster")
      .agg(countDistinct("dni").as("d")).filter(col("d") > 1).count()
    assert(impure <= math.max(1L, nClusters / 100),
      s"$impure impure clusters of $nClusters")
    // completeness: entities on both sides share one cluster, except
    // the planted scrambled-B (false-negative) tier
    val nDni = withDni.select(countDistinct("dni")).head().getLong(0)
    val split = withDni.groupBy("dni")
      .agg(countDistinct("cluster").as("c"), count(lit(1)).as("n"))
      .filter(col("n") === 2 && col("c") > 1).count()
    assert(split <= math.max(1L, nDni / 50),
      s"$split entities split across clusters of $nDni")
  }
}
