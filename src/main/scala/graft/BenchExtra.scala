package graft

import scala.collection.mutable.LinkedHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Metrics
import graft.pipe.{Blocking, Cluster, Normalize, Threshold}
import graft.sim.Scorer

/**
 * Optimization-round measurement harness (guide §1): times the SAME six
 * flagship stages as [[Bench]] — identical stage construction, identical
 * actions, identical session config — WITHOUT the scaling probes, so an
 * optimization iteration costs ~1 min instead of ~18. Never used by the
 * driver; [[Bench]] stays the frozen contract surface.
 *
 * Usage: `sbt "runMain graft.BenchExtra [repeats] [plansDir]"`.
 *  - repeats: stage sweep runs this many times in ONE JVM. Repeat 1 is
 *    cold-JIT (what the driver's fresh-JVM bench measures); later
 *    repeats are warm (the steady-state capability). Caches are cleared
 *    between repeats so every repeat recomputes from parquet.
 *  - plansDir: when given, writes `<stage>.txt` explain("formatted")
 *    plans for every stage into it (plan evidence for plans/r06/).
 */
object BenchExtra {

  /** Same session shape as Bench.session (kept in sync by BenchExtraSpec). */
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${512 * 1024}")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val repeats = if (args.length >= 1) args(0).toInt else 1
    val plansDir = if (args.length >= 2) Some(args(1)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    for (rep <- 1 to repeats) {
      val times = LinkedHashMap[String, Double]()
      def time[T](name: String)(f: => T): T = {
        spark.sparkContext.setJobDescription(s"bench-extra rep$rep $name")
        val t0 = System.nanoTime()
        val r = f
        times(name) = (System.nanoTime() - t0) / 1e9
        r
      }

      // ----- the six timed stages, bit-identical to Bench.main -----
      val keyed = Blocking.withBlockKey(Normalize(gen.Synth.records(spark, sfDir)))
        .persist()
      val nRecords = time("q_records_keyed")(keyed.count())

      val cand = Blocking.candidates(keyed)
      val nPairs = time("q_blocking_join")(cand.count())

      val scored = Scorer.scoreDF(cand, Scorer.broadcastProjection(spark)).persist()
      time("q_score_pairs")(scored.count())

      val dist = lit(1.0) - col("score")
      val train = scored.filter(col("split_a") === "train" && col("split_b") === "train")
      val theta = time("q_threshold_sweep")(
        Threshold.bestThetaRobust(train, dist, col("label")))

      val nClusters = time("q_connected_components") {
        val edges = scored.filter(dist <= theta)
          .select(col("idA").as("src"), col("idB").as("dst"))
        Cluster.assign(keyed.select("id"), edges)
          .select(countDistinct("cluster")).head().getLong(0)
      }

      val test = scored.filter(col("split_a") === "test" && col("split_b") === "test")
      val evalRow = time("q_eval_metrics") {
        Metrics.fullEval(test, dist, col("label"), theta).head()
      }
      val f1 = evalRow.getAs[Double]("f1")
      val mrr = evalRow.getAs[Double]("mrr")
      // ----- end timed stages -----

      val total = times.values.sum
      val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      println(
        s"""EXTRA {"rep":$rep,"value":$total,"queries":$qs,""" +
        f""""n_records":$nRecords,"n_pairs":$nPairs,"theta":$theta,""" +
        f""""f1":$f1%.6f,"mrr":$mrr%.6f,"n_clusters":$nClusters}""")

      plansDir.filter(_ => rep == repeats).foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        def dump(name: String, df: DataFrame): Unit =
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.txt"), plan(df))
        dump("q_records_keyed", keyed)
        dump("q_blocking_join", cand)
        dump("q_score_pairs",
          Scorer.scoreDF(cand, Scorer.broadcastProjection(spark)))
        dump("q_threshold_sweep",
          Threshold.sweep(train, dist, col("label")))
        dump("q_eval_metrics", Metrics.fullEval(test, dist, col("label"), theta))
      }

      keyed.unpersist(true)
      scored.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
