package graft

import scala.collection.mutable.LinkedHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Metrics
import graft.pipe.{Blocking, Cluster, Normalize, Threshold}
import graft.sim.Scorer

/**
 * Benchmark main (driver contract): runs the flagship linkage pipeline
 * stage by stage on `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]`
 * and prints ONE JSON line. Headline metric: total seconds across
 * stages; also reports candidate-pairs-scored/sec (the north-rule
 * throughput unit).
 *
 * Scaling evidence (north rule: >=0.8 efficiency between N and 4N
 * cores) is measured IN-PROCESS: after the main pipeline, the scoring
 * stage re-runs in fresh local[N/4] and local[N] sessions on the same
 * input — both probes JIT-warm, so the ratio isolates parallel scaling
 * from compilation noise — and the JSON carries both throughputs plus
 * the efficiency, reproducible from this single driver run.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      // pair scoring is CPU-bound per row, not byte-bound: AQE's
      // byte-based coalescing would squeeze the scorer onto a couple
      // of tasks, so keep the shuffle width explicit
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local testdata is one parquet file per table; split it so the
      // scan+normalize stage parallelizes like a many-file prod table
      .config("spark.sql.files.maxPartitionBytes", s"${512 * 1024}")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Scoring throughput at a given width: records -> block keys ->
    * candidates -> mapPartitions scorer, timing ONLY the scoring pass. */
  private def scoringProbe(cpus: Int, sfDir: String): (Long, Double) = {
    val spark = session(cpus)
    try {
      val keyed = Blocking.withBlockKey(Normalize(gen.Synth.records(spark, sfDir)))
        .persist()
      keyed.count()
      val cand = Blocking.candidates(keyed).persist()
      cand.count()
      val scored = Scorer.scoreDF(cand, Scorer.broadcastProjection(spark))
      val t0 = System.nanoTime()
      val n = scored.count()
      val sec = (System.nanoTime() - t0) / 1e9
      keyed.unpersist(); cand.unpersist()
      (n, sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = session(cpus)

    val times = LinkedHashMap[String, Double]()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      times(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // Stage 1: synthetic records + normalization + sha + block keys
    val keyed = Blocking.withBlockKey(Normalize(gen.Synth.records(spark, sfDir)))
      .persist()
    val nRecords = time("q_records_keyed")(keyed.count())

    // Stage 2: salted blocking self-join (candidate generation)
    val cand = Blocking.candidates(keyed)
    val nPairs = time("q_blocking_join")(cand.count())

    // Stage 3: pairwise scoring (mapPartitions: JW + Levenshtein +
    // broadcast-matrix cosine) — the throughput headline
    val scored = Scorer.scoreDF(cand, Scorer.broadcastProjection(spark)).persist()
    time("q_score_pairs")(scored.count())

    // Stage 4: single-pass threshold sweep on the train split
    val dist = lit(1.0) - col("score")
    val train = scored.filter(col("split_a") === "train" && col("split_b") === "train")
    val theta = time("q_threshold_sweep")(
      Threshold.bestThetaRobust(train, dist, col("label")))

    // Stage 5: match edges + large-star/small-star connected components
    val nClusters = time("q_connected_components") {
      val edges = scored.filter(dist <= theta)
        .select(col("idA").as("src"), col("idB").as("dst"))
      Cluster.assign(keyed.select("id"), edges)
        .select(countDistinct("cluster")).head().getLong(0)
    }

    // Stage 6: fused evaluation — confusion AND IR metrics in ONE pass
    val test = scored.filter(col("split_a") === "test" && col("split_b") === "test")
    val evalRow = time("q_eval_metrics") {
      Metrics.fullEval(test, dist, col("label"), theta).head()
    }
    val f1 = evalRow.getAs[Double]("f1")
    val mrr = evalRow.getAs[Double]("mrr")

    val total = times.values.sum
    val scoreSec = times("q_score_pairs")
    val pairsPerSec = if (scoreSec > 0) nPairs / scoreSec else 0.0
    spark.stop()

    // Scaling probe: same input, two widths, both JIT-warm
    val cpusLow = math.max(2, cpus / 4)
    val (_, secLow) = scoringProbe(cpusLow, sfDir)
    val (_, secHigh) = scoringProbe(cpus, sfDir)
    val ppsLow = nPairs / secLow
    val ppsHigh = nPairs / secHigh
    val efficiency = ppsHigh / (ppsLow * (cpus.toDouble / cpusLow))

    val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"flagship_pipeline_total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir","cpus":$cpus,""" +
      s""""n_records":$nRecords,"n_candidate_pairs":$nPairs,""" +
      f""""pairs_scored_per_sec":$pairsPerSec%.1f,"theta":$theta,"test_f1":$f1%.6f,""" +
      f""""test_mrr":$mrr%.6f,"n_clusters":$nClusters,""" +
      f""""scaling":{"cpus_low":$cpusLow,"cpus_high":$cpus,""" +
      f""""pps_low":$ppsLow%.1f,"pps_high":$ppsHigh%.1f,""" +
      f""""efficiency":$efficiency%.3f}}""")
  }
}
