package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time individual pipeline stages at a given SF. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nRec = time("records.count")(graft.EntryStages.records(spark, sfDir).count())
    val nKey = time("keyed.count")(graft.EntryStages.keyed(spark, sfDir).count())
    val nCand = time("cand.count")(graft.EntryStages.cand(spark, sfDir).count())
    val nFeat = time("feats.count(jw+lev)")(
      graft.EntryStages.feats(spark, sfDir).filter(col("jw") >= 0).count())
    val nFull = time("scorer.mapPartitions(jw+lev+cos)")(
      graft.sim.Scorer.scoreDF(graft.EntryStages.cand(spark, sfDir),
        graft.sim.Scorer.broadcastProjection(spark))
        .filter(col("score") >= 0).count())
    val theta = time("theta (sweep)")(graft.EntryStages.theta(spark, sfDir))
    println(s"[profile] rec=$nRec keyed=$nKey cand=$nCand feat=$nFeat full=$nFull theta=$theta")
    spark.stop()
  }
}
