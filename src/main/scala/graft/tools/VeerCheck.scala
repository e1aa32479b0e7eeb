package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: exercise the deterministic VEER fit + grid at a given SF. */
object VeerCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val (w, m) = graft.ml.Weights.veerWeightsAndMetrics(spark, sf)
    println("WEIGHTS:"); w.show(false)
    println("METRICS:"); m.show(false)
    for (r <- graft.ml.Weights.VeerGridRegs; it <- graft.ml.Weights.VeerGridIters) {
      println(s"GRID reg=$r it=$it:")
      graft.ml.Weights.veerEval(spark, sf, r, it).show(false)
    }
    spark.stop()
  }
}
