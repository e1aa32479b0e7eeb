package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipe.Threshold

object Debug3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.Pipeline.run(spark, "/root/testdata/sf0.001")
    val dist = lit(1.0) - col("score")
    val train = out.scored.filter(col("split_a") === "train" && col("split_b") === "train")
    Threshold.sweep(train, dist, col("label")).orderBy("theta").show(60, false)
    println("robust=" + Threshold.bestThetaRobust(train, dist, col("label")))
    println("argmax=" + Threshold.bestTheta(train, dist, col("label")))
    spark.stop()
  }
}
