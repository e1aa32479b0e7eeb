package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug: dump the KrEar train-train sweep buckets. */
object DumpKrSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${512 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.sim.KrEar.pairScores(spark, args(0))
    val train = all.filter(col("split_a") === "train" &&
      col("split_b") === "train")
    graft.pipe.Threshold.sweep(train, lit(1.0) - col("cos"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(args(1))
    System.err.println("[dump] theta=" + graft.pipe.Threshold
      .bestThetaTrainSplit(all, lit(1.0) - col("cos"), col("label")))
  }
}
