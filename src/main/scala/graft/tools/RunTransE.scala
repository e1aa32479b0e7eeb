package graft.tools

import org.apache.spark.sql.SparkSession

object RunTransE {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.sim.TransE.eval(spark, sfDir).show(false)
    println(f"wall: ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
