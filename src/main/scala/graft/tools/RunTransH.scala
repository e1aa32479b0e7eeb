package graft.tools

import org.apache.spark.sql.SparkSession

object RunTransH {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sim.TransE.eval(spark, "/root/testdata/sf0.001",
      graft.sim.TransE.Config(transH = true)).show(false)
    spark.stop()
  }
}
