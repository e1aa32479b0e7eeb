package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: quality probe for the batch RLTransE variant. */
object RLBatchCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    graft.sim.RLTransE.evalBatch(spark, sf).show(false)
    spark.stop()
  }
}
