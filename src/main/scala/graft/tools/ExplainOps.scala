package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-3 operators: prints the physical plans of
  * the embedding-LSH dedup, the pruned block assignment, and the
  * full-index guard path — eyeball for accidental cartesian products,
  * un-pruned scans, or missing exchanges. */
object ExplainOps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("==== dedup_embed_lsh ====")
    graft.ops.Dedup.embedLshPairs(spark, sfDir).explain("formatted")
    println("==== block_assignment ====")
    graft.ops.Assignment.blockAssignment(spark, sfDir).explain("formatted")
    println("==== ann_lsh_topk ====")
    graft.ops.Ann.lshTopK(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
