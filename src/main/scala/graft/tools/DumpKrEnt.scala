package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug: dump the trained KrEar entity matrix (ent_id, e0..) to
  * parquet for cross-engine diffing. Usage: DumpKrEnt <sfDir> <out>
  * [epochs]. */
object DumpKrEnt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${512 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val epochs = if (args.length > 2) args(2).toInt else 8
    val (entIds, valIds, relT, attrT) = graft.sim.KrEar.prepare(spark, args(0))
    val nEnt = entIds.count().toInt
    val nVal = valIds.count().toInt
    val m = graft.sim.KrEar.train(spark, relT, attrT, nEnt, nVal,
      graft.sim.KrEar.Config(epochs = epochs))
    m.ent.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("ent_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(args(1))
  }
}
