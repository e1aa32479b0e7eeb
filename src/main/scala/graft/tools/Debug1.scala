package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.Pipeline.run(spark, "/root/testdata/sf0.001")
    val missed = out.scored.filter(col("label") === 1 &&
      (lit(1.0) - col("score")) > out.theta)
    println(s"theta=${out.theta} missed=${missed.count()}")
    missed.select("idA", "idB", "jw", "lev", "cos", "score").show(10, false)
    val cand = out.candidates.select("idA", "idB", "content_a", "content_b")
    missed.join(cand, Seq("idA", "idB")).select("content_a", "content_b")
      .collect().foreach { r => println("A: " + r.getString(0)); println("B: " + r.getString(1)) }
    spark.stop()
  }
}
