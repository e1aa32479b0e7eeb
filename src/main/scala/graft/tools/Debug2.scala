package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Debug2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.Pipeline.run(spark, "/root/testdata/sf0.001")
    val cand = out.candidates.select("idA", "idB", "content_a", "content_b")
    println("== closest FALSE pairs ==")
    out.scored.filter(col("label") === 0).orderBy(desc("score"))
      .limit(3).join(cand, Seq("idA", "idB"))
      .select("idA", "idB", "jw", "lev", "cos", "score", "content_a", "content_b")
      .collect().foreach { r =>
        println(r.toSeq.take(6).mkString(" | "))
        println("  A: " + r.getString(6)); println("  B: " + r.getString(7))
      }
    println("== lowest TRUE pairs ==")
    out.scored.filter(col("label") === 1).orderBy(asc("score"))
      .limit(3).select("idA","idB","jw","lev","cos","score").show(false)
    spark.stop()
  }
}
