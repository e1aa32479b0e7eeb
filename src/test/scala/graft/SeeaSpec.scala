package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeeaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("SEEA iterations accept high-precision mutual-NN pairs and shrink the pool") {
    val acc = ops.Seea.iterate(spark, SparkTestSession.sf0001,
      beta = 100, maxDist = 0.5, maxIter = 6).persist()
    val n = acc.count()
    assert(n > 100, s"accepted only $n pairs")
    // mutual-NN at fixed scores is high precision on this data
    val prec = acc.agg(avg(col("label"))).head().getDouble(0)
    assert(prec >= 0.99, s"SEEA precision $prec")
    // one-to-one: an endpoint is accepted at most once
    assert(acc.groupBy("idA").count().filter(col("count") > 1).count() == 0)
    assert(acc.groupBy("idB").count().filter(col("count") > 1).count() == 0)
    assert(acc.select("iteration").distinct().count() >= 2)
    acc.unpersist()
  }
}
