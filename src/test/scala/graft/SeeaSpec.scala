package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeeaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("SEEA self-learning beats the fixed-score loop at >=0.99 precision") {
    val sf = SparkTestSession.sf0001
    val acc = ops.Seea.iterate(spark, sf,
      beta = 100, maxDist = 0.9, maxIter = 5, epochs = 40).persist()
    val n = acc.count()
    assert(n > 100, s"accepted only $n pairs")
    val prec = acc.agg(avg(col("label"))).head().getDouble(0)
    assert(prec >= 0.99, s"SEEA precision $prec")
    // one-to-one: an endpoint is accepted at most once
    assert(acc.groupBy("idA").count().filter(col("count") > 1).count() == 0)
    assert(acc.groupBy("idB").count().filter(col("count") > 1).count() == 0)
    assert(acc.select("iteration").distinct().count() >= 2)

    // the retrained loop recovers true pairs (scrambled-content tier)
    // that fixed string scores lose
    val fixed = ops.Seea.iterateFixedScores(spark, sf,
      beta = 100, maxDist = 0.5, maxIter = 10)
    val trueNew = acc.filter(col("label") === 1).count()
    val trueFixed = fixed.filter(col("label") === 1).count()
    assert(trueNew > trueFixed,
      s"self-learning ($trueNew true) did not beat fixed scores ($trueFixed)")
    acc.unpersist()
  }
}
