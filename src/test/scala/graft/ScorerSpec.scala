package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{Embed, Scorer}

class ScorerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val sf = SparkTestSession.sf0001

  test("mapPartitions scorer agrees bit-for-bit with the column path on jw/lev") {
    val cand = EntryStages.cand(spark, sf)
    val colPath = EntryStages.feats(spark, sf)
      .select("idA", "idB", "jw", "lev")
    val mapPath = Scorer.scoreDF(cand, Scorer.broadcastProjection(spark))
      .select("idA", "idB", "jw", "lev")
    assert(mapPath.count() == colPath.count())
    assert(mapPath.exceptAll(colPath).isEmpty && colPath.exceptAll(mapPath).isEmpty)
  }

  test("exact-match pairs short-circuit to score 1.0") {
    val scored = Scorer.scoreDF(EntryStages.cand(spark, sf),
      Scorer.broadcastProjection(spark))
    val exact = scored.filter(col("jw") === 1.0 && col("lev") === 1.0)
    assert(exact.count() > 0)
    assert(exact.filter(col("score") =!= 1.0).count() == 0)
  }

  test("embedding vectors: deterministic, unit-norm, cosine sane") {
    val proj = Embed.projection()
    val v1 = Embed.vector("fn c370 alpha fin 1 urgent anvil val 105367 k 1", proj)
    val v2 = Embed.vector("fn c370 alpha fin 1 urgent anvil val 105367 k 1", proj)
    assert(v1.toSeq == v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(Embed.cosine(v1, v2) > 0.999999)
    val far = Embed.vector("zzz completely different qqq 999", proj)
    assert(Embed.cosine(v1, far) < 0.8)
    val near = Embed.vector("fn c370 alpha fin 1 urgent anvil value 105367 k 1", proj)
    assert(Embed.cosine(v1, near) > 0.9)
  }
}
