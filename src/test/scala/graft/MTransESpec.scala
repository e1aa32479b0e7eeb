package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphBuild
import graft.sim.MTransE

class MTransESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val sf = SparkTestSession.sf0001

  test("ERER graphs: disjoint side dictionaries, priors, same_as merge") {
    val a = GraphBuild.ererEntities(spark, sf, "A")
    val b = GraphBuild.ererEntities(spark, sf, "B")
    // record labels are side-unique (even/odd ids): no overlap
    val recA = a.filter(col("label").rlike("^r[0-9]+$")).select("label")
    val recB = b.filter(col("label").rlike("^r[0-9]+$")).select("label")
    assert(recA.intersect(recB).isEmpty)
    val priors = GraphBuild.priorPairs(spark, sf)
    val truth = EntryStages.cand(spark, sf)
      .filter(col("dni_a") === col("dni_b"))
    val frac = priors.count().toDouble / truth.count()
    assert(frac > 0.2 && frac < 0.4, s"prior fraction $frac not ~30%")
    // joint merge adds exactly one same_as triple per prior pair
    val joint = GraphBuild.ererJointTriples(spark, sf)
    val sameAs = joint.filter(col("r") === GraphBuild.Relations.size)
    assert(sameAs.count() == priors.count())
  }

  test("MTransE aligns the two KGs; ETransE adds evolution vectors") {
    val row = MTransE.eval(spark, sf, MTransE.Config(epochs = 6)).head()
    // reference's ERER tier is weak on census (F1 <= 0.2); assert a
    // usable ranking signal in that tier
    assert(row.getAs[Double]("f1") > 0.05, s"mtranse f1 ${row.get(4)}")
    assert(row.getAs[Double]("mrr") > 0.1)
    val evoRow = MTransE.eval(spark, sf,
      MTransE.Config(epochs = 6, evolve = true)).head()
    assert(evoRow.getAs[Double]("f1") > 0.05, s"etranse f1 ${evoRow.get(4)}")
    assert(evoRow.getAs[Long]("evolve") == 1L)
  }

  test("MTransE neg_rel_rate: per-KG relation corruption, bounded and additive") {
    val nrr = MTransE.eval(spark, sf,
      MTransE.Config(epochs = 4, negRelRate = 1)).head()
    // quality stays in the ERER tier with relation corruption on
    assert(nrr.getAs[Double]("f1") > 0.05, s"f1 ${nrr.get(4)}")
    assert(nrr.getAs[Double]("mrr") > 0.1)
  }
}
