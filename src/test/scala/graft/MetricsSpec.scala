package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.Metrics

/**
 * Exact-value metric tests, fixture ported from the reference
 * (/root/reference/tests/test_ir_metrics.py:8-62, FIXTURES.md §6).
 */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (idA, idB, dist) scored pairs + truth {(0,1),(2,4)}
  def fixture = Seq(
    (0L, 1L, 0.1, 1), (0L, 2L, 0.3, 0), (1L, 2L, 0.5, 0),
    (2L, 3L, 0.2, 0), (2L, 4L, 0.9, 1)
  ).toDF("idA", "idB", "dist", "label")

  test("MRR / MAP / P@1 on the reference fixture") {
    val m = Metrics.irMetrics(fixture, col("dist"), col("label")).head()
    // query 0: relevant at rank 1 -> RR 1, AP 1; query 2: relevant at
    // rank 2 -> RR 0.5, AP 0.5; query 1 has no relevant -> excluded.
    assert(m.getAs[Long]("n_queries") == 2)
    assert(m.getAs[Double]("mrr") == 0.75)
    assert(m.getAs[Double]("map") == 0.75)
    assert(m.getAs[Double]("p_at_1") == 0.5)
  }

  test("per-query IR facts") {
    val f = Metrics.irQueryFacts(fixture, col("dist"), col("label"))
      .orderBy("idA").collect()
    assert(f.length == 3)
    val q0 = f(0)
    assert(q0.getAs[Long]("n_candidates") == 2 && q0.getAs[Long]("n_rel") == 1)
    assert(q0.getAs[Long]("first_rel_rank") == 1 && q0.getAs[Long]("hits_at_1") == 1)
    assert(q0.getAs[Long]("ap_micros") == 1000000L)
    val q1 = f(1)
    assert(q1.getAs[Long]("n_rel") == 0 && q1.getAs[Long]("first_rel_rank") == 0)
    val q2 = f(2)
    assert(q2.getAs[Long]("first_rel_rank") == 2 && q2.getAs[Long]("ap_micros") == 500000L)
  }

  test("pair metrics confusion + derived values") {
    // predict match when dist <= 0.3
    val m = Metrics.pairMetrics(fixture, (col("dist") <= 0.3).cast("int"),
      col("label")).head()
    assert(m.getAs[Long]("tp") == 1 && m.getAs[Long]("fp") == 2)
    assert(m.getAs[Long]("fn") == 1 && m.getAs[Long]("tn") == 1)
    assert(m.getAs[Double]("precision") == 1.0 / 3)
    assert(m.getAs[Double]("recall") == 0.5)
    assert(m.getAs[Double]("f1") == 2.0 / (2 + 2 + 1))
    assert(m.getAs[Double]("accuracy") == 0.4)
  }

  test("fullEval fuses pairMetrics + irMetrics exactly") {
    val theta = 0.4
    val pm = Metrics.pairMetrics(fixture,
      (col("dist") <= theta).cast("int"), col("label")).head()
    val ir = Metrics.irMetrics(fixture, col("dist"), col("label")).head()
    val f = Metrics.fullEval(fixture, col("dist"), col("label"), theta).head()
    for (c <- Seq("tp", "fp", "fn", "tn"))
      assert(f.getAs[Long](c) == pm.getAs[Long](c), c)
    for (c <- Seq("precision", "recall", "f1"))
      assert(f.getAs[Double](c) == pm.getAs[Double](c), c)
    assert(f.getAs[Long]("n_queries") == ir.getAs[Long]("n_queries"))
    for (c <- Seq("mrr", "map", "p_at_1"))
      assert(f.getAs[Double](c) == ir.getAs[Double](c), c)
  }

  test("grid search sweeps every combination and ranks by F1") {
    val sf = SparkTestSession.sf0001
    val combos = graft.eval.GridSearch.grid(
      "dim" -> Seq(8.0, 16.0), "epochs" -> Seq(20.0))
    assert(combos.size == 2)
    val out = graft.eval.GridSearch.sweep(spark, combos, { p =>
      graft.sim.RLTransE.eval(spark, sf, graft.sim.RLTransE.Config(
        dim = p("dim").toInt, epochs = p("epochs").toInt))
    }).collect()
    assert(out.length == 2)
    // sorted by descending f1
    assert(out(0).getAs[Double]("f1") >= out(1).getAs[Double]("f1"))
    // per-combo IR metrics carried through (reference logs them per combo)
    assert(out.forall(r => !r.getAs[Double]("mrr").isNaN))
    assert(out.forall(r => !r.getAs[Double]("precision").isNaN))
  }
}
