package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{RLTransE, TransE}

class TransESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val sf = SparkTestSession.sf0001

  test("TransE training converges and scores like the reference tier") {
    val ents = graph.GraphBuild.erEntities(spark, sf)
    val nEnt = ents.count().toInt
    val triples = graph.GraphBuild.erTriples(spark, sf)
      .withColumn("idx", col("h") * 2654435761L + col("t"))
    val model = TransE.train(spark, triples, nEnt,
      graph.GraphBuild.Relations.size, TransE.Config(epochs = 6))
    // margin-ranking loss decreases
    assert(model.lossByEpoch.head > model.lossByEpoch.last,
      s"loss did not decrease: ${model.lossByEpoch.toSeq}")
    assert(model.ent.length == nEnt)
    // entity rows stay L2-normalized
    val norm = math.sqrt(model.ent(0).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
  }

  test("TransH (hyperplane projection) converges with unit normals") {
    val ents = graph.GraphBuild.erEntities(spark, sf)
    val nEnt = ents.count().toInt
    val triples = graph.GraphBuild.erTriples(spark, sf)
      .withColumn("idx", col("h") * 2654435761L + col("t"))
    val model = TransE.train(spark, triples, nEnt,
      graph.GraphBuild.Relations.size, TransE.Config(epochs = 5, transH = true))
    assert(model.lossByEpoch.head > model.lossByEpoch.last,
      s"TransH loss did not decrease: ${model.lossByEpoch.toSeq}")
    val wNorm = math.sqrt(model.wRel(0).map(x => x.toDouble * x).sum)
    assert(math.abs(wNorm - 1.0) < 1e-4)
  }

  test("TransE linkage eval produces reference-tier quality") {
    val row = TransE.eval(spark, sf).head()
    // the reference's TransE scores F1 0.21-0.58 (BASELINE.md §2);
    // graph-only signals are weak by design - assert the tier, not more
    assert(row.getAs[Double]("f1") > 0.05)
    assert(row.getAs[Double]("recall") > 0.8)
    assert(row.getAs[Double]("mrr") > 0.1)
  }

  test("RLTransE learns the value evolution and reaches the top tier") {
    val model = RLTransE.train(spark, sf, RLTransE.Config(epochs = 30))
    // the st relation must have learned fin -> done as a translation:
    // emb(fin) + rel_st is closer to emb(done) than to the other
    // evolved values (live, wait)
    val stRid = graph.GraphBuild.Relations.indexOf("st")
    val fin = model.valueRow(stRid, "fin").get
    val er = model.rel(stRid)
    val shifted = fin.zip(er).map { case (a, b) => a + b }
    def dTo(v: String) = sim.Embed.cosineDistance(
      shifted, model.valueRow(stRid, v).get)
    assert(dTo("done") < dTo("live"), s"${dTo("done")} !< ${dTo("live")}")
    assert(dTo("done") < dTo("wait"), s"${dTo("done")} !< ${dTo("wait")}")

    val row = RLTransE.eval(spark, sf, RLTransE.Config(epochs = 30)).head()
    // reference RLTransE census tier: F1 0.95 (BASELINE.md §2)
    assert(row.getAs[Double]("f1") >= 0.9, s"rltranse f1 ${row.get(3)}")
    // true pairs' evolving field must score far below the miss value 1.0
    assert(row.getAs[Long]("tp_st_dist_micros") < 500000L,
      s"st evolution not learned: ${row.getAs[Long]("tp_st_dist_micros")}")
  }

  test("batch RLTransE (distributed trainer) learns the value evolution too") {
    // the scale path: TransE.train over the offset value tables with
    // per-relation tail ranges — must land in the flagship band AND
    // learn the planted st translations (low true-pair st distance)
    val row = RLTransE.evalBatch(spark, sf).head()
    assert(row.getAs[Double]("f1") >= 0.9, s"batch rltranse f1 ${row.get(3)}")
    assert(row.getAs[Double]("mrr") >= 0.9, s"batch rltranse mrr")
    assert(row.getAs[Long]("tp_st_dist_micros") < 500000L,
      s"st evolution not learned: ${row.getAs[Long]("tp_st_dist_micros")}")
    // train-once memo: the registered query and repeated evals share one fit
    val m1 = RLTransE.trainBatch(spark, sf)
    assert(RLTransE.trainBatch(spark, sf) eq m1)
  }

  test("batch model dump: both epoch readouts, unit rows, vocab-complete") {
    val dump = RLTransE.batchModelDump(spark, sf)
    val m = RLTransE.trainBatch(spark, sf)
    val nVocab = m.vocab.map(_.size.toLong).sum
    val nRel = graph.GraphBuild.Relations.size.toLong
    val byKind = dump.groupBy("kind", "epochs").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (e, h) = (RLTransE.BatchCfg.epochs, RLTransE.BatchCfg.epochs / 2)
    assert(byKind(("ent", e.toLong)) == nVocab &&
      byKind(("ent", h.toLong)) == nVocab, s"$byKind vs $nVocab")
    assert(byKind(("rel", e.toLong)) == nRel &&
      byKind(("rel", h.toLong)) == nRel)
    // trained entity rows are L2-normalized — norms ~1 in Float32
    val dim = RLTransE.BatchCfg.dim
    import org.apache.spark.sql.functions._
    val normSq = (0 until dim).map(d => col(s"f$d") * col(s"f$d"))
      .reduce(_ + _)
    val off = dump.filter(col("kind") === "ent")
      .filter(abs(normSq - lit(1.0)) > lit(1e-5)).count()
    assert(off == 0L, s"$off entity rows off the unit sphere")
    // the dump row for a vocab value IS the model's valueRow
    val rid = graph.GraphBuild.Relations.indexOf(RLTransE.ScoredRels.head)
    val (value, vidx) = m.vocab(rid).head
    val row = dump.filter(col("kind") === "ent" &&
      col("epochs") === e.toLong &&
      col("row_id") === (rid.toLong * m.maxValCount + vidx)).head()
    val expected = m.valueRow(rid, value).get
    (0 until dim).foreach(d =>
      assert(row.getAs[Float](s"f$d") == expected(d), s"dim $d"))
  }

  test("RLTransE refuses data-sized vocabularies instead of OOMing the driver") {
    import spark.implicits._
    // adversarial high-cardinality input: every value unique per row —
    // the offset-value-table premise (vocabulary << data) is broken
    val veg = (0L until 500L).map(i => (s"u$i", s"v$i", 1L, 1L))
      .toDF("val_a", "val_b", "r", "n")
    val ex = intercept[IllegalArgumentException] {
      RLTransE.trainOn(spark, veg,
        RLTransE.Config(epochs = 1, maxDriverTriples = 100L))
    }
    assert(ex.getMessage.contains("driver-side"), ex.getMessage)
  }

  test("TransE neg_rel_rate: relation corruption trains and never corrupts into real triples") {
    val ents = graph.GraphBuild.erEntities(spark, sf)
    val nEnt = ents.count().toInt
    val triples = graph.GraphBuild.erTriples(spark, sf)
      .withColumn("idx", col("h") * 2654435761L + col("t"))
    val model = TransE.train(spark, triples, nEnt,
      graph.GraphBuild.Relations.size,
      TransE.Config(epochs = 6, negRelRate = 1))
    // Sphere-projected training (relation rows re-normalized per epoch,
    // as the reference l2-normalizes every lookup): the raw hinge sum
    // plateaus instead of decreasing monotonically — assert it stays
    // BOUNDED (the unnormalized run exploded 78k -> 20M in 6 epochs)
    // and that its growth decelerates toward the plateau.
    val l = model.lossByEpoch
    assert(l.last < 5 * l.head, s"loss exploded: ${l.toSeq}")
    assert(l(l.length - 1) - l(l.length - 2) < (l(1) - l(0)) / 2,
      s"loss not plateauing: ${l.toSeq}")
    // rel corruption contributes hinge terms from epoch 0
    val base = TransE.train(spark, triples, nEnt,
      graph.GraphBuild.Relations.size,
      TransE.Config(epochs = 6, negRelRate = 0))
    assert(model.lossByEpoch.head > base.lossByEpoch.head,
      s"negRelRate=1 must add hinge terms: ${model.lossByEpoch.head} " +
        s"vs ${base.lossByEpoch.head}")
  }
}
