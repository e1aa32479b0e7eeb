package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ckpt.ModelIO
import graft.sim.RLTransE

/**
 * Trained-model save/restore (the reference's TF `Saver` semantics:
 * train once, freeze, restore per experiment —
 * /root/reference/werl.py:364-374,
 * /root/reference/tests/test_werl.py:52-59). A restored model must be
 * BIT-IDENTICAL to the trained one, so every consumer (eval, WERL,
 * export) scores the same pairs to the same values.
 */
class ModelIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // small config keeps the spec fast; determinism is seeded
  private val cfg = RLTransE.Config(dim = 8, epochs = 12)

  test("RLTransE model round-trips bit-exactly through parquet") {
    val dir = Files.createTempDirectory("graft-model").toString
    val trained = RLTransE.train(spark, SparkTestSession.sf0001, cfg)
    ModelIO.saveRLTransE(spark, dir, trained, "fp-test")
    val restored = ModelIO.loadRLTransE(spark, dir)
    assert(restored.maxValCount == trained.maxValCount)
    assert(restored.vocab.toSeq == trained.vocab.toSeq)
    assert(restored.lossByEpoch.toSeq == trained.lossByEpoch.toSeq)
    assert(restored.ent.length == trained.ent.length &&
      restored.rel.length == trained.rel.length)
    // bit-exact: java.util.Arrays equality on every row
    assert(restored.ent.indices.forall(i =>
      java.util.Arrays.equals(restored.ent(i), trained.ent(i))))
    assert(restored.rel.indices.forall(i =>
      java.util.Arrays.equals(restored.rel(i), trained.rel(i))))
  }

  test("restored model scores candidate pairs identically to the trained one") {
    val dir = Files.createTempDirectory("graft-model").toString
    val trained = RLTransE.train(spark, SparkTestSession.sf0001, cfg)
    ModelIO.saveRLTransE(spark, dir, trained, "fp-test")
    val restored = ModelIO.loadRLTransE(spark, dir)
    val a = RLTransE.pairScores(spark, SparkTestSession.sf0001, trained)
      .orderBy("idA", "idB").collect()
    val b = RLTransE.pairScores(spark, SparkTestSession.sf0001, restored)
      .orderBy("idA", "idB").collect()
    assert(a.length == b.length && a.nonEmpty)
    assert(a.sameElements(b))
  }

  test("TransE model round-trips bit-exactly through parquet") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-model-te").toString
    val ents = graft.graph.GraphBuild.erEntities(spark, SparkTestSession.sf0001)
    val triples = graft.graph.GraphBuild.erTriples(spark, SparkTestSession.sf0001)
      .withColumn("idx", col("h") * 2654435761L + col("t"))
    val trained = graft.sim.TransE.train(spark, triples, ents.count().toInt,
      graft.graph.GraphBuild.Relations.size, graft.sim.TransE.Config(epochs = 2))
    ModelIO.saveTransE(spark, dir, trained, "fp-te")
    val restored = ModelIO.loadTransE(spark, dir)
    assert(restored.lossByEpoch.toSeq == trained.lossByEpoch.toSeq)
    assert(restored.ent.indices.forall(i =>
      java.util.Arrays.equals(restored.ent(i), trained.ent(i))))
    assert(restored.rel.indices.forall(i =>
      java.util.Arrays.equals(restored.rel(i), trained.rel(i))))
    assert(restored.wRel.indices.forall(i =>
      java.util.Arrays.equals(restored.wRel(i), trained.wRel(i))))
    assert(ModelIO.savedFingerprint(dir).contains("fp-te"))
  }

  test("rlTransEOrTrain restores on fingerprint match, retrains on change") {
    val dir = Files.createTempDirectory("graft-model").toString
    val (m1, fromDisk1) =
      ModelIO.rlTransEOrTrain(spark, SparkTestSession.sf0001, dir, cfg)
    assert(!fromDisk1) // first call trains and saves
    val (m2, fromDisk2) =
      ModelIO.rlTransEOrTrain(spark, SparkTestSession.sf0001, dir, cfg)
    assert(fromDisk2) // second call restores from parquet
    assert(m2.ent.indices.forall(i =>
      java.util.Arrays.equals(m2.ent(i), m1.ent(i))))
    // config change -> stale fingerprint -> retrain (not restore)
    val (_, fromDisk3) = ModelIO.rlTransEOrTrain(
      spark, SparkTestSession.sf0001, dir, cfg.copy(epochs = 13))
    assert(!fromDisk3)
    assert(ModelIO.savedFingerprint(dir).isDefined)
  }
}
