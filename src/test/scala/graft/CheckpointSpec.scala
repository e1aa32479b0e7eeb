package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ckpt.Checkpoint

/**
 * Checkpoint/resume round-trip, mirroring the reference's
 * export/load count tests (/root/reference/tests/test_graph_export.py)
 * upgraded to fingerprint-gated per-stage resume (SURVEY.md §7.5).
 */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stage computes once, resumes from parquet, recomputes on fingerprint change") {
    val root = Files.createTempDirectory("graft-ckpt").toString
    var computations = 0
    def compute = {
      computations += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val r1 = Checkpoint.stage(spark, root, "s1", "fp-A")(compute)
    assert(!r1.fromCache && computations == 1)
    assert(r1.df.count() == 2)
    // same fingerprint -> served from checkpoint, no recompute
    val r2 = Checkpoint.stage(spark, root, "s1", "fp-A")(compute)
    assert(r2.fromCache && computations == 1)
    assert(r2.df.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // changed fingerprint -> recompute + rewrite
    val r3 = Checkpoint.stage(spark, root, "s1", "fp-B")(compute)
    assert(!r3.fromCache && computations == 2)
    // lineage columns present in the persisted parquet
    val raw = spark.read.parquet(s"$root/s1")
    assert(Seq("_stage", "_run_id", "_part_id", "_input_fingerprint")
      .forall(raw.columns.contains))
    assert(raw.select("_input_fingerprint").distinct().as[String].collect()
      .toSeq == Seq("fp-B"))
  }

  test("pipeline resumes mid-run: cached stages are reused") {
    val root = Files.createTempDirectory("graft-pipe-ckpt").toString
    val out1 = Pipeline.run(spark, SparkTestSession.sf0001, Some(root))
    val f1a = out1.summary.head().getAs[Double]("test_f1")
    // second run must resume from the parquet checkpoints and agree
    val out2 = Pipeline.run(spark, SparkTestSession.sf0001, Some(root))
    val f1b = out2.summary.head().getAs[Double]("test_f1")
    assert(f1a == f1b && out1.theta == out2.theta)
    assert(Files.exists(java.nio.file.Paths.get(s"$root/scored._meta.json")))
  }
}
