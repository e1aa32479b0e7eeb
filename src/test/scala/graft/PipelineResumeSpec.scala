package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.ckpt.Checkpoint

/**
 * Mid-pipeline resume over the REAL flagship pipeline (north rule:
 * "resumable from checkpoint with per-partition lineage + metrics").
 * The reference's analogue is the all-or-nothing graph text cache
 * (/root/reference/ER/model.py:28-59); here each stage resumes
 * independently: after deleting one mid-pipeline checkpoint, upstream
 * stages are SERVED (run_id unchanged — no recompute), the deleted
 * stage is recomputed (fresh run_id), and the end-to-end summary is
 * bit-identical to the first run.
 */
class PipelineResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
      finally walk.close()
    }

  test("pipeline resumes mid-stream: upstream served, deleted stage recomputed, output identical") {
    val root = Files.createTempDirectory("graft-resume").toString
    val sf = "/root/testdata/sf0.001"

    val out1 = Pipeline.run(spark, sf, Some(root))
    val summary1 = out1.summary.collect().toSeq
    def runId(stage: String): String =
      Checkpoint.meta(root, stage).get("run_id")
    val keyedRun1 = runId("keyed")
    val candRun1 = runId("candidates")
    val scoredRun1 = runId("scored")

    // lineage + metrics recorded per stage
    for (st <- Seq("keyed", "candidates", "scored", "clusters")) {
      val m = Checkpoint.meta(root, st).get
      assert(m("rows").toLong > 0, s"$st rows")
      assert(m("input_fingerprint").nonEmpty && m("run_id").nonEmpty)
    }

    // kill the mid-pipeline 'scored' checkpoint (data + sidecar)
    deleteRecursively(java.nio.file.Paths.get(s"$root/scored"))
    Files.deleteIfExists(java.nio.file.Paths.get(s"$root/scored._meta.json"))

    val out2 = Pipeline.run(spark, sf, Some(root))
    assert(runId("keyed") == keyedRun1, "keyed must resume from checkpoint")
    assert(runId("candidates") == candRun1, "candidates must resume")
    assert(runId("scored") != scoredRun1, "scored must be recomputed")
    assert(out2.summary.collect().toSeq == summary1,
      "resumed run must reproduce the first run bit-for-bit")
  }
}
