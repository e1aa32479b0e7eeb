package graft.ckpt

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-stage Parquet checkpoints with lineage + metrics, making runs
 * resumable mid-pipeline (north rule; the reference's analogue is the
 * all-or-nothing whole-graph text cache with fallback-to-rebuild,
 * /root/reference/ER/model.py:28-59, upgraded here to per-stage,
 * partition-tagged Parquet).
 *
 * Layout: `<root>/<stage>/` holds the stage output plus lineage
 * columns `_stage`, `_run_id`, `_part_id`, `_input_fingerprint`;
 * `<root>/<stage>._meta.json` records fingerprint + row count + wall
 * time. A stage is skipped iff its checkpoint exists and the input
 * fingerprint matches; otherwise it is recomputed and rewritten.
 */
object Checkpoint {

  final case class StageResult(df: DataFrame, fromCache: Boolean)

  private def metaPath(root: String, stage: String) =
    Paths.get(s"$root/$stage._meta.json")

  /** The recorded lineage sidecar of a stage (run_id, fingerprint,
    * rows, wall_ms), if the stage has been checkpointed. */
  def meta(root: String, stage: String): Option[Map[String, String]] =
    readMeta(root, stage)

  private def readMeta(root: String, stage: String): Option[Map[String, String]] = {
    val p = metaPath(root, stage)
    if (!Files.exists(p)) None
    else {
      val txt = Files.readString(p)
      // minimal flat-json parse (we wrote it ourselves)
      val kv = "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
      Some(kv.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2)).toMap)
    }
  }

  private def writeMeta(root: String, stage: String,
                        fields: Map[String, String]): Unit = {
    // same write-time guard as ModelIO.writeMeta: the minimal flat-JSON
    // reader cannot round-trip these characters, so reject them loudly
    // here instead of silently corrupting the fingerprint gate later
    fields.foreach { case (k, v) =>
      require(!(k + v).exists(c => c == '"' || c == '\\' || c < ' '),
        s"checkpoint meta field $k contains characters the flat-JSON " +
          s"reader cannot round-trip: $v")
    }
    val json = fields.map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(root))
    Files.writeString(metaPath(root, stage), json)
  }

  /**
   * Run `compute` through the checkpoint: skip when a matching
   * checkpoint exists; else compute, persist with lineage columns, and
   * record metrics. The returned DataFrame always reads from the
   * checkpoint (stable lineage for downstream stages).
   *
   * @param partitionBy Iceberg-style partition columns for the stage
   *                    output (hive layout); downstream reads with
   *                    filters on these columns prune whole partitions
   *                    (verified by PlanSpec).
   */
  def stage(spark: SparkSession, root: String, stageName: String,
            inputFingerprint: String, partitionBy: Seq[String] = Nil)
           (compute: => DataFrame): StageResult = {
    val dir = s"$root/$stageName"
    val cached = readMeta(root, stageName) match {
      case Some(meta) if meta.get("input_fingerprint").contains(inputFingerprint)
          && Files.exists(Paths.get(dir)) => true
      case _ => false
    }
    if (cached) {
      StageResult(spark.read.parquet(dir).drop(
        "_stage", "_run_id", "_part_id", "_input_fingerprint"), fromCache = true)
    } else {
      val runId = java.util.UUID.randomUUID().toString
      val t0 = System.nanoTime()
      val out = compute
        .withColumn("_stage", lit(stageName))
        .withColumn("_run_id", lit(runId))
        .withColumn("_part_id", spark_partition_id())
        .withColumn("_input_fingerprint", lit(inputFingerprint))
      val writer = out.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
       else writer).parquet(dir)
      val rows = spark.read.parquet(dir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      writeMeta(root, stageName, Map(
        "stage" -> stageName,
        "run_id" -> runId,
        "input_fingerprint" -> inputFingerprint,
        "rows" -> rows.toString,
        "wall_ms" -> wallMs.toString))
      StageResult(spark.read.parquet(dir).drop(
        "_stage", "_run_id", "_part_id", "_input_fingerprint"), fromCache = false)
    }
  }

  /** Deterministic fingerprint of stage inputs (paths + config). */
  def fingerprint(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    java.util.HexFormat.of().formatHex(
      md.digest(parts.mkString("\u0000").getBytes("UTF-8"))).take(16)
  }
}
