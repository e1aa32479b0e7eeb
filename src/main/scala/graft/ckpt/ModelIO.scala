package graft.ckpt

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{RLTransE, TransE}

/**
 * Trained-model save/restore to Parquet — the Spark analogue of the
 * reference's TF `Saver` checkpoints (/root/reference/werl.py:364-374,
 * restored per experiment in /root/reference/tests/test_werl.py:52-59):
 * train once, freeze, and reuse the same embeddings across runs and
 * across JVMs. In-session reuse is already covered by
 * `EntryStages.memoModel`; this adds the cross-session half.
 *
 * Layout under `<dir>/`:
 *   matrices/  (name: string, row: bigint, vec: array<float>)
 *   vocab/     (rid: bigint, value: string, vidx: bigint)  [RLTransE]
 *   meta.json  {"fingerprint": ..., model-shape scalars, loss arrays}
 *
 * Floats round-trip bit-exactly through Parquet, so a restored model
 * scores candidate pairs IDENTICALLY to the freshly trained one
 * (asserted by ModelIOSpec). The matrices table is written and read
 * through Spark — model-sized (the same thing that is broadcast for
 * scoring), so the driver-side collect on load costs what every
 * scoring pass already pays.
 */
object ModelIO {

  private def matRows(name: String, m: Array[Array[Float]]): Seq[Row] =
    m.iterator.zipWithIndex.map { case (v, i) =>
      Row(name, i.toLong, v.toSeq)
    }.toSeq

  private val matSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("row",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("vec",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false),
      nullable = false)))

  /** Write named matrices as one partitioned-by-name parquet table. */
  def saveMatrices(spark: SparkSession, dir: String,
                   matrices: Map[String, Array[Array[Float]]]): Unit = {
    val rows = matrices.toSeq.sortBy(_._1).flatMap { case (n, m) =>
      matRows(n, m)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 65536)),
        matSchema)
      .write.mode("overwrite").partitionBy("name")
      .parquet(s"$dir/matrices")
  }

  /** Read every named matrix back, rows in index order. */
  def loadMatrices(spark: SparkSession, dir: String)
      : Map[String, Array[Array[Float]]] = {
    val collected = spark.read.parquet(s"$dir/matrices")
      .select("name", "row", "vec").collect()
    collected.groupBy(_.getString(0)).map { case (n, rs) =>
      val m = new Array[Array[Float]](rs.length)
      rs.foreach { r =>
        m(r.getLong(1).toInt) = r.getSeq[Float](2).toArray
      }
      n -> m
    }
  }

  private def writeMeta(dir: String, fields: Map[String, String]): Unit = {
    // The reader is a flat one-line key/value regex that stops a value
    // at the first ',' or '}' and strips outer quotes — a value
    // containing those characters would round-trip CORRUPTED (e.g. a
    // truncated fingerprint silently defeating the restore gate).
    // Reject such values at write time so a non-conforming field fails
    // loudly here instead.
    fields.foreach { case (k, v) =>
      val inner =
        if (v.length >= 2 && v.head == '"' && v.last == '"')
          v.substring(1, v.length - 1)
        else v
      require(!inner.exists(c => c == ',' || c == '}' || c == '"'),
        s"meta field '$k' contains ',', '}' or an inner '\"' — not " +
          s"representable in flat meta.json (value: $v)")
    }
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/meta.json"), json)
  }

  private def readMeta(dir: String): Option[Map[String, String]] = {
    val p = Paths.get(s"$dir/meta.json")
    if (!Files.exists(p)) None
    else {
      // flat json we wrote ourselves: "key": <raw value up to , or }>
      val kv = "\"([^\"]+)\"\\s*:\\s*([^,}]+)".r
      Some(kv.findAllMatchIn(Files.readString(p))
        .map(m => m.group(1) -> m.group(2).trim.stripPrefix("\"")
          .stripSuffix("\"")).toMap)
    }
  }

  /** Exact round-trip encoding (Double.toString is lossless), with ';'
    * separators so the flat meta.json stays parseable by the one-line
    * key/value regex (',' would split the quoted value). */
  private def jsonArr(xs: Array[Double]): String =
    xs.map(_.toString).mkString("[", ";", "]")

  private def parseArr(s: String): Array[Double] = {
    val body = s.trim.stripPrefix("[").stripSuffix("]")
    if (body.isEmpty) Array.empty else body.split(';').map(_.toDouble)
  }

  /** The fingerprint a saved model was trained under, if any. */
  def savedFingerprint(dir: String): Option[String] =
    readMeta(dir).flatMap(_.get("fingerprint"))

  // ---------------------------------------------------------------- RLTransE

  def saveRLTransE(spark: SparkSession, dir: String, model: RLTransE.Model,
                   fingerprint: String): Unit = {
    saveMatrices(spark, dir, Map("ent" -> model.ent, "rel" -> model.rel))
    import spark.implicits._
    model.vocab.iterator.zipWithIndex.flatMap { case (vm, rid) =>
      vm.iterator.map { case (value, vidx) =>
        (rid.toLong, value, vidx.toLong)
      }
    }.toSeq.toDF("rid", "value", "vidx")
      .write.mode("overwrite").parquet(s"$dir/vocab")
    writeMeta(dir, Map(
      "model" -> "\"rltranse\"",
      "fingerprint" -> ("\"" + fingerprint + "\""),
      "max_val_count" -> model.maxValCount.toString,
      "n_rel" -> model.vocab.length.toString,
      "loss_by_epoch" -> ("\"" + jsonArr(model.lossByEpoch) + "\"")))
  }

  def loadRLTransE(spark: SparkSession, dir: String): RLTransE.Model = {
    val meta = readMeta(dir).getOrElse(
      sys.error(s"no model meta at $dir/meta.json"))
    require(meta.get("model").contains("rltranse"),
      s"checkpoint at $dir is not an RLTransE model")
    val mats = loadMatrices(spark, dir)
    val nRel = meta("n_rel").toInt
    val vocabRows = spark.read.parquet(s"$dir/vocab")
      .select("rid", "value", "vidx").collect()
    val vocab = Array.fill(nRel)(Map.newBuilder[String, Int])
    vocabRows.foreach { r =>
      vocab(r.getLong(0).toInt) += (r.getString(1) -> r.getLong(2).toInt)
    }
    RLTransE.Model(mats("ent"), mats("rel"), vocab.map(_.result()),
      meta("max_val_count").toInt, parseArr(meta("loss_by_epoch")))
  }

  /**
   * `Saver.restore`-or-train: reuse the saved model iff its recorded
   * fingerprint matches `Checkpoint.fingerprint(sfDir, cfg)`; else
   * train (through the in-session memo) and save. Returns the model
   * plus whether it came from disk.
   */
  def rlTransEOrTrain(spark: SparkSession, sfDir: String, ckptDir: String,
                      cfg: RLTransE.Config = RLTransE.Config())
      : (RLTransE.Model, Boolean) = {
    val fp = Checkpoint.fingerprint("rltranse", sfDir, cfg.toString)
    if (savedFingerprint(ckptDir).contains(fp))
      (loadRLTransE(spark, ckptDir), true)
    else {
      val model = RLTransE.train(spark, sfDir, cfg)
      saveRLTransE(spark, ckptDir, model, fp)
      (model, false)
    }
  }

  // ------------------------------------------------------------------ TransE

  def saveTransE(spark: SparkSession, dir: String, model: TransE.Model,
                 fingerprint: String): Unit = {
    saveMatrices(spark, dir, Map(
      "ent" -> model.ent, "rel" -> model.rel, "w_rel" -> model.wRel))
    writeMeta(dir, Map(
      "model" -> "\"transe\"",
      "fingerprint" -> ("\"" + fingerprint + "\""),
      "loss_by_epoch" -> ("\"" + jsonArr(model.lossByEpoch) + "\"")))
  }

  def loadTransE(spark: SparkSession, dir: String): TransE.Model = {
    val meta = readMeta(dir).getOrElse(
      sys.error(s"no model meta at $dir/meta.json"))
    require(meta.get("model").contains("transe"),
      s"checkpoint at $dir is not a TransE model")
    val mats = loadMatrices(spark, dir)
    TransE.Model(mats("ent"), mats("rel"), mats("w_rel"),
      parseArr(meta("loss_by_epoch")))
  }
}
