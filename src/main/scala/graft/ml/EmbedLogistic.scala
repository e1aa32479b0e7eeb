package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Metrics
import graft.graph.GraphBuild
import graft.sim.TransE

/**
 * Logistic regression over per-dimension EMBEDDING-DIFFERENCE features
 * — the reference's LogisticTransH experiment
 * (/root/reference/tests/erer/test_logistic_transh.py:57-59,90-101):
 * train TransH, compare the two records' embeddings with one NUMERIC
 * (gauss-kernel) comparator per embedding dimension, fit a logistic
 * classifier on labeled pairs, evaluate pairwise.
 *
 * The TransH here runs over the JOINT KG (both sides + `same_as` prior
 * edges, the reference's single-model variant) so the two records'
 * vectors live in one comparable space.
 */
object EmbedLogistic {

  /**
   * recordlinkage-style gauss numeric comparator:
   * sim = 2^(-((|a-b| - offset)/scale)^2) for |a-b| > offset, else 1
   * (recordlinkage.compare.Numeric, method='gauss').
   */
  def gaussSim(a: Column, b: Column, offset: Double = 0.0,
               scale: Double = 1.0): Column = {
    val d = abs(a - b)
    when(d <= offset, lit(1.0))
      .otherwise(pow(lit(2.0), -pow((d - offset) / scale, 2.0)))
  }

  final case class Config(dim: Int = 16, epochs: Int = 8,
                          gaussScale: Double = 0.5)

  /** Per-pair per-dimension gauss features over joint-KG TransH
    * record embeddings: (idA, idB, label, split_a, split_b, feat). */
  def pairFeatures(spark: SparkSession, sfDir: String,
                   cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val ents = GraphBuild.erEntities(spark, sfDir)
    val nEnt = ents.count().toInt
    // instance seed mixes h, t AND r (h/t-only collided across
    // relations sharing endpoints — see TransE.pairScores)
    val triples = GraphBuild.ererJointTriples(spark, sfDir)
      .withColumn("idx", xxhash64(col("h"), col("t"), col("r")))
    val model = TransE.train(spark, triples, nEnt,
      GraphBuild.Relations.size + 1, // + same_as
      TransE.Config(dim = cfg.dim, epochs = cfg.epochs, transH = true))
    val recEnt = ents.filter(col("label").rlike("^r[0-9]+$"))
      .select(substring(col("label"), 2, 20).cast("long").as("rid"),
        col("ent_id"))
    val entB = spark.sparkContext.broadcast(model.ent)
    val scale = cfg.gaussScale
    graft.EntryStages.cand(spark, sfDir)
      .select(col("idA"), col("idB"),
        (col("dni_a") === col("dni_b")).cast("long").as("label"),
        col("split_a"), col("split_b"))
      .join(recEnt.select(col("rid").as("idA"), col("ent_id").as("ea")), "idA")
      .join(recEnt.select(col("rid").as("idB"), col("ent_id").as("eb")), "idB")
      .select(col("idA"), col("idB"), col("label"),
        col("split_a"), col("split_b"), col("ea"), col("eb"))
      .as[(Long, Long, Long, String, String, Long, Long)]
      .mapPartitions { it =>
        val e = entB.value
        it.map { case (a, b, lbl, sa, sb, ea, eb) =>
          val va = e(ea.toInt); val vb = e(eb.toInt)
          val feats = new Array[Double](va.length)
          var i = 0
          while (i < va.length) {
            val d = math.abs(va(i).toDouble - vb(i))
            feats(i) = math.pow(2.0, -math.pow(d / scale, 2.0))
            i += 1
          }
          (a, b, lbl, sa, sb, feats)
        }
      }.toDF("idA", "idB", "label", "split_a", "split_b", "feat")
  }

  /** Summary: test-split pair metrics of the logistic classifier. */
  def eval(spark: SparkSession, sfDir: String,
           cfg: Config = Config()): DataFrame = {
    val feats = pairFeatures(spark, sfDir, cfg)
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(col("feat")))
      .withColumn("label_d", col("label").cast("double"))
      .persist()
    val lr = new LogisticRegression()
      .setLabelCol("label_d").setFeaturesCol("features")
      .setMaxIter(100).setRegParam(0.001).setTol(1e-9)
    val m = lr.fit(feats.filter(col("split_a") === "train" &&
      col("split_b") === "train"))
    val test = m.transform(feats.filter(col("split_a") === "test" &&
      col("split_b") === "test"))
    val out = Metrics.pairMetrics(test,
      (col("prediction") === 1.0).cast("int"), col("label"))
    out.collect()
    feats.unpersist()
    out
  }
}
