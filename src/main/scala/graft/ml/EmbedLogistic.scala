package graft.ml

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
 *
 * CLASS BALANCE: the reference trains on prior pairs plus ONE sampled
 * negative per prior pair (test_logistic_transh.py:62-74) — a 1:1
 * balanced set. The r3 MLlib fit trained on the raw train-train
 * candidate pairs (~3% positive) and collapsed to the all-negative
 * solution under regularization. This fit keeps the full train slice
 * but weights the two classes equally (0.5/nPos vs 0.5/nNeg per row) —
 * the reference's balance in expectation, without a sampling pass.
 *
 * REPLAY DISCIPLINE (DuckDB re-runs the whole thing,
 * [[graft.oracle.OracleSqlTransE.embedLogistic*]]): the TransH fit is
 * the replayable trainer (TransE.scala); gauss features are
 * micro-quantized (floor(g*1e6+0.5)/1e6) so a 1-ulp pow/exp divergence
 * between engines cannot leak into the fit; the full-batch GD
 * accumulates per-row gradient contributions as integer micro-units
 * summed per CLASS (order-free), and weights are nano-quantized after
 * every update — the fs_logreg discipline over continuous features.
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

  /** lr: the 16 gauss features are strongly correlated (they share the
    * record-distance direction), so the logistic Hessian's top
    * eigenvalue is ~0.25*(sum_i x_i)^2/row ~ 3 — full-batch GD needs
    * lr < 2/3 to converge (lr=1.0 oscillates and lands on a
    * degenerate all-negative fit). */
  // epochs = 5: the joint-KG TransH features keep the tier's quality
  // band; the embed_logistic_features anchor replay prices each epoch
  final case class Config(dim: Int = 16, epochs: Int = 5,
                          gaussScale: Double = 0.5,
                          iters: Int = 60, lr: Double = 0.3,
                          reg: Double = 0.001)

  private def microQ(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  // Accepted residual risk (ADVICE r4): the GD sigmoid below — and
  // dist = 1 - sigmoid(logit) in Weights.veerDist / the wbsc/vsc CTEs
  // — feeds RAW math.exp output into microQ and the ceil(dist*50)
  // threshold buckets; a 1-ulp JVM-vs-DuckDB-libm exp divergence
  // landing exactly on a 1e-6 micro-unit or bucket boundary would fail
  // the oracle LOUDLY (hash diff), never silently. We keep it
  // unquantized deliberately: both engines have agreed bit-for-bit on
  // every exp input exercised across four rounds at sf0.001-0.1, and a
  // KrEar.tanhQ-style pre-quantization of exp's INPUT would not remove
  // the risk (exp of a quantized input still differs in the last ulp
  // between libms) — only a full softfloat exp would, at real
  // hot-path cost. If a diff ever lands on this, the fix is to
  // quantize the SIGMOID OUTPUT (1e-12 grid) in both engines.

  /** Per-pair per-dimension micro-quantized gauss features over
    * joint-KG TransH record embeddings:
    * (idA, idB, label, split_a, split_b, feat). TRAIN-ONCE: the joint
    * TransH fit and the balanced GD are memoized per (session, sfDir,
    * cfg), so eval + weights share one training pass each. */
  def pairFeatures(spark: SparkSession, sfDir: String,
                   cfg: Config = Config()): DataFrame =
    graft.EntryStages.memo(spark, sfDir, s"embedlog-feats:$cfg") {
      pairFeaturesUncached(spark, sfDir, cfg)
    }

  private def pairFeaturesUncached(spark: SparkSession, sfDir: String,
                                   cfg: Config): DataFrame = {
    import spark.implicits._
    val ents = GraphBuild.erEntities(spark, sfDir)
    val nEnt = ents.count().toInt
    val nRel = GraphBuild.Relations.size + 1 // + same_as
    // replayable per-instance seed: the packed triple id (the joint
    // KG's (h, t, r) facts are distinct) — see TransE.packedIdx
    val triples = GraphBuild.ererJointTriples(spark, sfDir)
      .withColumn("idx", TransE.packedIdx(nEnt.toLong, nRel.toLong))
    val model = TransE.train(spark, triples, nEnt, nRel,
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
            val g = math.pow(2.0, -math.pow(d / scale, 2.0))
            feats(i) = math.floor(g * 1e6 + 0.5) / 1e6
            i += 1
          }
          (a, b, lbl, sa, sb, feats)
        }
      }.toDF("idA", "idB", "label", "split_a", "split_b", "feat")
  }

  /** Class-balanced weights + intercept; match iff the logit (features
    * left-to-right, then + b) is >= 0. */
  final case class Fit(w: Array[Double], b: Double)

  /**
   * Deterministic full-batch class-weighted GD: per iteration one
   * distributed pass emits per-CLASS integer micro-unit gradient sums
   * (order-free reduction); the driver mixes the classes 0.5/0.5,
   * applies the L2-regularized step, and nano-quantizes — the same
   * work split as the ECM/fs_logreg fits (one aggregation per
   * iteration, O(dim) driver state).
   */
  def fitBalanced(spark: SparkSession, sfDir: String,
                  cfg: Config = Config()): Fit =
    graft.EntryStages.memoModel(spark, sfDir, s"embedlog-fit:$cfg") {
      fitBalancedOn(pairFeatures(spark, sfDir, cfg), cfg)
    }

  /** GD over an explicit feature set (fitBalanced is the memoized
    * standard path). */
  def fitBalancedOn(feats: DataFrame, cfg: Config = Config()): Fit = {
    val spark = feats.sparkSession
    import spark.implicits._
    val dim = cfg.dim
    val data = feats
      .filter(col("split_a") === "train" && col("split_b") === "train")
      .select(col("label"), col("feat"))
      .as[(Long, Seq[Double])].rdd
      .map { case (l, f) => (l, f.toArray) }
      .repartition(8)
    data.localCheckpoint()
    val byClass = data.map(r => (r._1, 1L)).reduceByKey(_ + _).collect().toMap
    val nPos = byClass.getOrElse(1L, 0L)
    val nNeg = byClass.getOrElse(0L, 0L)
    require(nPos > 0 && nNeg > 0,
      s"balanced logistic needs both classes in the train slice " +
        s"(pos=$nPos neg=$nNeg)")
    val w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < cfg.iters) {
      val wB = spark.sparkContext.broadcast((w.clone(), b))
      val (gp, gn) = data.mapPartitions { rows =>
        val (wv, bv) = wB.value
        val pos = new Array[Long](dim + 1)
        val neg = new Array[Long](dim + 1)
        rows.foreach { case (lbl, x) =>
          var z = 0.0
          var i = 0
          while (i < dim) { z += wv(i) * x(i); i += 1 }
          z += bv
          val s = 1.0 / (1.0 + math.exp(-z))
          val resid = s - (if (lbl == 1L) 1.0 else 0.0)
          val tgt = if (lbl == 1L) pos else neg
          i = 0
          while (i < dim) { tgt(i) += microQ(resid * x(i)); i += 1 }
          tgt(dim) += microQ(resid)
        }
        Iterator.single((pos, neg))
      }.reduce { (a, b0) =>
        val p = new Array[Long](dim + 1); val n = new Array[Long](dim + 1)
        var i = 0
        while (i <= dim) {
          p(i) = a._1(i) + b0._1(i); n(i) = a._2(i) + b0._2(i); i += 1
        }
        (p, n)
      }
      var i = 0
      while (i < dim) {
        val gi = 0.5 * (gp(i).toDouble / 1e6) / nPos +
          0.5 * (gn(i).toDouble / 1e6) / nNeg
        w(i) = q9(w(i) - cfg.lr * (gi + cfg.reg * w(i)))
        i += 1
      }
      val gb = 0.5 * (gp(dim).toDouble / 1e6) / nPos +
        0.5 * (gn(dim).toDouble / 1e6) / nNeg
      b = q9(b - cfg.lr * gb)
      wB.destroy()
      it += 1
    }
    data.unpersist()
    Fit(w, b)
  }

  /** Logit column from literal fitted weights over an array feature
    * column: w0*x0 + ... + b — the left-to-right chain the oracle
    * unrolls identically. Shared with the VEER fit ([[Weights]]),
    * which runs the same GD over its 3 similarity channels. */
  def logitCol(fit: Fit, feat: Column): Column =
    fit.w.zipWithIndex.map { case (wi, i) =>
      lit(wi) * element_at(feat, i + 1)
    }.reduce(_ + _) + lit(fit.b)

  private def logit(fit: Fit): Column = logitCol(fit, col("feat"))

  /** Summary: test-split pair metrics of the balanced logistic
    * (match iff logit >= 0). */
  def eval(spark: SparkSession, sfDir: String,
           cfg: Config = Config()): DataFrame = {
    val feats = pairFeatures(spark, sfDir, cfg)
    val fit = fitBalanced(spark, sfDir, cfg)
    val test = feats.filter(col("split_a") === "test" &&
      col("split_b") === "test")
    Metrics.pairMetrics(test,
      (logit(fit) >= 0.0).cast("int"), col("label"))
  }

  /** Fitted parameter surface: one row per weight + the intercept
    * (d = dim for the intercept slot), nano-quantized exact values. */
  def weights(spark: SparkSession, sfDir: String,
              cfg: Config = Config()): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val fit = fitBalanced(spark, sfDir, cfg)
    (fit.w.zipWithIndex.map { case (wi, i) => (i.toLong, wi) } :+
      (cfg.dim.toLong, fit.b))
      .toSeq.toDF("d", "weight")
  }

  /** Per-pair per-dim micro integers of [[pairFeatures]] — the staged
    * ANCHOR for the embed_logistic_* oracles: the features are already
    * mq6-quantized (k/1e6 doubles), so `floor(x*1e6 + 0.5)` recovers
    * the exact lattice integer and downstream SQL reconstructs the
    * identical doubles as `micros / 1e6`. */
  def pairFeatureMicros(spark: SparkSession, sfDir: String,
                        cfg: Config = Config()): DataFrame =
    pairFeatures(spark, sfDir, cfg).select(
      Seq(col("idA"), col("idB"), col("label"),
        col("split_a"), col("split_b")) ++
      (0 until cfg.dim).map(d =>
        floor(element_at(col("feat"), d + 1) * 1e6 + lit(0.5))
          .cast("long").as(s"x${d}_micros")): _*)
}
