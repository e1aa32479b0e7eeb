package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphBuild

/**
 * MTransE / ETransE — dual-KG alignment embedding
 * (/root/reference/ERER/mtranse.py:140-227,
 * /root/reference/ERER/etranse.py:60-110,300-340):
 *
 * - KG A and KG B each train a plain TransE margin loss over their OWN
 *   entity/relation tables (disjoint dictionaries);
 * - an ALIGNMENT model learns a dim x dim translation matrix M over
 *   the prior pairs: hinge on ||M e_a - e_b||_1 against corrupted
 *   partners (mtranse.py _calc_alignment);
 * - ETransE adds per-relation EVOLUTION vectors v_r over the prior
 *   pairs' linked value nodes: hinge on ||M a + v_r - b||_1
 *   (etranse.py _calc_evolve), capturing how attribute values drift
 *   between the two snapshots.
 *
 * The epoch alternates the optimizers exactly like the reference's
 * train loop (A pass, B pass, alignment pass, evolution pass). Spark
 * shape matches [[TransE.train]]: model broadcast per epoch, sparse
 * gradients in integer micro-units, one groupByKey shuffle per pass,
 * only model-sized rows on the driver.
 */
object MTransE {

  /**
   * @param negRelRate relation corruptions per triple per epoch inside
   *        each per-KG TransE pass (r' != r, rejecting real triples —
   *        /root/reference/common.py:117-127; the reference passes
   *        neg_rel_rate to both KGs' samplers).
   */
  final case class Config(
      // epochs = 5: the dual-KG + alignment tiers hold their band
      // (spec) — each epoch is three hinge blocks in the DuckDB replay
      dim: Int = 16, epochs: Int = 5, lr: Double = 0.1,
      margin: Double = 1.0, negRate: Int = 2, seed: Long = 42L,
      evolve: Boolean = false, negRelRate: Int = 0)

  final case class Model(
      entA: Array[Array[Float]], entB: Array[Array[Float]],
      relA: Array[Array[Float]], relB: Array[Array[Float]],
      m: Array[Array[Float]], evolveVec: Array[Array[Float]],
      lossByEpoch: Array[Double])

  /** The sampler-oracle hash stream ([[NegativeSampler.fnvMix]]) —
    * SQL-replayable, unlike the round-3 custom mix. */
  private def mix(a: Long, b: Long): Long = NegativeSampler.fnvMix(a, b)

  private final val Micro = 1e6

  /** floor(x*1e6+0.5) — per-contribution micro quantizer (TransE). */
  private def microQ(x: Double): Long = math.floor(x * Micro + 0.5).toLong

  /** M v for a dim x dim row-major matrix. */
  private def matVec(m: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < v.length) { s += row(j).toDouble * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /**
   * @param triplesA / triplesB per-side (h, t, r)
   * @param aligned   (a, b, r) pairs for the alignment loss (record
   *                  priors with r = -1) and, when cfg.evolve, the
   *                  evolution value pairs with their relation id
   */
  def train(spark: SparkSession,
            triplesA: DataFrame, triplesB: DataFrame, aligned: DataFrame,
            nEntA: Int, nEntB: Int, nRel: Int,
            cfg: Config = Config()): Model = {
    import spark.implicits._
    val dim = cfg.dim
    // FNV-seeded init (TransE.initComponent), matrix slots 0..5 —
    // SQL-replayable, order-independent
    def init(matId: Int, n: Int) = Array.tabulate(n)(row =>
      Array.tabulate(dim)(j =>
        TransE.initComponent(matId, row, j, cfg.seed, dim)))
    val entA = init(0, nEntA); entA.foreach(Embed.l2normalize)
    val entB = init(1, nEntB); entB.foreach(Embed.l2normalize)
    val relA = init(2, nRel)
    val relB = init(3, nRel)
    val m = init(4, dim) // dim x dim alignment matrix, one row per id
    val evolveVec = init(5, nRel)

    val offB = nEntA.toLong
    val offRelA = offB + nEntB
    val offRelB = offRelA + nRel
    val offM = offRelB + nRel
    val offEvo = offM + dim

    // 8 partitions: gradient rows duplicate per partition (see
    // TransE.train) — keep the shuffle model-sized, not 64x model-sized.
    // localCheckpoint truncates lineage so epochs don't re-analyze the
    // full upstream plan.
    def ds(df: DataFrame): Dataset[(Long, Long, Long)] =
      df.select(col(df.columns(0)).cast("long"), col(df.columns(1)).cast("long"),
        col(df.columns(2)).cast("long")).as[(Long, Long, Long)]
        .repartition(8).localCheckpoint()
    val dataA = ds(triplesA); val dataB = ds(triplesB)
    val dataAl = ds(aligned)

    // per-side packed rejection indexes for relation corruption
    val nRelL0 = nRel.toLong
    def packed(data: Dataset[(Long, Long, Long)], nEnt: Long): Array[Long] =
      if (cfg.negRelRate > 0)
        data.map { case (h, t, r) => (h * nRelL0 + r) * nEnt + t }
          .collect().sorted
      else Array.emptyLongArray
    val packedAB = spark.sparkContext.broadcast(
      (packed(dataA, nEntA.toLong), packed(dataB, nEntB.toLong)))

    val losses = new Array[Double](cfg.epochs)

    def reduceApply(rows: Dataset[(Long, Array[Long])]): Double = {
      var loss = 0.0
      // RDD reduceByKey at width 8 (map-side combine, exact long sums
      // -> order-free) instead of the 64-partition typed shuffle; see
      // TransE.train for the rationale
      val reduced = rows.rdd.reduceByKey({ (x, y) =>
        val s = new Array[Long](x.length)
        var i = 0
        while (i < s.length) { s(i) = x(i) + y(i); i += 1 }
        s
      }, 8).collect()
      reduced.foreach { case (id, gv) =>
        if (id == -1L) loss = gv(0) / Micro
        else {
          val target =
            if (id < offB) entA(id.toInt)
            else if (id < offRelA) entB((id - offB).toInt)
            else if (id < offRelB) relA((id - offRelA).toInt)
            else if (id < offM) relB((id - offRelB).toInt)
            else if (id < offEvo) m((id - offM).toInt)
            else evolveVec((id - offEvo).toInt)
          var i = 0
          while (i < dim) {
            target(i) =
              (target(i).toDouble - cfg.lr * (gv(i).toDouble / Micro)).toFloat
            i += 1
          }
        }
      }
      loss
    }

    def emit(acc: java.util.HashMap[Long, Array[Long]], lossMicro: Long) = {
      import scala.jdk.CollectionConverters._
      val lossRow = {
        val a = new Array[Long](dim)
        a(0) = lossMicro
        (-1L, a)
      }
      Iterator.single(lossRow) ++
        acc.entrySet().asScala.iterator.map(kv => (kv.getKey, kv.getValue))
    }

    var epoch = 0
    while (epoch < cfg.epochs) {
      val ep = epoch
      val negRate = cfg.negRate
      val negRelRate = cfg.negRelRate
      val nRelL = nRel.toLong
      val margin = cfg.margin
      val evolve = cfg.evolve

      // --- per-KG TransE pass (side = 0 for A, 1 for B) ---
      def kgPass(data: Dataset[(Long, Long, Long)], side: Int): Double = {
        val bb = spark.sparkContext.broadcast((entA, entB, relA, relB))
        val nEntL = (if (side == 0) nEntA else nEntB).toLong
        val entOff = if (side == 0) 0L else offB
        val relOff = if (side == 0) offRelA else offRelB
        val rows = data.mapPartitions { it =>
          val (ea, eb, ra, rb) = bb.value
          val e = if (side == 0) ea else eb
          val r = if (side == 0) ra else rb
          val acc = new java.util.HashMap[Long, Array[Long]]()
          var lossMicro = 0L
          def g(id: Long): Array[Long] = {
            var v = acc.get(id)
            if (v == null) { v = new Array[Long](dim); acc.put(id, v) }
            v
          }
          val sorted =
            if (side == 0) packedAB.value._1 else packedAB.value._2
          it.foreach { case (h, t, rl) =>
            // relation corruption: (h, t, r'), rejecting real triples
            var jr = 0
            while (jr < negRelRate && nRelL > 1) {
              var rNeg = -1L
              var att = 0
              while (rNeg < 0 && att < 16) {
                val d = mix(h * 31 + t + side * 131,
                  0x9e3779b9L + (ep.toLong * negRelRate + jr) * 31 + att)
                val c = ((d % nRelL) + nRelL) % nRelL
                if (c != rl && java.util.Arrays.binarySearch(
                    sorted, (h * nRelL + c) * nEntL + t) < 0) rNeg = c
                att += 1
              }
              if (rNeg >= 0) {
                val eh = e(h.toInt); val et = e(t.toInt)
                val er = r(rl.toInt); val ern = r(rNeg.toInt)
                var pos = 0.0; var neg = 0.0
                var i = 0
                while (i < dim) {
                  pos += math.abs(eh(i).toDouble + er(i) - et(i))
                  neg += math.abs(eh(i).toDouble + ern(i) - et(i))
                  i += 1
                }
                val l = pos - neg + margin
                if (l > 0) {
                  lossMicro += microQ(l)
                  val gh = g(entOff + h); val gt = g(entOff + t)
                  val gr = g(relOff + rl); val grn = g(relOff + rNeg)
                  i = 0
                  while (i < dim) {
                    val sp = math.signum(eh(i).toDouble + er(i) - et(i))
                    val sn = math.signum(eh(i).toDouble + ern(i) - et(i))
                    val dm = ((sp - sn) * Micro).toLong
                    gh(i) += dm; gt(i) -= dm
                    gr(i) += (sp * Micro).toLong
                    grn(i) -= (sn * Micro).toLong
                    i += 1
                  }
                }
              }
              jr += 1
            }
            var j = 0
            while (j < negRate) {
              val d = mix(h * 31 + t + side * 131, ep.toLong * negRate + j)
              val tNeg = ((d % nEntL) + nEntL) % nEntL
              if (tNeg != t) {
                val eh = e(h.toInt); val et = e(t.toInt)
                val en = e(tNeg.toInt); val er = r(rl.toInt)
                var pos = 0.0; var neg = 0.0
                var i = 0
                while (i < dim) {
                  pos += math.abs(eh(i).toDouble + er(i) - et(i))
                  neg += math.abs(eh(i).toDouble + er(i) - en(i))
                  i += 1
                }
                val l = pos - neg + margin
                if (l > 0) {
                  lossMicro += microQ(l)
                  val gh = g(entOff + h); val gt = g(entOff + t)
                  val gn = g(entOff + tNeg); val gr = g(relOff + rl)
                  i = 0
                  while (i < dim) {
                    val sp = math.signum(eh(i).toDouble + er(i) - et(i))
                    val sn = math.signum(eh(i).toDouble + er(i) - en(i))
                    val dm = ((sp - sn) * Micro).toLong
                    gh(i) += dm; gr(i) += dm
                    gt(i) -= (sp * Micro).toLong
                    gn(i) += (sn * Micro).toLong
                    i += 1
                  }
                }
              }
              j += 1
            }
          }
          emit(acc, lossMicro)
        }
        val l = reduceApply(rows)
        bb.destroy()
        l
      }

      val lossA = kgPass(dataA, 0)
      val lossB = kgPass(dataB, 1)
      entA.foreach(Embed.l2normalize)
      entB.foreach(Embed.l2normalize)
      // sphere-project relation rows under relation corruption (each
      // receives a hinge term per same-relation triple per epoch and
      // diverges un-normalized — see TransE.train)
      if (cfg.negRelRate > 0) {
        relA.foreach(Embed.l2normalize)
        relB.foreach(Embed.l2normalize)
      }

      // --- alignment (+ evolution) pass over (a, b, r) pairs ---
      val bb = spark.sparkContext.broadcast((entA, entB, m, evolveVec))
      val nEntBL = nEntB.toLong
      val rows = dataAl.mapPartitions { it =>
        val (ea, eb, mm, ev) = bb.value
        val acc = new java.util.HashMap[Long, Array[Long]]()
        var lossMicro = 0L
        def g(id: Long): Array[Long] = {
          var v = acc.get(id)
          if (v == null) { v = new Array[Long](dim); acc.put(id, v) }
          v
        }
        it.foreach { case (a, b, rl) =>
          val va = ea(a.toInt)
          val ma = matVec(mm, va)
          val vec = if (rl >= 0 && evolve) ev(rl.toInt) else null
          def score(bi: Long): Double = {
            val vb = eb(bi.toInt)
            var s = 0.0
            var i = 0
            while (i < dim) {
              val z = ma(i).toDouble +
                (if (vec != null) vec(i).toDouble else 0.0) - vb(i)
              s += math.abs(z)
              i += 1
            }
            s
          }
          var j = 0
          var negSum = 0.0
          val sigma = new Array[Double](dim) // sp - mean(sn)
          val vb = eb(b.toInt)
          var i = 0
          while (i < dim) {
            sigma(i) = math.signum(ma(i).toDouble +
              (if (vec != null) vec(i).toDouble else 0.0) - vb(i))
            i += 1
          }
          val negIds = new Array[Long](negRate)
          var nNeg = 0
          while (j < negRate) {
            val d = mix(a * 53 + b, (ep.toLong + 104729) * negRate + j)
            val bNeg = ((d % nEntBL) + nEntBL) % nEntBL
            if (bNeg != b) { negIds(nNeg) = bNeg; nNeg += 1; negSum += score(bNeg) }
            j += 1
          }
          if (nNeg > 0) {
            val pos = score(b)
            val negMean = negSum / nNeg
            val l = pos - negMean + margin
            if (l > 0) {
              lossMicro += microQ(l)
              val inv = 1.0 / nNeg
              // effective sign vector: sigma_pos - mean_j sigma_negj —
              // exact multiples of 1/nNeg (nNeg <= 2), so every
              // contribution below micro-quantizes exactly
              val eff = new Array[Double](dim)
              i = 0
              while (i < dim) { eff(i) = sigma(i); i += 1 }
              j = 0
              while (j < nNeg) {
                val vn = eb(negIds(j).toInt)
                val gn = g(offB + negIds(j))
                i = 0
                while (i < dim) {
                  val sn = math.signum(ma(i).toDouble +
                    (if (vec != null) vec(i).toDouble else 0.0) - vn(i)) * inv
                  eff(i) -= sn
                  gn(i) += microQ(sn) // corrupted partner pushed away
                  i += 1
                }
                j += 1
              }
              val gb = g(offB + b)
              val gaRow = g(a)
              val gv = if (vec != null) g(offEvo + rl) else null
              i = 0
              while (i < dim) {
                gb(i) -= microQ(sigma(i))
                if (gv != null) gv(i) += microQ(eff(i))
                // grad_a = M^T eff ; grad_M(row i) = eff_i * a
                var s = 0.0
                var k2 = 0
                while (k2 < dim) { s += mm(k2)(i).toDouble * eff(k2); k2 += 1 }
                gaRow(i) += microQ(s)
                val gm = g(offM + i)
                k2 = 0
                while (k2 < dim) { gm(k2) += microQ(eff(i) * va(k2)); k2 += 1 }
                i += 1
              }
            }
          }
        }
        emit(acc, lossMicro)
      }
      val lossAl = reduceApply(rows)
      bb.destroy()
      entA.foreach(Embed.l2normalize)
      entB.foreach(Embed.l2normalize)
      losses(epoch) = lossA + lossB + lossAl
      epoch += 1
    }
    dataA.unpersist(); dataB.unpersist(); dataAl.unpersist()
    packedAB.destroy()
    Model(entA, entB, relA, relB, m, evolveVec, losses)
  }

  /** Cosine pair scores of M e_a vs e_b over the candidate pairs. */
  def pairScores(spark: SparkSession, sfDir: String,
                 cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val entsA = GraphBuild.ererEntities(spark, sfDir, "A").persist()
    val entsB = GraphBuild.ererEntities(spark, sfDir, "B").persist()
    val nA = entsA.count().toInt
    val nB = entsB.count().toInt
    val triplesA = GraphBuild.ererTriples(spark, sfDir, "A")
    val triplesB = GraphBuild.ererTriples(spark, sfDir, "B")
    def recIds(ents: DataFrame) = ents
      .filter(col("label").rlike("^r[0-9]+$"))
      .select(substring(col("label"), 2, 20).cast("long").as("rid"),
        col("ent_id"))
    val recA = recIds(entsA); val recB = recIds(entsB)
    val priors = GraphBuild.priorPairs(spark, sfDir)
      .join(recA.select(col("rid").as("idA"), col("ent_id").as("a")), "idA")
      .join(recB.select(col("rid").as("idB"), col("ent_id").as("b")), "idB")
      .select(col("a"), col("b"), lit(-1L).as("r"))
    // ETransE: add the evolution value pairs with their relation ids
    val aligned = if (!cfg.evolve) priors else {
      val prefixes = GraphBuild.Relations.zipWithIndex
        .map { case (rel, rid) => (rid.toLong, s"$rel:") }
        .toDF("r", "prefix")
      val evo = GraphBuild.evolutionPairs(spark, sfDir)
        .join(broadcast(prefixes), "r")
        .join(entsA.select(col("label").as("lblA"), col("ent_id").as("a")),
          concat(col("prefix"), col("val_a")) === col("lblA"))
        .join(entsB.select(col("label").as("lblB"), col("ent_id").as("b")),
          concat(col("prefix"), col("val_b")) === col("lblB"))
        .select(col("a"), col("b"), col("r"))
      priors.unionByName(evo)
    }
    val model = train(spark, triplesA, triplesB, aligned, nA, nB,
      GraphBuild.Relations.size, cfg)
    val mB = spark.sparkContext.broadcast((model.entA, model.entB, model.m))
    val out = graft.EntryStages.cand(spark, sfDir)
      .select(col("idA"), col("idB"),
        (col("dni_a") === col("dni_b")).cast("long").as("label"),
        col("split_a"), col("split_b"))
      .join(recA.select(col("rid").as("idA"), col("ent_id").as("ka")), "idA")
      .join(recB.select(col("rid").as("idB"), col("ent_id").as("kb")), "idB")
      .select(col("idA"), col("idB"), col("ka"), col("kb"), col("label"),
        col("split_a"), col("split_b"))
      .as[(Long, Long, Long, Long, Long, String, String)]
      .mapPartitions { it =>
        val (ea, eb, mm) = mB.value
        it.map { case (x, y, ka, kb, lbl, sa, sb) =>
          (x, y, Embed.cosine(matVec(mm, ea(ka.toInt)), eb(kb.toInt)), lbl,
            sa, sb)
        }
      }.toDF("idA", "idB", "cos", "label", "split_a", "split_b")
    entsA.unpersist(); entsB.unpersist()
    out
  }

  /** Summary row (shared by mtranse_eval / etranse_eval): theta swept
    * on the TRAIN-split pairs only, metrics reported on the TEST split. */
  def eval(spark: SparkSession, sfDir: String,
           cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val all = pairScores(spark, sfDir, cfg).persist()
    val dist = lit(1.0) - col("cos")
    val theta = graft.pipe.Threshold.bestThetaTrainSplit(
      all, dist, col("label"))
    val scores = all.filter(
      col("split_a") === "test" && col("split_b") === "test")
    val m = graft.eval.Metrics.pairMetrics(scores,
      (dist <= theta).cast("int"), col("label")).head()
    val ir = graft.eval.Metrics.irMetrics(scores, dist, col("label")).head()
    all.unpersist()
    Seq((cfg.dim.toLong, cfg.epochs.toLong, if (cfg.evolve) 1L else 0L, theta,
      m.getAs[Double]("f1"), m.getAs[Double]("precision"),
      m.getAs[Double]("recall"), ir.getAs[Double]("mrr")))
      .toDF("dim", "epochs", "evolve", "theta", "f1", "precision", "recall",
        "mrr")
  }
}
