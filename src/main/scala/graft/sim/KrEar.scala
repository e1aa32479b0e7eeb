package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphBuild

/**
 * KR-EAR: knowledge embedding with separate RELATIONAL and
 * ATTRIBUTIONAL encoders (/root/reference/EAR/kr_ear.py:148-224):
 *
 * - relational triples (record -> shared entity) train with the plain
 *   TransE margin loss `max(0, ||h+r-t||_1 - mean||h+r-t'||_1 + m)`;
 * - attributional triples (record -> literal value) train with
 *   `score = ||tanh(h_proj + a) - v||_1` hinged against corrupted
 *   VALUES, where `h_proj = h - (h.n_a) n_a` projects the record onto
 *   the attribute's hyperplane (kr_ear.py _attr_calc/_transfer,
 *   :151-161), and the two losses run as ALTERNATING optimizers per
 *   epoch (kr_ear.py train loop).
 *
 * Spark shape mirrors [[TransE.train]]: the model (entity + value +
 * relation + attribute + projection matrices) broadcasts per epoch,
 * each loss runs one mapPartitions pass emitting sparse gradients in
 * exact integer micro-units, gradients reduce by row id in one shuffle
 * (order-independent -> bit-deterministic), and only model-sized rows
 * reach the driver. Entity/value rows re-normalize per epoch as the
 * reference normalizes per lookup.
 *
 * REPLAY DISCIPLINE (the DuckDB oracle re-runs the whole training,
 * [[graft.oracle.OracleSqlKrEar]]): FNV-seeded init
 * ([[TransE.initComponent]], matrix slots 0=ent 1=value 2=rel 3=attr
 * 4=proj), fnvMix negative draws on integer keys, explicit-double
 * per-dim chains in loop order, per-contribution micro-quantization
 * before the order-free integer reduction, float-rounded model values
 * — plus one extra rule the TransE replay doesn't need: `tanh` is NOT
 * correctly rounded and may differ by 1 ulp between the JVM and
 * DuckDB's libm, so every tanh OUTPUT is micro-quantized
 * (floor(tanh(x)*1e6+0.5)/1e6) before any downstream use, in both
 * engines.
 */
object KrEar {

  /**
   * @param negRelRate RELATION corruptions per triple per epoch, in
   *        BOTH encoders (the reference passes neg_rel_rate to
   *        get_negative_samples for the relational AND attributional
   *        triple sets, /root/reference/EAR/kr_ear.py:31-36): the
   *        relational branch corrupts `r`, the attributional branch
   *        corrupts the attribute id `a` (its vector AND hyperplane),
   *        both rejecting corrupted triples that exist.
   */
  final case class Config(
      // epochs = 5: both encoders stay in their quality band (spec);
      // the gate's replay budget prices each epoch twice (rel + attr)
      dim: Int = 16, epochs: Int = 5, lr: Double = 0.1,
      margin: Double = 1.0, negRate: Int = 2, seed: Long = 42L,
      negRelRate: Int = 0)

  final case class Model(
      ent: Array[Array[Float]], value: Array[Array[Float]],
      rel: Array[Array[Float]], attr: Array[Array[Float]],
      proj: Array[Array[Float]],
      relLoss: Array[Double], attrLoss: Array[Double])

  /** The sampler-oracle hash stream ([[NegativeSampler.fnvMix]]) —
    * SQL-replayable, unlike the round-3 custom mix. */
  private def mix(a: Long, b: Long): Long = NegativeSampler.fnvMix(a, b)

  private final val Micro = 1e6

  /** floor(x*1e6+0.5) — quantizes per-triple gradient contributions to
    * exact micro-units (see TransE.microQ). */
  private def microQ(x: Double): Long = math.floor(x * Micro + 0.5).toLong

  /** Micro-quantized tanh via `1 - 2/(exp(2x)+1)` — DuckDB v1.0 has no
    * tanh builtin, so BOTH engines compute this exact formula (exp is
    * then the only transcendental; the exp->Inf saturation limit is
    * exactly ±1, no NaN) and snap to the 1e-6 lattice so a 1-ulp libm
    * exp divergence cannot leak into scores or gradients. */
  private def tanhQ(x: Double): Double = {
    val t = 1.0 - 2.0 / (math.exp(x * 2.0) + 1.0)
    math.floor(t * Micro + 0.5) / Micro
  }

  /**
   * EAR id spaces from the ER dictionary: entities = records + targets
   * of relational triples (block/repo nodes); values = attributional
   * literals. Returns (entDict(label_ent_id -> kr id),
   * valDict, relTriples(h,t,r'), attrTriples(h,v,a')) where r'/a' are
   * densely re-indexed within their own family.
   */
  def prepare(spark: SparkSession, sfDir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ear = GraphBuild.earTriples(spark, sfDir).persist()
    val rels = GraphBuild.Relations
    val relIdx = GraphBuild.RelationalRels.map(r => rels.indexOf(r).toLong)
      .zipWithIndex.toMap
    val attrIdx = GraphBuild.AttributionalRels.map(r => rels.indexOf(r).toLong)
      .zipWithIndex.toMap
    val relT = ear.filter(col("is_attr") === 0)
    val attrT = ear.filter(col("is_attr") === 1)
    // entity ids: heads (records) + relational tails, densely packed —
    // distributed sort+zipWithIndex, not a single-task global window
    val entIds = GraphBuild.denseIds(
      relT.select(col("h").as("eid"))
        .union(attrT.select(col("h").as("eid")))
        .union(relT.select(col("t").as("eid"))).distinct(),
      "eid", "kid")
    val valIds = GraphBuild.denseIds(
      attrT.select(col("t").as("eid")).distinct(), "eid", "kid")
    def remapRel(df: DataFrame, idx: Map[Long, Int]): DataFrame = {
      val m = typedLit(idx.map { case (k, v) => (k, v.toLong) })
      df.withColumn("rk", element_at(m, col("r")))
    }
    val relOut = remapRel(relT, relIdx)
      .join(entIds.select(col("eid").as("h"), col("kid").as("hk")), "h")
      .join(entIds.select(col("eid").as("t"), col("kid").as("tk")), "t")
      .select(col("hk").as("h"), col("tk").as("t"), col("rk").as("r"))
    val attrOut = remapRel(attrT, attrIdx)
      .join(entIds.select(col("eid").as("h"), col("kid").as("hk")), "h")
      .join(valIds.select(col("eid").as("t"), col("kid").as("vk")), "t")
      .select(col("hk").as("h"), col("vk").as("v"), col("rk").as("a"))
    // materialize the remap joins once: the trainer re-reads these per
    // persist and the dictionary windows are the expensive part
    val relP = relOut.persist(); val attrP = attrOut.persist()
    relP.count(); attrP.count()
    ear.unpersist()
    (entIds.persist(), valIds.persist(), relP, attrP)
  }

  def train(spark: SparkSession, relTriples: DataFrame,
            attrTriples: DataFrame, nEnt: Int, nVal: Int,
            cfg: Config = Config()): Model = {
    import spark.implicits._
    val nRel = GraphBuild.RelationalRels.size
    val nAttr = GraphBuild.AttributionalRels.size
    val dim = cfg.dim
    def init(matId: Int, n: Int) = Array.tabulate(n)(row =>
      Array.tabulate(dim)(j =>
        TransE.initComponent(matId, row, j, cfg.seed, dim)))
    val ent = init(0, nEnt); ent.foreach(Embed.l2normalize)
    val value = init(1, nVal); value.foreach(Embed.l2normalize)
    val rel = init(2, nRel)
    val attr = init(3, nAttr)
    val proj = init(4, nAttr); proj.foreach(Embed.l2normalize)

    // gradient row-id layout
    val offVal = nEnt.toLong
    val offRel = offVal + nVal
    val offAttr = offRel + nRel
    val offProj = offAttr + nAttr

    // 8 partitions: gradient rows duplicate per partition (see
    // TransE.train) — keep the shuffle model-sized, not 64x model-sized.
    // localCheckpoint truncates the logical plan to a leaf: without it
    // every epoch re-analyzes the full upstream lineage (windows,
    // dictionary joins), which dominates the epoch wall time.
    val relData = relTriples.select(col("h").cast("long"),
      col("t").cast("long"), col("r").cast("long"))
      .as[(Long, Long, Long)].repartition(8).localCheckpoint()
    val attrData = attrTriples.select(col("h").cast("long"),
      col("v").cast("long"), col("a").cast("long"))
      .as[(Long, Long, Long)].repartition(8).localCheckpoint()

    // Packed rejection indexes for relation/attribute corruption
    // (8 bytes/triple, broadcast once — see TransE.train)
    val nRelL0 = nRel.toLong; val nAttrL0 = nAttr.toLong
    val nEntL0 = nEnt.toLong; val nValL0 = nVal.toLong
    val relPacked: Array[Long] =
      if (cfg.negRelRate > 0)
        relData.map { case (h, t, r) => (h * nRelL0 + r) * nEntL0 + t }
          .collect().sorted
      else Array.emptyLongArray
    val attrPacked: Array[Long] =
      if (cfg.negRelRate > 0)
        attrData.map { case (h, v, a) => (h * nAttrL0 + a) * nValL0 + v }
          .collect().sorted
      else Array.emptyLongArray
    val relPackedB = spark.sparkContext.broadcast(relPacked)
    val attrPackedB = spark.sparkContext.broadcast(attrPacked)

    val relLoss = new Array[Double](cfg.epochs)
    val attrLoss = new Array[Double](cfg.epochs)

    def reduceApply(rows: org.apache.spark.sql.Dataset[(Long, Array[Long])],
                    lossSink: Long => Unit): Unit = {
      // RDD reduceByKey at width 8 (map-side combine, exact long sums
      // -> order-free) instead of the 64-partition typed shuffle; see
      // TransE.train for the rationale
      val reduced = rows.rdd.reduceByKey({ (a, b) =>
        val s = new Array[Long](a.length)
        var i = 0
        while (i < s.length) { s(i) = a(i) + b(i); i += 1 }
        s
      }, 8).collect()
      reduced.foreach { case (id, gv) =>
        if (id == -1L) lossSink(gv(0))
        else {
          val target =
            if (id < offVal) ent(id.toInt)
            else if (id < offRel) value((id - offVal).toInt)
            else if (id < offAttr) rel((id - offRel).toInt)
            else if (id < offProj) attr((id - offAttr).toInt)
            else proj((id - offProj).toInt)
          var i = 0
          while (i < dim) {
            target(i) =
              (target(i).toDouble - cfg.lr * (gv(i).toDouble / Micro)).toFloat
            i += 1
          }
        }
      }
    }

    var epoch = 0
    while (epoch < cfg.epochs) {
      val b = spark.sparkContext.broadcast((ent, value, rel, attr, proj))
      val ep = epoch
      val negRate = cfg.negRate
      val margin = cfg.margin
      val nEntL = nEnt.toLong
      val nValL = nVal.toLong

      val negRelRate = cfg.negRelRate
      val nRelL = nRel.toLong
      val nAttrL = nAttr.toLong
      // ---- relational encoder: plain TransE over entity space ----
      val relRows = relData.mapPartitions { it =>
        val (e, _, r, _, _) = b.value
        val relSorted = relPackedB.value
        val acc = new java.util.HashMap[Long, Array[Long]]()
        var lossMicro = 0L
        def g(id: Long): Array[Long] = {
          var v = acc.get(id)
          if (v == null) { v = new Array[Long](dim); acc.put(id, v) }
          v
        }
        it.foreach { case (h, t, rl) =>
          // relation corruption: (h, t, r') with r' != r, rejecting
          // real triples (seeded, replayable)
          var jr = 0
          while (jr < negRelRate && nRelL > 1) {
            var rNeg = -1L
            var att = 0
            while (rNeg < 0 && att < 16) {
              val d = mix(h * 31 + t,
                0x27220a95L + (ep.toLong * negRelRate + jr) * 31 + att)
              val c = ((d % nRelL) + nRelL) % nRelL
              if (c != rl && java.util.Arrays.binarySearch(
                  relSorted, (h * nRelL + c) * nEntL + t) < 0) rNeg = c
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
                val gh = g(h); val gt = g(t)
                val gr = g(offRel + rl); val grn = g(offRel + rNeg)
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
            val tNeg = {
              val d = mix(h * 31 + t, ep.toLong * negRate + j)
              ((d % nEntL) + nEntL) % nEntL
            }
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
                val gh = g(h); val gt = g(t); val gn = g(tNeg)
                val gr = g(offRel + rl)
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
        import scala.jdk.CollectionConverters._
        val lossRow = {
          val a = new Array[Long](dim)
          a(0) = lossMicro
          (-1L, a)
        }
        Iterator.single(lossRow) ++
          acc.entrySet().asScala.iterator.map(kv => (kv.getKey, kv.getValue))
      }
      reduceApply(relRows, m => relLoss(ep) = m / Micro)
      ent.foreach(Embed.l2normalize)

      // ---- attributional encoder: |tanh(h_proj + a) - v| hinge ----
      val b2 = spark.sparkContext.broadcast((ent, value, rel, attr, proj))
      val attrRows = attrData.mapPartitions { it =>
        val (e, vv, _, av, pj) = b2.value
        val acc = new java.util.HashMap[Long, Array[Long]]()
        var lossMicro = 0L
        def g(id: Long): Array[Long] = {
          var v = acc.get(id)
          if (v == null) { v = new Array[Long](dim); acc.put(id, v) }
          v
        }
        // score of ||tanhQ(hp + a) - v||_1 (quantized tanh — see tanhQ)
        def attrScore(h: Array[Float], n: Array[Float], a: Array[Float],
                      v: Array[Float]): Double = {
          var hn = 0.0
          var i = 0
          while (i < dim) { hn += h(i).toDouble * n(i); i += 1 }
          var s = 0.0
          i = 0
          while (i < dim) {
            val hp = h(i).toDouble - hn * n(i)
            s += math.abs(tanhQ(hp + a(i)) - v(i))
            i += 1
          }
          s
        }
        // signed gradient of attrScore(e(h), pj(at), av(at), vv(v))
        // into the accumulators — used by the attribute-corruption
        // hinge, whose pos and neg terms live on DIFFERENT attribute
        // hyperplanes (unlike the value-corruption loop below, which
        // shares one h_proj + a for both terms)
        def accumAttrGrad(h: Long, at: Long, v: Long, sign: Double): Unit = {
          val eh = e(h.toInt); val ev = vv(v.toInt)
          val ea = av(at.toInt); val nv = pj(at.toInt)
          val gh = g(h); val gv = g(offVal + v)
          val ga = g(offAttr + at); val gp = g(offProj + at)
          var hn = 0.0
          var i = 0
          while (i < dim) { hn += eh(i).toDouble * nv(i); i += 1 }
          val gHp = new Array[Double](dim)
          i = 0
          while (i < dim) {
            val hp = eh(i).toDouble - hn * nv(i)
            val z = tanhQ(hp + ea(i))
            val s = math.signum(z - ev(i))
            val dz = (1.0 - z * z) * s * sign
            gHp(i) = dz
            ga(i) += microQ(dz)
            gv(i) += microQ(-s * sign)
            i += 1
          }
          var gnd = 0.0
          i = 0
          while (i < dim) { gnd += gHp(i) * nv(i); i += 1 }
          i = 0
          while (i < dim) {
            gh(i) += microQ(gHp(i) - gnd * nv(i))
            gp(i) += microQ(-(gnd * eh(i).toDouble + hn * gHp(i)))
            i += 1
          }
        }
        val attrSorted = attrPackedB.value
        it.foreach { case (h, v, at) =>
          // attribute corruption: (h, v, a') with a' != a — corrupts
          // the attribute VECTOR and its HYPERPLANE together, rejecting
          // real (h, v, a') triples
          var jr = 0
          while (jr < negRelRate && nAttrL > 1) {
            var aNeg = -1L
            var attTry = 0
            while (aNeg < 0 && attTry < 16) {
              val d = mix(h * 37 + v,
                0x5851f42dL + (ep.toLong * negRelRate + jr) * 31 + attTry)
              val c = ((d % nAttrL) + nAttrL) % nAttrL
              if (c != at && java.util.Arrays.binarySearch(
                  attrSorted, (h * nAttrL + c) * nValL + v) < 0) aNeg = c
              attTry += 1
            }
            if (aNeg >= 0) {
              val eh = e(h.toInt); val ev = vv(v.toInt)
              val pos = attrScore(eh, pj(at.toInt), av(at.toInt), ev)
              val neg = attrScore(eh, pj(aNeg.toInt), av(aNeg.toInt), ev)
              val l = pos - neg + margin
              if (l > 0) {
                lossMicro += microQ(l)
                accumAttrGrad(h, at, v, 1.0)
                accumAttrGrad(h, aNeg, v, -1.0)
              }
            }
            jr += 1
          }
          var j = 0
          while (j < negRate) {
            val vNeg = {
              val d = mix(h * 37 + v, (ep.toLong + 7919) * negRate + j)
              ((d % nValL) + nValL) % nValL
            }
            if (vNeg != v) {
              val eh = e(h.toInt); val ev = vv(v.toInt)
              val en = vv(vNeg.toInt); val ea = av(at.toInt)
              val nv = pj(at.toInt)
              val pos = attrScore(eh, nv, ea, ev)
              val neg = attrScore(eh, nv, ea, en)
              val l = pos - neg + margin
              if (l > 0) {
                lossMicro += microQ(l)
                val gh = g(h); val gv = g(offVal + v); val gn = g(offVal + vNeg)
                val ga = g(offAttr + at); val gp = g(offProj + at)
                var hn = 0.0
                var i = 0
                while (i < dim) { hn += eh(i).toDouble * nv(i); i += 1 }
                // accumulate d(loss)/d(hp) to backprop through the
                // hyperplane projection in a second pass
                val gHp = new Array[Double](dim)
                i = 0
                while (i < dim) {
                  val hp = eh(i).toDouble - hn * nv(i)
                  val z = tanhQ(hp + ea(i))
                  val sP = math.signum(z - ev(i))
                  val sN = math.signum(z - en(i))
                  val dz = 1.0 - z * z // same h_proj + a for pos and neg
                  val dHpA = dz * sP - dz * sN
                  gHp(i) = dHpA
                  ga(i) += microQ(dHpA)
                  gv(i) += microQ(-sP)
                  gn(i) += microQ(sN)
                  i += 1
                }
                // h gradient through (I - n n^T); n gradient
                var gn_dot = 0.0
                i = 0
                while (i < dim) { gn_dot += gHp(i) * nv(i); i += 1 }
                i = 0
                while (i < dim) {
                  gh(i) += microQ(gHp(i) - gn_dot * nv(i))
                  gp(i) += microQ(-(gn_dot * eh(i).toDouble + hn * gHp(i)))
                  i += 1
                }
              }
            }
            j += 1
          }
        }
        import scala.jdk.CollectionConverters._
        val lossRow = {
          val a = new Array[Long](dim)
          a(0) = lossMicro
          (-1L, a)
        }
        Iterator.single(lossRow) ++
          acc.entrySet().asScala.iterator.map(kv => (kv.getKey, kv.getValue))
      }
      reduceApply(attrRows, m => attrLoss(ep) = m / Micro)
      ent.foreach(Embed.l2normalize)
      value.foreach(Embed.l2normalize)
      proj.foreach(Embed.l2normalize)
      // sphere-project rel/attr rows under relation corruption: each
      // receives a hinge term from every triple of its relation per
      // epoch and diverges un-normalized (see TransE.train)
      if (cfg.negRelRate > 0) {
        rel.foreach(Embed.l2normalize)
        attr.foreach(Embed.l2normalize)
      }
      b.destroy(); b2.destroy()
      epoch += 1
    }
    relData.unpersist(); attrData.unpersist()
    relPackedB.destroy(); attrPackedB.destroy()
    Model(ent, value, rel, attr, proj, relLoss, attrLoss)
  }

  /** Cosine pair scores over trained RECORD embeddings (the EAR census
    * eval shape, /root/reference/tests/ear/test_kr_ear.py). */
  def pairScores(spark: SparkSession, sfDir: String,
                 cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val (entIds, valIds, relT, attrT) = prepare(spark, sfDir)
    val entP = entIds
    val nEnt = entP.count().toInt
    val nVal = valIds.count().toInt
    val model = train(spark, relT, attrT, nEnt, nVal, cfg)
    // record rows of the ER dictionary -> kr entity ids, by join
    val recs = GraphBuild.erEntities(spark, sfDir)
      .filter(col("label").rlike("^r[0-9]+$"))
      .select(substring(col("label"), 2, 20).cast("long").as("rid"),
        col("ent_id").as("eid"))
      .join(entP, "eid")
      .select(col("rid"), col("kid"))
    val entB = spark.sparkContext.broadcast(model.ent)
    val out = graft.EntryStages.cand(spark, sfDir)
      .select(col("idA"), col("idB"),
        (col("dni_a") === col("dni_b")).cast("long").as("label"),
        col("split_a"), col("split_b"))
      .join(recs.select(col("rid").as("idA"), col("kid").as("kA")), "idA")
      .join(recs.select(col("rid").as("idB"), col("kid").as("kB")), "idB")
      .select(col("idA"), col("idB"), col("kA"), col("kB"), col("label"),
        col("split_a"), col("split_b"))
      .as[(Long, Long, Long, Long, Long, String, String)]
      .mapPartitions { it =>
        val e = entB.value
        it.map { case (a, bb, ka, kb, lbl, sa, sb) =>
          (a, bb, Embed.cosine(e(ka.toInt), e(kb.toInt)), lbl, sa, sb)
        }
      }.toDF("idA", "idB", "cos", "label", "split_a", "split_b")
    entP.unpersist(); valIds.unpersist(); relT.unpersist(); attrT.unpersist()
    out
  }

  /** Summary row: theta swept on the TRAIN-split pairs only, F1/P/R and
    * MRR reported on the TEST split (never tuned on the reported set). */
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
    Seq((cfg.dim.toLong, cfg.epochs.toLong, theta,
      m.getAs[Double]("f1"), m.getAs[Double]("precision"),
      m.getAs[Double]("recall"), ir.getAs[Double]("mrr")))
      .toDF("dim", "epochs", "theta", "f1", "precision", "recall", "mrr")
  }
}
