package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic negative sampling for embedding training — the
 * reference's rejection sampler (`get_negative_samples`,
 * /root/reference/common.py:72-129) with the coin-flip RNG replaced by
 * a seeded hash so output is replayable at any parallelism
 * (SURVEY.md §2.10: deterministic per-partition sampling).
 *
 * Two surfaces:
 *  - [[sample]]: pair-level (blocking candidates) — per true pair emit
 *    `negRate` corruptions, each corrupting the HEAD or the TAIL side
 *    by a seeded fair coin (the reference's `rand_choice`), drawing the
 *    replacement from the same block and rejecting true pairs.
 *  - [[sampleTriples]]: triple-level (ER graph) — head/tail entity
 *    corruption at `negRate` plus `negRelRate` RELATION corruptions
 *    per triple (`(h, t, r')` with `r' != r`, rejecting triples that
 *    exist in the graph — the reference's `neg_rel_rate` path,
 *    /root/reference/common.py:117-127).
 */
object NegativeSampler {

  private[graft] def fnvMix(a: Long, b: Long): Long = {
    var h = 0xcbf29ce484222325L
    def step(x: Long): Unit = {
      var v = x
      var i = 0
      while (i < 8) { h = (h ^ (v & 0xff)) * 0x100000001b3L; v >>>= 8; i += 1 }
    }
    step(a); step(b)
    h
  }

  /**
   * @return (idA, idB_neg, rep, corrupt_kind) — `negRate` corruptions
   *         per true pair; corrupt_kind is "head" or "tail" by a seeded
   *         fair coin per (pair, rep), mirroring the reference's equal-
   *         probability head/tail replacement. A "tail" row replaces
   *         the B side (idA kept, idB_neg the replacement); a "head"
   *         row replaces the A side (idA is the replacement, idB_neg
   *         the kept true B) — rejecting true pairs in both cases.
   *
   * Scale shape: the per-block sampling universe is the DISTINCT
   * per-side id set (O(block members)) cogrouped with the block's TRUE
   * pairs (O(members)) — round 2 pulled the block's ENTIRE candidate
   * pair list into one task (`groupByKey` over pairs), which for the
   * deliberate sf0.1 hot block 'c0' is ~8M rows in a single task and
   * an OOM at 100x. Per-task memory is now O(members), never O(pairs).
   */
  def sample(spark: SparkSession, sfDir: String, negRate: Int = 3): DataFrame = {
    import spark.implicits._
    val cand = graft.EntryStages.cand(spark, sfDir)
    val sidesByBlock = cand.select(col("block_key"), col("idA"), col("idB"))
      .distinct()
      .as[(String, Long, Long)].groupByKey(_._1)
    val truthByBlock = cand.filter(col("dni_a") === col("dni_b"))
      .select(col("block_key"), col("idA"), col("idB"))
      .as[(String, Long, Long)].groupByKey(_._1)
    truthByBlock.cogroup(sidesByBlock) { (_, truthIt, sidesIt) =>
      val sides = sidesIt.toArray
      val bs = sides.map(_._3).distinct.sorted
      val as = sides.map(_._2).distinct.sorted
      val truth = truthIt.map { case (_, a, b) => (a, b) }.toArray
        .sortBy(identity)
      val trueB = truth.groupBy(_._1)
        .map { case (a, ps) => a -> ps.map(_._2).toSet }
      val trueA = truth.groupBy(_._2)
        .map { case (b, ps) => b -> ps.map(_._1).toSet }
      truth.iterator.flatMap { case (a, b) =>
        // seeded fair coin per (pair, rep): which side to corrupt
        (0 until negRate).iterator.flatMap { repIdx =>
          val coin = fnvMix(fnvMix(a, b), repIdx.toLong)
          if ((coin & 1L) == 0L) {
            // tail: replace B within the block, reject true partners
            val forbidden = trueB.getOrElse(a, Set.empty) + b
            Iterator.from(0)
              .map(r => bs(((fnvMix(a, repIdx.toLong * 131071 + r.toLong)
                % bs.length) + bs.length).toInt % bs.length))
              .filterNot(forbidden.contains)
              .take(if (bs.length - forbidden.size > 0) 1 else 0)
              .map(nb => (a, nb, repIdx.toLong, "tail"))
          } else {
            // head: replace A within the block, reject true partners
            val forbidden = trueA.getOrElse(b, Set.empty) + a
            Iterator.from(0)
              .map(r => as(((fnvMix(b, repIdx.toLong * 131071 + r.toLong)
                % as.length) + as.length).toInt % as.length))
              .filterNot(forbidden.contains)
              .take(if (as.length - forbidden.size > 0) 1 else 0)
              .map(na => (na, b, repIdx.toLong, "head"))
          }
        }
      }
    }.toDF("idA", "idB_neg", "rep", "corrupt_kind")
      .orderBy("idA", "idB_neg", "rep", "corrupt_kind")
  }

  /**
   * Triple-level corruption over the ER graph: per triple, `negRate`
   * head-or-tail entity corruptions (seeded coin, replacement drawn
   * from the full entity range, rejecting triples present in the
   * graph) and `negRelRate` relation corruptions (`r' != r`, rejecting
   * existing triples) — /root/reference/common.py:72-129 with
   * `total_rel > 1`.
   *
   * @return (h, t, r, h_neg, t_neg, r_neg, corrupt_kind, rep) — the
   *         `_neg` columns carry the corrupted triple (two of the three
   *         equal the originals).
   *
   * Scale shape: one shuffle to co-partition triples by `h`
   * (mapPartitions over the localized triple array per partition would
   * need the triple SET for rejection anyway) — rejection uses a
   * per-partition sorted packed-key array built once from a broadcast
   * of the graph's packed triples (8 bytes/triple; the ER graph is
   * O(records x fields), ~16 MB at sf0.1-equivalent 2M triples, the
   * same order as the trainers' broadcast embedding matrices).
   */
  def sampleTriples(spark: SparkSession, sfDir: String, negRate: Int = 2,
                    negRelRate: Int = 1): DataFrame = {
    import spark.implicits._
    val triples = graft.graph.GraphBuild.erTriples(spark, sfDir)
      .select(col("h").cast("long"), col("t").cast("long"),
        col("r").cast("long"))
      .as[(Long, Long, Long)]
    val nEnt = graft.graph.GraphBuild.erEntities(spark, sfDir).count()
    val nRel = graft.graph.GraphBuild.Relations.size.toLong
    val packed = triples.map { case (h, t, r) => (h * nRel + r) * nEnt + t }
      .collect().sorted
    val packedB = spark.sparkContext.broadcast(packed)
    val out = triples.mapPartitions { it =>
      val sortedPacked = packedB.value
      def isTriple(h: Long, t: Long, r: Long): Boolean =
        java.util.Arrays.binarySearch(
          sortedPacked, (h * nRel + r) * nEnt + t) >= 0
      it.flatMap { case (h, t, r) =>
        val entRows = (0 until negRate).iterator.flatMap { rep =>
          val coin = fnvMix(fnvMix(h, t), fnvMix(r, rep.toLong))
          def draw(i: Int): Long = {
            val d = fnvMix(coin, i.toLong)
            ((d % nEnt) + nEnt) % nEnt
          }
          if ((coin & 1L) == 0L) {
            Iterator.from(0).map(draw)
              .filter(hn => hn != h && !isTriple(hn, t, r))
              .take(1).map(hn => (h, t, r, hn, t, r, "head", rep.toLong))
          } else {
            Iterator.from(0).map(draw)
              .filter(tn => tn != t && !isTriple(h, tn, r))
              .take(1).map(tn => (h, t, r, h, tn, r, "tail", rep.toLong))
          }
        }
        val relRows =
          if (nRel <= 1) Iterator.empty
          else (0 until negRelRate).iterator.flatMap { rep =>
            val coin = fnvMix(fnvMix(h, t), fnvMix(r, 0x5ee
              + rep.toLong))
            Iterator.from(0)
              .map(i => ((fnvMix(coin, i.toLong) % nRel) + nRel) % nRel)
              .filter(rn => rn != r && !isTriple(h, t, rn))
              .take(1).map(rn => (h, t, r, h, t, rn, "rel", rep.toLong))
          }
        entRows ++ relRows
      }
    }.toDF("h", "t", "r", "h_neg", "t_neg", "r_neg", "corrupt_kind", "rep")
    out.orderBy("h", "t", "r", "corrupt_kind", "rep")
  }
}
