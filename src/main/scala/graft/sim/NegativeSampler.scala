package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic negative sampling for embedding training: per positive
 * (truth) pair, emit `negRate` corrupted pairs whose B-side is replaced
 * by another member of the same block, rejecting true pairs — the
 * reference's rejection sampler (`get_negative_samples`,
 * /root/reference/common.py:72-129) with the coin-flip RNG replaced by
 * a seeded hash so output is replayable at any parallelism
 * (SURVEY.md §2.10: deterministic per-partition sampling).
 */
object NegativeSampler {

  private def fnvMix(a: Long, b: Long): Long = {
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
   * @return (idA, idB_neg, rep) — `negRate` corruptions per true pair.
   *
   * Scale shape: the per-block sampling universe is the DISTINCT
   * B-side id set (O(block members)) cogrouped with the block's TRUE
   * pairs (O(members)) — round 2 pulled the block's ENTIRE candidate
   * pair list into one task (`groupByKey` over pairs), which for the
   * deliberate sf0.1 hot block 'c0' is ~8M rows in a single task and
   * an OOM at 100x. Per-task memory is now O(members), never O(pairs).
   */
  def sample(spark: SparkSession, sfDir: String, negRate: Int = 3): DataFrame = {
    import spark.implicits._
    val cand = graft.EntryStages.cand(spark, sfDir)
    val bsByBlock = cand.select(col("block_key"), col("idB")).distinct()
      .as[(String, Long)].groupByKey(_._1)
    val truthByBlock = cand.filter(col("dni_a") === col("dni_b"))
      .select(col("block_key"), col("idA"), col("idB"))
      .as[(String, Long, Long)].groupByKey(_._1)
    truthByBlock.cogroup(bsByBlock) { (_, truthIt, bsIt) =>
      val bs = bsIt.map(_._2).toArray.sorted
      val truth = truthIt.map { case (_, a, b) => (a, b) }.toArray
        .sortBy(identity)
      val trueB = truth.groupBy(_._1)
        .map { case (a, ps) => a -> ps.map(_._2).toSet }
      truth.iterator.flatMap { case (a, b) =>
        val forbidden = trueB.getOrElse(a, Set.empty) + b
        val picks = Iterator.from(0)
          .map(r => bs(((fnvMix(a, r.toLong) % bs.length) + bs.length).toInt % bs.length))
          .filterNot(forbidden.contains)
          .take(math.min(negRate, math.max(bs.length - forbidden.size, 0)))
        picks.zipWithIndex.map { case (nb, rep) => (a, nb, rep.toLong) }
      }
    }.toDF("idA", "idB_neg", "rep")
      .orderBy("idA", "rep")
  }
}
