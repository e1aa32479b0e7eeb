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
   */
  def sample(spark: SparkSession, sfDir: String, negRate: Int = 3): DataFrame = {
    import spark.implicits._
    val cand = graft.EntryStages.cand(spark, sfDir)
      .select(col("block_key"), col("idA"), col("idB"),
        (col("dni_a") === col("dni_b")).cast("int").as("is_true"))
      .as[(String, Long, Long, Int)]
    cand.groupByKey(_._1).flatMapGroups { (_, it) =>
      val rows = it.toArray
      val bs = rows.map(_._3).distinct.sorted
      val trueB = rows.filter(_._4 == 1).groupBy(_._2)
        .map { case (a, ps) => a -> ps.map(_._3).toSet }
      rows.filter(_._4 == 1).iterator.flatMap { case (_, a, b, _) =>
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
