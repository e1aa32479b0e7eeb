package graft.sim

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.StringSim

/** A candidate pair with both payloads (input to the scorer). */
case class CandPair(
    idA: Long, idB: Long, block_key: String,
    content_a: String, content_b: String,
    dni_a: Long, dni_b: Long, split_a: String, split_b: String)

/** A fully scored pair (output of the scorer). */
case class ScoredPair(
    idA: Long, idB: Long, jw: Double, lev: Double, cos: Double,
    score: Double, label: Int, split_a: String, split_b: String)

/**
 * Batched pairwise scorer: Jaro-Winkler + normalized Levenshtein +
 * embedding cosine, computed in ONE `mapPartitions` pass over the
 * candidate-pair Dataset with the projection matrix broadcast to
 * executors — the north-rule shape, mirroring the reference's
 * per-candidate cosine scoring over a pulled embedding matrix
 * (/root/reference/tests/er/test_transe.py:46-51,
 * /root/reference/tests/test_census_rl.py:63-103).
 *
 * Exact-match short-circuit: equal normalized contents score 1.0
 * without computing JW/Levenshtein/cosine, as the reference
 * short-circuits equal values (/root/reference/tests/test_census_rl.py:73-76).
 *
 * Per-partition embedding cache: within a block, each record's content
 * appears in many pairs; vectors are memoized per partition so hot
 * (salted) blocks don't recompute trigram hashes per pair.
 */
object Scorer {

  /** Flagship combined score in [0,1]; weights fixed, deterministic. */
  final val WJw = 0.3
  final val WLev = 0.4
  final val WCos = 0.3

  def score(
      pairs: Dataset[CandPair],
      proj: Broadcast[Array[Array[Double]]]): Dataset[ScoredPair] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { it =>
      val mat = proj.value
      val cache = new java.util.HashMap[String, Array[Double]](1 << 12)
      def vec(s: String): Array[Double] = {
        var v = cache.get(s)
        if (v == null) {
          v = Embed.vector(s, mat)
          if (cache.size < (1 << 16)) cache.put(s, v)
        }
        v
      }
      it.map { p =>
        val label = if (p.dni_a == p.dni_b) 1 else 0
        if (p.content_a == p.content_b) {
          ScoredPair(p.idA, p.idB, 1.0, 1.0, 1.0, 1.0, label, p.split_a, p.split_b)
        } else {
          val jw = StringSim.jaroWinkler(p.content_a, p.content_b)
          val lev = StringSim.levSim(p.content_a, p.content_b)
          val cos = Embed.cosine(vec(p.content_a), vec(p.content_b))
          val s = WJw * jw + WLev * lev + WCos * cos
          ScoredPair(p.idA, p.idB, jw, lev, cos, s, label, p.split_a, p.split_b)
        }
      }
    }
  }

  /** DataFrame convenience over [[Blocking.candidates]] output. */
  def scoreDF(candidates: DataFrame,
              proj: Broadcast[Array[Array[Double]]]): DataFrame = {
    import candidates.sparkSession.implicits._
    score(candidates.selectExpr(
      "idA", "idB", "block_key", "content_a", "content_b",
      "dni_a", "dni_b", "split_a", "split_b").as[CandPair], proj).toDF()
  }

  def broadcastProjection(spark: SparkSession): Broadcast[Array[Array[Double]]] =
    spark.sparkContext.broadcast(Embed.projection())
}
