package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SEEA-style iterative self-learning alignment
 * (/root/reference/EAR/seea.py:307-342): each iteration accepts the
 * top-beta MUTUALLY-nearest candidate pairs (argmin over idA AND over
 * idB agree, /root/reference/EAR/seea.py:252-286), removes every pair
 * touching an accepted endpoint from the candidate pool, and repeats
 * until no pair qualifies or maxIter. The reference re-trains
 * embeddings between iterations; here scores are fixed (the engine's
 * transitive growth is CC, SURVEY.md §7.3) — this operator exists for
 * semantics parity and as a high-precision pre-filter.
 *
 * Driver-orchestrated loop over DataFrames with localCheckpoint per
 * round (bounded lineage), exactly like the CC loop.
 */
object Seea {

  /**
   * @return accepted pairs (idA, idB, dist, label, iteration)
   */
  def iterate(spark: SparkSession, sfDir: String, beta: Int = 200,
              maxDist: Double = 0.5, maxIter: Int = 10): DataFrame = {
    import spark.implicits._
    var remaining = graft.EntryStages.scoredp(spark, sfDir)
      .select(col("idA"), col("idB"), col("dist"), col("label"))
      .filter(col("dist") <= maxDist)
      .localCheckpoint()
    var accepted: DataFrame = null
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val wa = Window.partitionBy("idA").orderBy(col("dist").asc, col("idB").asc)
      val wb = Window.partitionBy("idB").orderBy(col("dist").asc, col("idA").asc)
      val mutual = remaining
        .withColumn("ra", row_number().over(wa))
        .withColumn("rb", row_number().over(wb))
        .filter(col("ra") === 1 && col("rb") === 1)
        .orderBy(col("dist").asc, col("idA").asc)
        .limit(beta)
        .select(col("idA"), col("idB"), col("dist"), col("label"),
          lit(iter.toLong).as("iteration"))
        .localCheckpoint()
      val n = mutual.count()
      if (n == 0) done = true
      else {
        accepted = if (accepted == null) mutual
          else accepted.unionByName(mutual).localCheckpoint()
        // drop every candidate touching an accepted endpoint
        remaining = remaining
          .join(mutual.select(col("idA")), Seq("idA"), "left_anti")
          .join(mutual.select(col("idB")), Seq("idB"), "left_anti")
          .localCheckpoint()
        if (remaining.isEmpty) done = true
      }
      iter += 1
    }
    if (accepted == null)
      Seq.empty[(Long, Long, Double, Long, Long)]
        .toDF("idA", "idB", "dist", "label", "iteration")
    else accepted
  }
}
