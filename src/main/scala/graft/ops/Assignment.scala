package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Optimal one-to-one assignment between the A-side and B-side members
 * of a block — the engine analogue of the reference's
 * Hungarian/household scoring (`linear_sum_assignment` over cosine
 * cost matrices of household members,
 * /root/reference/tests/test_transe_household.py:119-158).
 *
 * Matrices are family/block-sized, so the solver runs inside
 * `mapGroups` per block (typed, distributed across blocks); blocks
 * larger than `maxSide` fall back to greedy matching, bounding the
 * O(n^3) kernel (SURVEY.md §7.7).
 */
object Assignment {

  /**
   * Hungarian algorithm (Jonker-style O(n^2 m) shortest augmenting
   * path) on a rectangular cost matrix given as rows x cols; returns
   * for each row the assigned col (-1 if unassigned when rows > cols).
   */
  def solve(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    if (n == 0) return Array.empty
    val m = cost(0).length
    if (m == 0) return Array.fill(n)(-1)
    // transpose if rows > cols so rows <= cols
    if (n > m) {
      val t = Array.tabulate(m, n)((j, i) => cost(i)(j))
      val colOfRow = solve(t) // for transposed: rows=m
      val out = Array.fill(n)(-1)
      colOfRow.zipWithIndex.foreach { case (i, j) => if (i >= 0) out(i) = j }
      return out
    }
    // potentials + matching (1-indexed internals, classic implementation)
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1) // p(j) = row matched to col j
    val way = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = new Array[Boolean](m + 1)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        done = p(j0) == 0
      }
      while (j0 != 0) { p(j0) = p(way(j0)); j0 = way(j0) }
      i += 1
    }
    val out = Array.fill(n)(-1)
    var j = 1
    while (j <= m) { if (p(j) > 0) out(p(j) - 1) = j - 1; j += 1 }
    out
  }

  /** Greedy fallback for oversized blocks: repeatedly take the
    * globally cheapest remaining (row, col). */
  def greedy(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    if (n == 0) return Array.empty
    val m = cost(0).length
    val order = (for (i <- 0 until n; j <- 0 until m) yield (cost(i)(j), i, j))
      .sortBy { case (c, i, j) => (c, i, j) }
    val out = Array.fill(n)(-1)
    val usedCol = new Array[Boolean](m)
    order.foreach { case (_, i, j) =>
      if (out(i) < 0 && !usedCol(j)) { out(i) = j; usedCol(j) = true }
    }
    out
  }

  /**
   * Per-block optimal assignment over the scored candidate pairs:
   * returns (block_key, n_a, n_b, n_assigned, cost_micros, method).
   * Missing pairs (not candidates) get cost 1.0.
   */
  def blockAssignment(spark: SparkSession, sfDir: String,
                      maxSide: Int = 30): DataFrame = {
    import spark.implicits._
    val scored = graft.EntryStages.scoredp(spark, sfDir)
      .select(col("block_key"), col("idA"), col("idB"), col("dist"))
      .as[(String, Long, Long, Double)]
    scored.groupByKey(_._1).mapGroups { (key, it) =>
      val pairs = it.toArray
      val as = pairs.map(_._2).distinct.sorted
      val bs = pairs.map(_._3).distinct.sorted
      val aIdx = as.zipWithIndex.toMap
      val bIdx = bs.zipWithIndex.toMap
      val cost = Array.fill(as.length, bs.length)(1.0)
      pairs.foreach { case (_, a, b, d) => cost(aIdx(a))(bIdx(b)) = d }
      val (assign, method) =
        if (as.length <= maxSide && bs.length <= maxSide)
          (solve(cost), "hungarian")
        else (greedy(cost), "greedy")
      var total = 0L
      var nAssigned = 0L
      assign.zipWithIndex.foreach { case (j, i) =>
        if (j >= 0) { total += math.round(cost(i)(j) * 1000000); nAssigned += 1 }
      }
      (key, as.length.toLong, bs.length.toLong, nAssigned, total, method)
    }.toDF("block_key", "n_a", "n_b", "n_assigned", "cost_micros", "method")
      .orderBy("block_key")
  }
}
