package graft.oracle

import graft.ml.Weights

/**
 * DuckDB replay of the deterministic VEER fit
 * ([[graft.ml.Weights.veerFit]]): the flagship (jw, lev, cos) channels
 * recomputed from first principles (the shared
 * [[OracleSql.tgvecCtes]] trigram/projection block), micro-quantized
 * at the 1e-6 grid exactly where the Spark fit quantizes, then the
 * [[graft.ml.EmbedLogistic.fitBalancedOn]] class-balanced GD unrolled
 * one MATERIALIZED gradient + params CTE pair per iteration — the
 * ECM / fs_logreg / embed_logistic discipline over the scorer's
 * similarity channels.
 *
 * Why bit-exact: jw/lev are engine-bit-identical (DuckDB
 * jaro_winkler_similarity / levenshtein vs the Scala kernels, golden-
 * tested); the trigram cosine agrees only to ~1e-15 (summation order),
 * which the 1e-6 feature quantizer absorbs; per-row gradient
 * contributions are integer micro-units summed per CLASS (order-free
 * reduction); weights are nano-quantized after every update, so both
 * engines walk the identical double lattice.
 *
 * The grid sweep shares one GD chain per reg value: iteration k of the
 * (reg, 25) cell IS iteration k of the (reg, 100) cell, so the oracle
 * reads the 25-iteration snapshot out of the 100-iteration chain —
 * bit-identical to two independent fits because the GD is
 * deterministic in its prefix.
 */
object OracleSqlVeer {

  private val D = Weights.VeerFeatures.length
  private def dims = 0 until D
  private def csv(f: Int => String): String = dims.map(f).mkString(",\n    ")
  private def chain(f: Int => String): String = dims.map(f).mkString(" + ")

  /** floor(x*1e9 + 0.5)/1e9 — EmbedLogistic's q9 nano-quantizer. */
  private def q9(x: String): String =
    s"floor(($x) * 1000000000.0 + 0.5) / 1000000000.0"

  /** floor(x*1e6 + 0.5)/1e6 — the feature-grid quantizer
    * ([[graft.ml.Weights]] veerFeatDf). */
  private def mq6(x: String): String =
    s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

  /** Feature + train-slice + class-count CTEs shared by all veer
    * oracles. STAGED: x0..x2 = micro-quantized (jw, lev, cos) read
    * from the verified `scored_pairs_full` anchor dump — jw/lev are
    * the anchor's IEEE-exact doubles mq6-quantized here (the scorer's
    * equal-content short-circuit is already applied in the anchor,
    * and equals the kernels' own 1.0 for equal non-empty contents);
    * cos_micros IS the mq6 lattice integer (the anchor exports
    * floor(cos*1e6 + 0.5)), so `cos_micros / 1e6` reproduces
    * mq6(cos) exactly. The anchor itself is verified bit-exact
    * against the full tgvec/FNV first-principles replay in the same
    * oracle pass. */
  private val featCtes: String = s"""
, vf AS MATERIALIZED (
  SELECT f.idA, f.idB, CAST(f.label AS BIGINT) AS label,
    f.split_a, f.split_b,
    ${mq6("f.jw")} AS x0,
    ${mq6("f.lev")} AS x1,
    f.cos_micros / 1000000.0 AS x2
  FROM read_parquet('${OracleSql.OutDirToken}/scored_pairs_full/*.parquet') f
)
, vtrain AS MATERIALIZED (
  SELECT label, ${dims.map(d => s"x$d").mkString(", ")} FROM vf
  WHERE split_a = 'train' AND split_b = 'train'
)
, vnc AS (SELECT CAST(SUM(label) AS BIGINT) AS np,
    CAST(SUM(1 - label) AS BIGINT) AS nn FROM vtrain)"""

  /** GD chain `vit{reg-tag}0..{iters}`: one gradient + params CTE pair
    * per iteration, mirroring EmbedLogistic.fitBalancedOn literally
    * (z left-to-right then + b; per-class micro-unit sums; 0.5/np +
    * 0.5/nn mix; nano-quantized L2-regularized step). Rendered through
    * the ONE shared builder (ADVICE r4 — byte-identical to the former
    * inline copy, verified by a DumpOracle before/after diff). */
  private def gdCtes(sb: StringBuilder, pfx: String, reg: Double,
                     iters: Int): Unit =
    OracleSqlGd.gdCtes(sb, pfx, D, "vtrain", "vnc",
      Weights.VeerLr, reg, iters)

  /** Scoring tail under the params CTE `it`: dist = 1 - sigmoid(logit)
    * per pair, the robust 50-bucket train-split theta plateau
    * (Threshold.bestThetaTrainSplit's integer-bucket image, the same
    * SQL shape as OracleSqlTransE.scoringTail), and the test-split
    * confusion at dist <= theta. */
  private def confSql(it: String): String = {
    val zf = chain(d => s"i.w$d * f.x$d")
    s"""
, vsc_$it AS MATERIALIZED (
  SELECT f.idA, f.idB, f.label, f.split_a, f.split_b,
    1.0 - 1.0 / (1.0 + exp(-($zf + i.b))) AS dist
  FROM vf f CROSS JOIN $it i
)
, vswb_$it AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM vsc_$it WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, vsw_$it AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM vswb_$it
  )
)
, vfmax_$it AS (SELECT max(f1) AS fm FROM vsw_$it)
, vblo_$it AS (SELECT min(bucket) AS b FROM vsw_$it, vfmax_$it WHERE f1 = fm)
, vbhi_$it AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM vblo_$it)) AS b
    FROM vsw_$it, vfmax_$it, vblo_$it WHERE bucket > vblo_$it.b AND f1 < fm)
, vth_$it AS (SELECT CAST(floor(((SELECT b FROM vblo_$it) + (SELECT b FROM vbhi_$it)) / 2.0) AS BIGINT) / 50.0 AS th)
, vconf_$it AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM vth_$it) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM vth_$it) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM vth_$it) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM vth_$it) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM vsc_$it WHERE split_a = 'test' AND split_b = 'test'
)"""
  }

  /** veer_weights: (feature, weight_nanos) rows + the intercept row —
    * exact nano-lattice integers off the full GD-chain replay. */
  val veerWeights: String = {
    val sb = new StringBuilder(featCtes)
    gdCtes(sb, "vit", Weights.VeerReg, Weights.VeerIters)
    val names = Weights.VeerFeatures :+ "intercept"
    val pick = dims.map(d => s"WHEN $d THEN i.w$d").mkString(" ")
    sb ++= s"""
SELECT f.feature,
  CAST(floor((CASE f.d $pick ELSE i.b END) * 1e9 + 0.5) AS BIGINT)
    AS weight_nanos
FROM vit${Weights.VeerIters} i
CROSS JOIN (VALUES ${names.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")}) f(d, feature)"""
    OracleSql.q(sb.toString)
  }

  /** veer_metrics: test-split pair metrics of the default fit.
    * STAGED: the GD fit is verified by [[veerWeights]]' full chain
    * replay; this row reconstructs the exact lattice weights from the
    * verified nanos dump (`nanos / 1e9`) and re-derives only scoring +
    * theta plateau + confusion. */
  val veerMetrics: String = {
    val sb = new StringBuilder(featCtes)
    sb ++= s"""
, vwf AS (
  SELECT
    ${dims.map(d =>
      s"MAX(CASE WHEN feature = '${Weights.VeerFeatures(d)}' THEN " +
      s"weight_nanos END) / 1e9 AS w$d").mkString(",\n    ")},
    MAX(CASE WHEN feature = 'intercept' THEN weight_nanos END) / 1e9 AS b
  FROM read_parquet('${OracleSql.OutDirToken}/veer_weights/*.parquet')
)"""
    sb ++= confSql("vwf")
    sb ++= s"""
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  (tp + tn) / (tp + fp + fn + tn) AS accuracy
FROM vconf_vwf"""
    OracleSql.q(sb.toString)
  }

  /** One grid combo's output row: confusion-derived F1/P/R at the
    * swept theta plus the micro-unit MRR over the test ranking by
    * dist (ties by idB), all as DOUBLE — GridSearch.sweep's schema. */
  private def comboSql(sb: StringBuilder, it: String, maxIter: Int,
                       reg: Double): String = {
    sb ++= confSql(it)
    sb ++= s"""
, vrk_$it AS (
  SELECT idA, label,
    CAST(row_number() OVER (PARTITION BY idA
      ORDER BY dist ASC, idB ASC) AS BIGINT) AS rank
  FROM vsc_$it WHERE split_a = 'test' AND split_b = 'test'
)
, vqf_$it AS (
  SELECT idA, CAST(SUM(label) AS BIGINT) AS n_rel,
    CAST(coalesce(MIN(CASE WHEN label = 1 THEN rank END), 0) AS BIGINT)
      AS first_rel_rank
  FROM vrk_$it GROUP BY idA
)
, vir_$it AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
    CAST(coalesce(SUM(CAST(round(1000000.0 / first_rel_rank) AS BIGINT)), 0)
      AS BIGINT) AS srr
  FROM vqf_$it WHERE n_rel > 0
)"""
    s"""SELECT CAST($maxIter AS DOUBLE) AS max_iter, CAST($reg AS DOUBLE) AS reg,
  (SELECT CASE WHEN tp = 0 THEN 0.0
    ELSE tp * 2 / (tp * 2 + fp + fn) END FROM vconf_$it) AS f1,
  (SELECT CASE WHEN tp + fp = 0 THEN 0.0
    ELSE tp / (tp + fp) END FROM vconf_$it) AS precision,
  (SELECT CASE WHEN tp + fn = 0 THEN 0.0
    ELSE tp / (tp + fn) END FROM vconf_$it) AS recall,
  (SELECT srr / n_queries / 1000000.0 FROM vir_$it) AS mrr"""
  }

  /** grid_veer: reg x max_iter combos, one row each, sharing one GD
    * chain per reg (the 25-iteration cell reads the 100-chain's
    * snapshot). The (VeerReg, VeerIters) cell IS the default fit that
    * `veer_weights` bit-verifies from first principles, so that reg's
    * chain is emitted only to the SHORTER iteration cells and the
    * full-iteration params are read back from the verified nano dump
    * (weight_nanos / 1e9 reconstructs the q9-lattice doubles exactly
    * — the embed_logistic_metrics staging pattern; saved ~27 s/gate
    * run, see VERIFY_BUDGET.json). */
  val gridVeer: String = {
    val regs = Weights.VeerGridRegs
    val itersCells = Weights.VeerGridIters
    require(regs.contains(Weights.VeerReg) &&
      itersCells.max == Weights.VeerIters &&
      itersCells.exists(_ < Weights.VeerIters),
      s"grid_veer stages its (VeerReg, VeerIters) cell on the " +
        s"veer_weights dump — the grid no longer contains it: " +
        s"regs=$regs iters=$itersCells")
    val sb = new StringBuilder(featCtes)
    val tags = regs.zipWithIndex.map { case (r, i) => (r, s"vg${i}_") }
    tags.foreach { case (r, pfx) =>
      val upTo = if (r == Weights.VeerReg)
        itersCells.filter(_ < Weights.VeerIters).max
      else itersCells.max
      gdCtes(sb, pfx, r, upTo)
      if (r == Weights.VeerReg) sb ++= s"""
, $pfx${Weights.VeerIters} AS (
  SELECT
    ${dims.map(d =>
      s"MAX(CASE WHEN feature = '${Weights.VeerFeatures(d)}' THEN " +
      s"weight_nanos END) / 1e9 AS w$d").mkString(",\n    ")},
    MAX(CASE WHEN feature = 'intercept' THEN weight_nanos END) / 1e9 AS b
  FROM read_parquet('${OracleSql.OutDirToken}/veer_weights/*.parquet')
)"""
    }
    val selects = for {
      (r, pfx) <- tags
      it <- itersCells
    } yield comboSql(sb, s"$pfx$it", it, r)
    sb ++= "\n" + selects.mkString("\nUNION ALL\n")
    OracleSql.q(sb.toString)
  }
}
