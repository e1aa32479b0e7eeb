package graft.oracle

/**
 * Shared SQL image of [[graft.ml.EmbedLogistic.fitBalancedOn]] — the
 * deterministic class-balanced full-batch GD (z accumulated
 * left-to-right then + b; per-row gradient contributions micro-
 * quantized and summed PER CLASS as integers; 0.5/np + 0.5/nn class
 * mix; nano-quantized L2-regularized steps) — parameterized by feature
 * count, source CTEs and hyperparameters, so replays over different
 * feature families (batch-RLTransE field channels, and future fits)
 * share one builder. OracleSqlVeer.gdCtes re-renders through this
 * builder (byte-identical to its former inline copy — DumpOracle
 * before/after diff). ONE earlier, byte-validated copy deliberately
 * stays inline: the iteration loop in OracleSqlTransE.elCtes, whose
 * CTE names (`el_g<k>`/`el_it<k>`, vs this builder's
 * `<pfx>g<k>`/`<pfx><k>`) and line layout differ — re-rendering it
 * would change the oracle's SQL bytes, invalidating the verified
 * image and the VERIFY_BUDGET fingerprint for zero semantic gain.
 * Any change to the GD image must be applied in both places.
 */
private[oracle] object OracleSqlGd {

  def q9(x: String): String =
    s"floor(($x) * 1000000000.0 + 0.5) / 1000000000.0"

  def microQ(x: String): String =
    s"CAST(floor(($x) * 1000000.0 + 0.5) AS BIGINT)"

  /** floor(x*1e6 + 0.5)/1e6 — the feature-grid quantizer. */
  def mq6(x: String): String =
    s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

  /**
   * Emits params CTEs `<pfx>0` .. `<pfx><iters>` (columns w0..w{n-1},
   * b) fitted over `trainCte(label, x0..x{n-1})` with class counts
   * from `ncCte(np, nn)`.
   */
  def gdCtes(sb: StringBuilder, pfx: String, nFeat: Int,
             trainCte: String, ncCte: String,
             lr: Double, reg: Double, iters: Int): Unit = {
    val dims = 0 until nFeat
    def csv(f: Int => String) = dims.map(f).mkString(",\n    ")
    def chain(f: Int => String) = dims.map(f).mkString(" + ")
    sb ++= s"""
, ${pfx}0 AS (SELECT ${csv(d => s"0.0::DOUBLE AS w$d")}, 0.0::DOUBLE AS b)"""
    val z = chain(d => s"i.w$d * f.x$d")
    for (k <- 0 until iters) {
      sb ++= s"""
, ${pfx}g$k AS MATERIALIZED (
  SELECT
    ${csv(d => s"CAST(SUM(CASE WHEN label = 1 THEN c$d ELSE 0 END) AS BIGINT) AS p$d")},
    ${csv(d => s"CAST(SUM(CASE WHEN label = 0 THEN c$d ELSE 0 END) AS BIGINT) AS n$d")},
    CAST(SUM(CASE WHEN label = 1 THEN cb ELSE 0 END) AS BIGINT) AS pb,
    CAST(SUM(CASE WHEN label = 0 THEN cb ELSE 0 END) AS BIGINT) AS nb
  FROM (
    SELECT label,
      ${csv(d => microQ(s"resid * x$d") + s" AS c$d")},
      ${microQ("resid")} AS cb
    FROM (
      SELECT f.label, ${dims.map(d => s"f.x$d").mkString(", ")},
        (1.0 / (1.0 + exp(-($z + i.b))) -
         CASE WHEN f.label = 1 THEN 1.0 ELSE 0.0 END) AS resid
      FROM $trainCte f CROSS JOIN ${pfx}$k i
    )
  )
)
, ${pfx}${k + 1} AS MATERIALIZED (
  SELECT
    ${csv(d => q9(s"i.w$d - $lr::DOUBLE * ((0.5::DOUBLE * " +
        s"(g.p$d / 1000000.0) / nc.np + 0.5::DOUBLE * (g.n$d / 1000000.0) " +
        s"/ nc.nn) + $reg::DOUBLE * i.w$d)") + s" AS w$d")},
    ${q9(s"i.b - $lr::DOUBLE * (0.5::DOUBLE * " +
        s"(g.pb / 1000000.0) / nc.np + 0.5::DOUBLE * (g.nb / 1000000.0) " +
        s"/ nc.nn)")} AS b
  FROM ${pfx}$k i, ${pfx}g$k g, $ncCte nc
)"""
    }
  }
}
