package graft.oracle

import graft.sim.TransE

/**
 * DuckDB replay of the ENTIRE distributed TransE/TransH training run
 * plus its linkage eval ([[graft.sim.TransE.eval]]) — epochs unrolled
 * as CTE chains, like the ECM/logreg/kmeans fit oracles but for the
 * embedding trainer itself.
 *
 * Why this is bit-exact (the trainer's replay discipline,
 * TransE.scala):
 *  - init is the FNV-seeded [[TransE.initComponent]] — replayed
 *    through the same fnvMixChainW CTE machinery as the sampler
 *    oracles;
 *  - negative tails are fnvMix draws keyed by the PACKED triple id
 *    ((h*nRel + r)*nEnt + t) and the (epoch, j) counter — pure integer
 *    inputs both engines share;
 *  - per-triple gradient contributions are quantized to integer
 *    micro-units BEFORE the cross-triple sum (plain TransE's signum
 *    sums are already integers; TransH's projected gradients go
 *    through the floor(x*1e6+0.5) quantizer), so the reduction is
 *    integer addition — order-free in both engines;
 *  - every double chain (L1 distances, hyperplane dot products, norms,
 *    cosines) is unrolled LITERALLY LEFT-TO-RIGHT, matching the Scala
 *    loops' accumulation order, and model values are float-rounded
 *    (CAST .. AS REAL = .toFloat) after each update/normalize, so both
 *    engines walk the identical float lattice;
 *  - everything downstream (robust train-split theta plateau,
 *    confusion counts, micro-unit MRR) is the integer-count discipline
 *    the flagship oracles already use.
 *
 * The replays cover the REGISTERED configs (TransE.Config() defaults,
 * tail corruption only, for `transe_eval`; + transH=true for
 * `transh_eval`) — the negRelRate / tailRanges variants stay rows-only
 * with ScalaTest bands.
 */
object OracleSqlTransE {

  private val Cfg = TransE.Config()
  private val D = Cfg.dim
  private val NRel = graft.graph.GraphBuild.Relations.size
  private[oracle] def dims = 0 until D

  /** Literal left-to-right sum chain over the dims. */
  private[oracle] def chain(f: Int => String): String = dims.map(f).mkString(" + ")

  private[oracle] def csv(f: Int => String): String = dims.map(f).mkString(",\n    ")

  /** floor(x*1e6 + 0.5) micro-unit quantizer — [[TransE]]'s microQ. */
  private[oracle] def microQ(x: String): String =
    s"CAST(floor(($x) * 1000000.0 + 0.5) AS BIGINT)"

  /** Bytes needed to cover value v (>= 1). */
  private[oracle] def bytesFor(v: Long): Int = {
    var b = 1; var lim = 256L
    while (v >= lim && b < 8) { b += 1; lim *= 256 }
    b
  }

  /** (h >>> 11)/2^53 -> [-bound, bound) float init component — the SQL
    * image of [[TransE.initComponent]]'s tail given the chain column. */
  private[oracle] def initExpr(h: String): String =
    s"CAST((CAST($h >> 11 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0)" +
      s" * (6.0 / sqrt(${D}.0)) AS REAL)"

  /** L2 normalization pair: stage 1 computes the squared norm `s` from
    * columns `<in>0..`, stage 2 emits `<out>d` float-rounded. */
  private[oracle] def normStage2(inPfx: String, outPfx: String): String =
    csv(d => s"CASE WHEN s > 0 THEN CAST($inPfx$d::DOUBLE * (1.0 / sqrt(s))" +
      s" AS REAL) ELSE $inPfx$d END AS $outPfx$d")

  /** Matrix init CTEs: fnv chain over (rowExpr*4 + matId, seed*64 + j),
    * pivot to wide columns `<outPfx>0..`, optional L2 normalization —
    * the SQL image of TransE.train's init block. */
  private[oracle] def initMatrix(sb: StringBuilder, chainPre: String, srcCte: String,
                         rowCol: String, matId: Int, xBytes: Int,
                         outCte: String, idCol: String, outPfx: String,
                         normalize: Boolean): Unit = {
    val seedY = Cfg.seed * 64
    sb ++= OracleSql.fnvMixChainW(chainPre, srcCte,
      s"($rowCol * 8 + $matId)::HUGEINT", s"($seedY + j)::HUGEINT",
      xBytes, bytesFor(seedY + D - 1))
    val pivot = csv(d =>
      s"max(CASE WHEN j = $d THEN ${initExpr(chainPre + "_h")} END) AS c$d")
    if (!normalize) {
      sb ++= s"""
, $outCte AS MATERIALIZED (
  SELECT $rowCol AS $idCol,
    ${csv(d => s"max(CASE WHEN j = $d THEN ${initExpr(chainPre + "_h")} END) AS $outPfx$d")}
  FROM ${chainPre}4 GROUP BY $rowCol
)"""
    } else {
      sb ++= s"""
, ${outCte}w AS (
  SELECT $rowCol AS $idCol, $pivot
  FROM ${chainPre}4 GROUP BY $rowCol
)
, ${outCte}s AS (SELECT $idCol, ${dims.map(d => s"c$d").mkString(", ")},
    (${chain(d => s"c$d::DOUBLE * c$d::DOUBLE")}) AS s FROM ${outCte}w)
, $outCte AS MATERIALIZED (
  SELECT $idCol, ${normStage2("c", outPfx)}
  FROM ${outCte}s
)"""
    }
  }

  /** One epoch's update CTE for a matrix whose gradient keys start at
    * `keyBase` ("" = the row id itself), optionally L2-normalized. */
  private[oracle] def updateMatrix(sb: StringBuilder, e: Int, inCte: String,
                           outCte: String, idCol: String, pfx: String,
                           keyBase: String, normalize: Boolean): Unit = {
    val key = if (keyBase.isEmpty) s"m.$idCol" else s"$keyBase + m.$idCol"
    val from =
      if (keyBase.isEmpty) s"$inCte m LEFT JOIN te_g$e g ON g.tgt = $key"
      else s"$inCte m CROSS JOIN te_n LEFT JOIN te_g$e g ON g.tgt = $key"
    val upd = csv(d => s"CAST((m.$pfx$d::DOUBLE - ${Cfg.lr}::DOUBLE * " +
      s"(COALESCE(g.g$d, 0)::DOUBLE / 1000000.0)) AS REAL) AS u$d")
    if (!normalize) {
      sb ++= s"""
, $outCte AS MATERIALIZED (
  SELECT m.$idCol, ${csv(d => s"CAST((m.$pfx$d::DOUBLE - ${Cfg.lr}::DOUBLE * " +
        s"(COALESCE(g.g$d, 0)::DOUBLE / 1000000.0)) AS REAL) AS $pfx$d")}
  FROM $from
)"""
    } else {
      sb ++= s"""
, ${outCte}u AS (
  SELECT $idCol, ${dims.map(d => s"u$d").mkString(", ")},
    (${chain(d => s"u$d::DOUBLE * u$d::DOUBLE")}) AS s
  FROM (
    SELECT m.$idCol, $upd
    FROM $from
  )
)
, $outCte AS MATERIALIZED (
  SELECT $idCol, ${normStage2("u", pfx)}
  FROM ${outCte}u
)"""
    }
  }

  /** The ER-graph triple select ([[OracleSql.graphErTriples]]'s body). */
  private val erTripleSelect = """
  SELECT eh.ent_id AS h, et.ent_id AS t, rawt.rel_id AS r
  FROM rawt
  JOIN ents eh ON eh.label = rawt.rec
  JOIN ents et ON et.label = rawt.value"""

  /** The ERER joint-KG triple select (ER triples + `same_as` prior
    * edges, [[OracleSql.graphErerJointTriples]]'s body). */
  private val jointTripleSelect = erTripleSelect + s"""
  UNION ALL
  SELECT ra.ent_id, rb.ent_id, CAST($NRel AS BIGINT)
  FROM (SELECT idA, idB FROM cand
        WHERE dni_a = dni_b AND dni_a % 10 < 3) p
  JOIN ents ra ON ra.label = 'r' || CAST(p.idA AS VARCHAR)
  JOIN ents rb ON rb.label = 'r' || CAST(p.idB AS VARCHAR)"""

  /** Shared training scaffolding + per-epoch unroll: rawt/ents, packed
    * idx, FNV init, negative draws, `epochs` rounds of gradient +
    * update CTEs. Leaves `te_e<epochs>` as the trained entity matrix. */
  private def trainCtes(sb: StringBuilder, transH: Boolean, nRel: Int,
                        epochs: Int, tripleSelect: String): Unit = {
    val negKeyMax = epochs.toLong * Cfg.negRate - 1
    sb ++= OracleSql.rawtCte
    sb ++= s"""
, te_n AS (SELECT CAST(count(*) AS BIGINT) AS ne FROM ents)
, te_rawtrip AS ($tripleSelect)
, te_trip AS MATERIALIZED (
  SELECT h, t, r, (h * $nRel + r) * te_n.ne + t AS idx
  FROM te_rawtrip CROSS JOIN te_n
)
, te_isrc AS (SELECT e.ent_id AS row, rj.j FROM ents e CROSS JOIN range(0, $D) rj(j))
, te_rsrc AS (SELECT rr.rid, rj.j FROM range(0, $nRel) rr(rid) CROSS JOIN range(0, $D) rj(j))"""
    initMatrix(sb, "tei", "te_isrc", "row", 0, 5, "te_e0", "ent_id", "e",
      normalize = true)
    // relation rows are NOT normalized under the registered configs
    // (normalizeRel=false, negRelRate=0), mirroring TransE.train
    initMatrix(sb, "ter", "te_rsrc", "rid", 1, 2, "te_r0", "rid", "r",
      normalize = false)
    if (transH)
      initMatrix(sb, "tew", "te_rsrc", "rid", 2, 2, "te_w0", "rid", "w",
        normalize = true)
    sb ++= s"""
, te_negsrc AS (
  SELECT t.h, t.t, t.r, t.idx, e.ep, j.j
  FROM te_trip t
  CROSS JOIN range(0, $epochs) e(ep)
  CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("ten", "te_negsrc",
      "idx::HUGEINT", s"(ep * ${Cfg.negRate} + j)::HUGEINT",
      7, bytesFor(negKeyMax max 1))
    sb ++= s"""
, te_negs AS MATERIALIZED (
  SELECT h, t, r, ep, tn FROM (
    SELECT h, t, r, ep,
      CAST((((${OracleSql.signed64("ten_h")}) % te_n.ne) + te_n.ne) % te_n.ne AS BIGINT) AS tn
    FROM ten4 CROSS JOIN te_n
  ) WHERE tn <> t
)"""
    for (e <- 0 until epochs) {
      if (!transH) plainEpoch(sb, e) else transHEpoch(sb, e, nRel)
      updateMatrix(sb, e, s"te_e$e", s"te_e${e + 1}", "ent_id", "e",
        "", normalize = true)
      updateMatrix(sb, e, s"te_r$e", s"te_r${e + 1}", "rid", "r",
        "te_n.ne", normalize = false)
      if (transH)
        updateMatrix(sb, e, s"te_w$e", s"te_w${e + 1}", "rid", "w",
          s"te_n.ne + $nRel", normalize = true)
    }
  }

  /** Trainer + linkage eval (transe_eval / transh_eval). */
  private def evalSql(transH: Boolean): String = {
    val sb = new StringBuilder
    trainCtes(sb, transH, NRel, Cfg.epochs, erTripleSelect)
    sb ++= scoringSql(s"te_e${Cfg.epochs}")
    OracleSql.q(sb.toString)
  }

  /** Plain-TransE epoch: active hinges (L1 margin over h+r-t vs
    * h+r-t'), integer signum gradients — TransE.train's !transH arm. */
  private def plainEpoch(sb: StringBuilder, e: Int): Unit = {
    sb ++= s"""
, te_ac$e AS MATERIALIZED (
  SELECT h, t, tn, r,
    ${csv(d => s"CASE WHEN p$d > 0 THEN 1 WHEN p$d < 0 THEN -1 ELSE 0 END AS sp$d")},
    ${csv(d => s"CASE WHEN q$d > 0 THEN 1 WHEN q$d < 0 THEN -1 ELSE 0 END AS sn$d")}
  FROM (
    SELECT n.h, n.t, n.tn, n.r,
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - et.e$d::DOUBLE) AS p$d")},
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - en.e$d::DOUBLE) AS q$d")}
    FROM te_negs n
    JOIN te_e$e eh ON eh.ent_id = n.h
    JOIN te_e$e et ON et.ent_id = n.t
    JOIN te_e$e en ON en.ent_id = n.tn
    JOIN te_r$e rr ON rr.rid = n.r
    WHERE n.ep = $e
  )
  WHERE (${chain(d => s"abs(p$d)")}) - (${chain(d => s"abs(q$d)")}) + ${Cfg.margin} > 0
)
, te_g$e AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT h AS tgt, ${csv(d => s"(sp$d - sn$d) * 1000000 AS g$d")} FROM te_ac$e
    UNION ALL SELECT t, ${csv(d => s"-sp$d * 1000000")} FROM te_ac$e
    UNION ALL SELECT tn, ${csv(d => s"sn$d * 1000000")} FROM te_ac$e
    UNION ALL SELECT te_n.ne + r, ${csv(d => s"(sp$d - sn$d) * 1000000")}
      FROM te_ac$e CROSS JOIN te_n
  ) GROUP BY tgt
)"""
  }

  /** TransH epoch: hyperplane-projected L1 hinge
    * v = (h - t) - (w.(h - t)) w + d_r, projected subgradients, each
    * contribution micro-quantized — TransE.train's transH arm. The
    * layered subqueries keep every expression referenced ONCE per
    * level (dtP/dtN -> wduP/wduN -> termP/termN -> sp/sn -> swP/swN),
    * mirroring the Scala kernel's intermediate variables. */
  private def transHEpoch(sb: StringBuilder, e: Int, nRel: Int): Unit = {
    sb ++= s"""
, te_ac$e AS MATERIALIZED (
  SELECT h, t, tn, r,
    ${dims.map(d => s"sp$d").mkString(", ")},
    ${dims.map(d => s"sn$d").mkString(", ")},
    ${dims.map(d => s"wd$d").mkString(", ")},
    ${dims.map(d => s"dtP$d").mkString(", ")},
    ${dims.map(d => s"dtN$d").mkString(", ")},
    wduP, wduN,
    (${chain(d => s"sp$d::DOUBLE * wd$d")}) AS swP,
    (${chain(d => s"sn$d::DOUBLE * wd$d")}) AS swN
  FROM (
    SELECT *,
      ${csv(d => s"CASE WHEN termP$d > 0 THEN 1 WHEN termP$d < 0 THEN -1 ELSE 0 END AS sp$d")},
      ${csv(d => s"CASE WHEN termN$d > 0 THEN 1 WHEN termN$d < 0 THEN -1 ELSE 0 END AS sn$d")}
    FROM (
      SELECT *,
        ${csv(d => s"(dtP$d - wduP * wd$d + re$d) AS termP$d")},
        ${csv(d => s"(dtN$d - wduN * wd$d + re$d) AS termN$d")}
      FROM (
        SELECT *,
          (${chain(d => s"wd$d * dtP$d")}) AS wduP,
          (${chain(d => s"wd$d * dtN$d")}) AS wduN
        FROM (
          SELECT n.h, n.t, n.tn, n.r,
            ${csv(d => s"(eh.e$d::DOUBLE - et.e$d::DOUBLE) AS dtP$d")},
            ${csv(d => s"(eh.e$d::DOUBLE - en.e$d::DOUBLE) AS dtN$d")},
            ${csv(d => s"ww.w$d::DOUBLE AS wd$d")},
            ${csv(d => s"rr.r$d::DOUBLE AS re$d")}
          FROM te_negs n
          JOIN te_e$e eh ON eh.ent_id = n.h
          JOIN te_e$e et ON et.ent_id = n.t
          JOIN te_e$e en ON en.ent_id = n.tn
          JOIN te_r$e rr ON rr.rid = n.r
          JOIN te_w$e ww ON ww.rid = n.r
          WHERE n.ep = $e
        )
      )
    )
    WHERE (${chain(d => s"abs(termP$d)")}) - (${chain(d => s"abs(termN$d)")}) + ${Cfg.margin} > 0
  )
)
, te_g$e AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT h AS tgt, ${csv(d => microQ(
      s"(sp$d - swP * wd$d) - (sn$d - swN * wd$d)") + s" AS g$d")} FROM te_ac$e
    UNION ALL SELECT t, ${csv(d => "-" + microQ(s"sp$d - swP * wd$d"))} FROM te_ac$e
    UNION ALL SELECT tn, ${csv(d => microQ(s"sn$d - swN * wd$d"))} FROM te_ac$e
    UNION ALL SELECT te_n.ne + r, ${csv(d => s"(sp$d - sn$d) * 1000000")}
      FROM te_ac$e CROSS JOIN te_n
    UNION ALL SELECT te_n.ne + $nRel + r, ${csv(d => microQ(
      s"(-((swP * dtP$d) + (wduP * sp$d))) + ((swN * dtN$d) + (wduN * sn$d))"))}
      FROM te_ac$e CROSS JOIN te_n
  ) GROUP BY tgt
)"""
  }

  /** Record label -> model-row id: the ER-dictionary default
    * (TransE/TransH score over the ER entity matrix directly). */
  private[oracle] val DefaultRecent: String = """
, te_recent AS (
  SELECT CAST(substr(label, 2) AS BIGINT) AS rid, ent_id
  FROM ents WHERE regexp_matches(label, '^r[0-9]+$')
)"""

  /** Final-model cosine scoring over the candidate pairs, robust
    * train-split theta plateau, test confusion + micro-unit MRR — the
    * SQL image of TransE.pairScores + TransE.eval. `recentCte` supplies
    * the record->model-row dictionary (KrEar remaps through its own
    * dense entity dictionary). */
  private[oracle] def scoringSql(fin: String,
                                 recentCte: String = DefaultRecent,
                                 dimOut: Long = D.toLong,
                                 epochsOut: Long = Cfg.epochs.toLong): String =
    s"""$recentCte
, te_tj AS (
  SELECT c.idA, c.idB,
    CAST(CASE WHEN c.dni_a = c.dni_b THEN 1 ELSE 0 END AS BIGINT) AS label,
    c.split_a, c.split_b,
    ${csv(d => s"ea.e$d AS a$d")},
    ${csv(d => s"eb.e$d AS b$d")}
  FROM cand c
  JOIN te_recent ra ON ra.rid = c.idA
  JOIN $fin ea ON ea.ent_id = ra.ent_id
  JOIN te_recent rb ON rb.rid = c.idB
  JOIN $fin eb ON eb.ent_id = rb.ent_id
)""" + scoringTail(dimOut, epochsOut)

  /** The scoring tail after `te_tj` (which must carry idA, idB, label,
    * split_a, split_b, a0.., b0..): cosine dists, robust train-split
    * theta, confusion + MRR, final summary row. `extraCols` injects
    * additional literal output columns (e.g. MTransE's `evolve`). */
  private[oracle] def scoringTail(dimOut: Long, epochsOut: Long,
                                  extraCols: String = ""): String =
    s"""
, te_tsc AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b,
    1.0 - (CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
                ELSE dot / sqrt(na * nb) END) AS dist
  FROM (
    SELECT idA, idB, label, split_a, split_b,
      (${chain(d => s"a$d::DOUBLE * b$d::DOUBLE")}) AS dot,
      (${chain(d => s"a$d::DOUBLE * a$d::DOUBLE")}) AS na,
      (${chain(d => s"b$d::DOUBLE * b$d::DOUBLE")}) AS nb
    FROM te_tj
  )
)
, te_swb AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM te_tsc WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, te_sw AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM te_swb
  )
)
, te_fmax AS (SELECT max(f1) AS fm FROM te_sw)
, te_blo AS (SELECT min(bucket) AS b FROM te_sw, te_fmax WHERE f1 = fm)
, te_bhi AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM te_blo)) AS b
    FROM te_sw, te_fmax, te_blo WHERE bucket > te_blo.b AND f1 < fm)
, te_th AS (SELECT CAST(floor(((SELECT b FROM te_blo) + (SELECT b FROM te_bhi)) / 2.0) AS BIGINT) / 50.0 AS th)
, te_conf AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM te_th) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM te_th) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM te_th) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM te_tsc WHERE split_a = 'test' AND split_b = 'test'
)
, te_rk AS (
  SELECT idA, label,
    CAST(row_number() OVER (PARTITION BY idA ORDER BY dist, idB) AS BIGINT) AS rank
  FROM te_tsc WHERE split_a = 'test' AND split_b = 'test'
)
, te_qf AS (
  SELECT idA, CAST(SUM(label) AS BIGINT) AS n_rel,
    CAST(coalesce(MIN(CASE WHEN label = 1 THEN rank END), 0) AS BIGINT) AS first_rel_rank
  FROM te_rk GROUP BY idA
)
, te_ir AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
    CAST(coalesce(SUM(CAST(round(1000000.0 / first_rel_rank) AS BIGINT)), 0) AS BIGINT) AS srr
  FROM te_qf WHERE n_rel > 0
)
SELECT CAST($dimOut AS BIGINT) AS dim, CAST($epochsOut AS BIGINT) AS epochs,
  $extraCols(SELECT th FROM te_th) AS theta,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  (SELECT srr / n_queries / 1000000.0 FROM te_ir) AS mrr
FROM te_conf"""

  val transeEval: String = evalSql(transH = false)
  val transhEval: String = evalSql(transH = true)

  // --- LogisticTransH over the joint KG (graft.ml.EmbedLogistic) ---

  private val El = graft.ml.EmbedLogistic.Config()

  /** floor(x*1e9 + 0.5)/1e9 — EmbedLogistic's q9 nano-quantizer. */
  private def q9(x: String): String =
    s"floor(($x) * 1000000000.0 + 0.5) / 1000000000.0"

  /** Joint-KG TransH replay + micro-quantized gauss features + the
    * class-balanced GD chain (one MATERIALIZED gradient + params CTE
    * pair per iteration, the ECM/fs_logreg pattern). Leaves
    * `el_it<iters>` (w0..w<dim-1>, b) and `el_feat`. */
  private def elCtes(sb: StringBuilder): Unit = {
    trainCtes(sb, transH = true, NRel + 1, El.epochs, jointTripleSelect)
    val fin = s"te_e${El.epochs}"
    val gauss = (d: Int) =>
      s"floor(pow(2.0::DOUBLE, -pow(abs(ea.e$d::DOUBLE - eb.e$d::DOUBLE)" +
        s" / ${El.gaussScale}::DOUBLE, 2.0)) * 1000000.0 + 0.5) / 1000000.0"
    sb ++= s"""
, te_recent AS (
  SELECT CAST(substr(label, 2) AS BIGINT) AS rid, ent_id
  FROM ents WHERE regexp_matches(label, '^r[0-9]+$$')
)
, el_feat AS MATERIALIZED (
  SELECT c.idA, c.idB,
    CAST(CASE WHEN c.dni_a = c.dni_b THEN 1 ELSE 0 END AS BIGINT) AS label,
    c.split_a, c.split_b,
    ${csv(d => s"${gauss(d)} AS x$d")}
  FROM cand c
  JOIN te_recent ra ON ra.rid = c.idA
  JOIN $fin ea ON ea.ent_id = ra.ent_id
  JOIN te_recent rb ON rb.rid = c.idB
  JOIN $fin eb ON eb.ent_id = rb.ent_id
)
, el_train AS MATERIALIZED (
  SELECT label, ${dims.map(d => s"x$d").mkString(", ")} FROM el_feat
  WHERE split_a = 'train' AND split_b = 'train'
)
, el_nc AS (SELECT CAST(SUM(label) AS BIGINT) AS np,
    CAST(SUM(1 - label) AS BIGINT) AS nn FROM el_train)
, el_it0 AS (SELECT ${dims.map(d => s"0.0::DOUBLE AS w$d").mkString(", ")},
    0.0::DOUBLE AS b)"""
    val zChain = chain(d => s"i.w$d * f.x$d")
    for (k <- 0 until El.iters) {
      sb ++= s"""
, el_g$k AS MATERIALIZED (
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
        (1.0 / (1.0 + exp(-($zChain + i.b))) -
         CASE WHEN f.label = 1 THEN 1.0 ELSE 0.0 END) AS resid
      FROM el_train f CROSS JOIN el_it$k i
    )
  )
)
, el_it${k + 1} AS MATERIALIZED (
  SELECT
    ${csv(d => q9(s"i.w$d - ${El.lr}::DOUBLE * ((0.5::DOUBLE * (g.p$d / 1000000.0) / nc.np" +
      s" + 0.5::DOUBLE * (g.n$d / 1000000.0) / nc.nn) + ${El.reg}::DOUBLE * i.w$d)") + s" AS w$d")},
    ${q9(s"i.b - ${El.lr}::DOUBLE * (0.5::DOUBLE * (g.pb / 1000000.0) / nc.np" +
      s" + 0.5::DOUBLE * (g.nb / 1000000.0) / nc.nn)")} AS b
  FROM el_it$k i, el_g$k g, el_nc nc
)"""
    }
  }

  /** embed_logistic_metrics: test-split confusion of `logit >= 0`. */
  val embedLogisticMetrics: String = {
    val sb = new StringBuilder
    elCtes(sb)
    val fitZ = chain(d => s"i.w$d * f.x$d")
    sb ++= s"""
, el_conf AS (
  SELECT
    CAST(SUM(CASE WHEN ($fitZ + i.b) >= 0 AND f.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN ($fitZ + i.b) >= 0 AND f.label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN ($fitZ + i.b) < 0 AND f.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN ($fitZ + i.b) < 0 AND f.label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM el_feat f CROSS JOIN el_it${El.iters} i
  WHERE f.split_a = 'test' AND f.split_b = 'test'
)
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  (tp + tn) / (tp + fp + fn + tn) AS accuracy
FROM el_conf"""
    OracleSql.q(sb.toString)
  }

  /** embed_logistic_weights: the fitted parameter surface itself —
    * d in [0, dim) the weights, d = dim the intercept. */
  val embedLogisticWeights: String = {
    val sb = new StringBuilder
    elCtes(sb)
    sb ++= s"""
SELECT CAST(r.d AS BIGINT) AS d,
  CASE r.d ${dims.map(d => s"WHEN $d THEN i.w$d").mkString(" ")}
    WHEN $D THEN i.b END AS weight
FROM el_it${El.iters} i CROSS JOIN range(0, ${D + 1}) r(d)"""
    OracleSql.q(sb.toString)
  }
}
