package graft.oracle

import graft.sim.MTransE
import graft.graph.GraphBuild

/**
 * DuckDB replay of the MTransE / ETransE dual-KG training run +
 * linkage eval ([[graft.sim.MTransE.eval]]): per-side TransE passes,
 * the dim x dim alignment-matrix pass (hinge on ||M a - b||_1 against
 * mean-of-corrupted-partners), and — for ETransE — per-relation
 * evolution vectors over the prior value pairs, all unrolled per epoch
 * under the TransE replay discipline (FNV init slots 0..5, fnvMix
 * draws, left-to-right double chains, per-contribution micro
 * quantization, float-rounded model values).
 *
 * The alignment gradients include the matrix terms: grad_a = M^T eff
 * (a 16-term column dot per output dim, replayed off a one-row pivot
 * of the m matrix) and grad_M[i] = eff_i * a (sixteen UNION branches,
 * one per matrix row) — the prior-pair set is tiny (~0.03 x true
 * pairs), so these wide branches cost nothing.
 */
object OracleSqlMTransE {

  private val Cfg = MTransE.Config()
  // drift guards: (a) the shared replay core bakes TransE.Config()'s
  // literals (chain widths, init seed stream); (b) the alignment-pass
  // replay below pivots EXACTLY two negative partners (n0/n1 columns)
  // — both fail at oracle construction, not at diff time.
  require(Cfg.dim == graft.sim.TransE.Config().dim &&
    Cfg.lr == graft.sim.TransE.Config().lr &&
    Cfg.margin == graft.sim.TransE.Config().margin &&
    Cfg.seed == graft.sim.TransE.Config().seed,
    s"MTransE.Config diverged from the shared replay core constants: $Cfg")
  require(Cfg.negRate == 2,
    s"the alignment-pass replay unrolls exactly 2 negative partners " +
      s"(n0/n1 pivot) — negRate=${Cfg.negRate} needs the pivot widened")
  // the SQL replay below covers ONLY the no-relation-corruption path
  require(Cfg.negRelRate == 0,
    s"the MTransE replay assumes negRelRate == 0 (no relation " +
      s"corruption CTEs are emitted): $Cfg")
  private val D = Cfg.dim
  private val NRel = GraphBuild.Relations.size
  private def dims = 0 until D
  private def chain(f: Int => String) = OracleSqlTransE.chain(f)
  private def csv(f: Int => String) = OracleSqlTransE.csv(f)
  private def microQ(x: String) = OracleSqlTransE.microQ(x)

  private def offRelA = "nn.na + nn.nb"
  private def offM = s"nn.na + nn.nb + ${2 * NRel}"
  private def offEvo = s"nn.na + nn.nb + ${2 * NRel + D}"

  /** Side-restricted rawt/ents pair with a name suffix (the ERER
    * per-side dictionaries, GraphBuild.ererEntities). */
  private def sideDict(sfx: String, side: String): String =
    s", rawt$sfx AS MATERIALIZED (\n" +
      GraphBuild.Relations.zipWithIndex.map { case (rel, rid) =>
        s"      SELECT 'r' || CAST(id AS VARCHAR) AS rec, " +
          s"'$rel:' || ${OracleSql.relValSql(rel)} AS value, " +
          s"CAST($rid AS BIGINT) AS rel_id FROM keyed WHERE side = '$side'"
      }.mkString("\n      UNION ALL\n") + s"""
), ents$sfx AS MATERIALIZED (
  SELECT label, CAST(row_number() OVER (ORDER BY label) - 1 AS BIGINT) AS ent_id
  FROM (SELECT rec AS label FROM rawt$sfx UNION SELECT value FROM rawt$sfx)
)
, mt_t$sfx AS MATERIALIZED (
  SELECT eh.ent_id AS h, et.ent_id AS t, rawt$sfx.rel_id AS r
  FROM rawt$sfx
  JOIN ents$sfx eh ON eh.label = rawt$sfx.rec
  JOIN ents$sfx et ON et.label = rawt$sfx.value
)"""

  /** rel-id -> 'rel:' prefix expression for the evolution-pair label
    * joins. */
  private val prefixCase = "CASE r " + GraphBuild.Relations.zipWithIndex
    .map { case (rel, rid) => s"WHEN $rid THEN '$rel:'" }
    .mkString(" ") + " END"

  /** One matrix update (the reduceApply image); nn = mt_n (na, nb). */
  private def upd(sb: StringBuilder, gradCte: String, inCte: String,
                  outCte: String, idCol: String, pfx: String,
                  keyExpr: String, normalize: Boolean): Unit = {
    val from = s"$inCte m CROSS JOIN mt_n nn LEFT JOIN $gradCte g " +
      s"ON g.tgt = $keyExpr"
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
    SELECT m.$idCol, ${csv(d => s"CAST((m.$pfx$d::DOUBLE - ${Cfg.lr}::DOUBLE * " +
        s"(COALESCE(g.g$d, 0)::DOUBLE / 1000000.0)) AS REAL) AS u$d")}
    FROM $from
  )
)
, $outCte AS MATERIALIZED (
  SELECT $idCol, ${OracleSqlTransE.normStage2("u", pfx)}
  FROM ${outCte}u
)"""
    }
  }

  /** Per-side plain-TransE epoch (MTransE.kgPass): negs CTE `negsCte`
    * filtered to ep=e against (entCte, relCte); gradient keys offset by
    * entOff/relOff. */
  private def kgEpoch(sb: StringBuilder, e: Int, sfx: String,
                      negsCte: String, entCte: String, relCte: String,
                      entOff: String, relOff: String): Unit = {
    val pre = s"mk$sfx$e"
    sb ++= s"""
, ${pre}a AS MATERIALIZED (
  SELECT h, t, tn, r,
    ${csv(d => s"CASE WHEN p$d > 0 THEN 1 WHEN p$d < 0 THEN -1 ELSE 0 END AS sp$d")},
    ${csv(d => s"CASE WHEN q$d > 0 THEN 1 WHEN q$d < 0 THEN -1 ELSE 0 END AS sn$d")}
  FROM (
    SELECT n.h, n.t, n.tn, n.r,
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - et.e$d::DOUBLE) AS p$d")},
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - en.e$d::DOUBLE) AS q$d")}
    FROM $negsCte n
    JOIN $entCte eh ON eh.ent_id = n.h
    JOIN $entCte et ON et.ent_id = n.t
    JOIN $entCte en ON en.ent_id = n.tn
    JOIN $relCte rr ON rr.rid = n.r
    WHERE n.ep = $e
  )
  WHERE (${chain(d => s"abs(p$d)")}) - (${chain(d => s"abs(q$d)")}) + ${Cfg.margin} > 0
)
, ${pre}g AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT $entOff + h AS tgt, ${csv(d => s"(sp$d - sn$d) * 1000000 AS g$d")}
      FROM ${pre}a CROSS JOIN mt_n nn
    UNION ALL SELECT $entOff + t, ${csv(d => s"-sp$d * 1000000")}
      FROM ${pre}a CROSS JOIN mt_n nn
    UNION ALL SELECT $entOff + tn, ${csv(d => s"sn$d * 1000000")}
      FROM ${pre}a CROSS JOIN mt_n nn
    UNION ALL SELECT $relOff + r, ${csv(d => s"(sp$d - sn$d) * 1000000")}
      FROM ${pre}a CROSS JOIN mt_n nn
  ) GROUP BY tgt
)"""
  }

  /** One-row pivot of the m matrix (m_<row>_<col> columns). */
  private def mPivot(sb: StringBuilder, e: Int): Unit = {
    val cols = (0 until D).flatMap(k => dims.map(d =>
      s"max(CASE WHEN rid = $k THEN m$d END) AS m_${k}_$d")).mkString(",\n    ")
    sb ++= s"""
, mtm1r$e AS MATERIALIZED (
  SELECT $cols FROM mtm$e
)"""
  }

  /** ma_i = CAST(sum_j m_i_j * va_j AS REAL) — MTransE.matVec. */
  private def maExpr(d: Int, vaPfx: String): String =
    s"CAST((${chain(j => s"mp.m_${d}_$j::DOUBLE * $vaPfx$j")}) AS REAL)"

  /** The alignment (+ evolution) pass for epoch e: pivoted negative
    * partners, MATERIALIZED ma/sign levels (tiny row count), gradient
    * branches incl. M^T eff and the 16 per-row matrix branches. */
  private def alignEpoch(sb: StringBuilder, e: Int, evolve: Boolean): Unit = {
    val vq = (d: Int) => if (evolve) s"vq$d" else "0.0"
    sb ++= s"""
, alp$e AS (
  SELECT a, b, r,
    min(CASE WHEN j = 0 THEN bn END) AS n0,
    min(CASE WHEN j = 1 THEN bn END) AS n1
  FROM mt_alnegs WHERE ep = $e GROUP BY a, b, r
)
, mal$e AS MATERIALIZED (
  SELECT p.a, p.b, p.r, p.n0, p.n1,
    ${csv(d => s"${maExpr(d, "va.e")} AS ma$d")},
    ${csv(d => s"va.e$d::DOUBLE AS va$d")},
    ${csv(d => s"vb.e$d::DOUBLE AS vb$d")},
    ${csv(d => s"vn0.e$d::DOUBLE AS vn0_$d")},
    ${csv(d => s"vn1.e$d::DOUBLE AS vn1_$d")}${if (evolve) "," else ""}
    ${if (evolve) csv(d => s"COALESCE(rv.v$d::DOUBLE, 0.0) AS vq$d") else ""}
  FROM alp$e p
  JOIN mte_am$e va ON va.ent_id = p.a
  JOIN mte_bm$e vb ON vb.ent_id = p.b
  LEFT JOIN mte_bm$e vn0 ON vn0.ent_id = p.n0
  LEFT JOIN mte_bm$e vn1 ON vn1.ent_id = p.n1
  ${if (evolve) s"LEFT JOIN mtv$e rv ON rv.rid = p.r" else ""}
  CROSS JOIN mtm1r$e mp
)
, mas$e AS MATERIALIZED (
  SELECT a, b, r, n0, n1, inv,
    ${dims.map(d => s"sg$d").mkString(", ")},
    ${dims.map(d => s"s0_$d").mkString(", ")},
    ${dims.map(d => s"s1_$d").mkString(", ")},
    ${dims.map(d => s"va$d").mkString(", ")}
  FROM (
    SELECT *,
      1.0 / nneg AS inv,
      (${chain(d => s"abs(ma$d::DOUBLE + ${vq(d)} - vb$d)")}) AS pos,
      (${chain(d => s"abs(ma$d::DOUBLE + ${vq(d)} - vn0_$d)")}) AS sc0,
      (${chain(d => s"abs(ma$d::DOUBLE + ${vq(d)} - vn1_$d)")}) AS sc1,
      ${csv(d => s"CASE WHEN ma$d::DOUBLE + ${vq(d)} - vb$d > 0 THEN 1 " +
        s"WHEN ma$d::DOUBLE + ${vq(d)} - vb$d < 0 THEN -1 ELSE 0 END AS sg$d")},
      ${csv(d => s"CASE WHEN ma$d::DOUBLE + ${vq(d)} - vn0_$d > 0 THEN 1 " +
        s"WHEN ma$d::DOUBLE + ${vq(d)} - vn0_$d < 0 THEN -1 ELSE 0 END AS s0_$d")},
      ${csv(d => s"CASE WHEN ma$d::DOUBLE + ${vq(d)} - vn1_$d > 0 THEN 1 " +
        s"WHEN ma$d::DOUBLE + ${vq(d)} - vn1_$d < 0 THEN -1 ELSE 0 END AS s1_$d")}
    FROM (SELECT *,
      (CASE WHEN n0 IS NULL THEN 0 ELSE 1 END +
       CASE WHEN n1 IS NULL THEN 0 ELSE 1 END) AS nneg FROM mal$e)
    WHERE nneg > 0
  )
  WHERE pos - ((COALESCE(sc0, 0.0) + COALESCE(sc1, 0.0)) / nneg) + ${Cfg.margin} > 0
)
, mef$e AS MATERIALIZED (
  SELECT a, b, r, n0, n1, inv,
    ${dims.map(d => s"sg$d").mkString(", ")},
    ${dims.map(d => s"s0_$d").mkString(", ")},
    ${dims.map(d => s"s1_$d").mkString(", ")},
    ${dims.map(d => s"va$d").mkString(", ")},
    ${csv(d => s"((sg$d::DOUBLE - (COALESCE(s0_$d, 0)::DOUBLE * inv))" +
      s" - (COALESCE(s1_$d, 0)::DOUBLE * inv)) AS ef$d")}
  FROM mas$e
)
, malg$e AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT a AS tgt,
      ${csv(d => microQ(chain(k => s"mp.m_${k}_$d::DOUBLE * ef$k")) + s" AS g$d")}
      FROM mef$e CROSS JOIN mtm1r$e mp
    UNION ALL SELECT nn.na + b, ${csv(d => s"-sg$d * 1000000")}
      FROM mef$e CROSS JOIN mt_n nn
    UNION ALL SELECT nn.na + n0, ${csv(d => microQ(s"s0_$d::DOUBLE * inv"))}
      FROM mef$e CROSS JOIN mt_n nn WHERE n0 IS NOT NULL
    UNION ALL SELECT nn.na + n1, ${csv(d => microQ(s"s1_$d::DOUBLE * inv"))}
      FROM mef$e CROSS JOIN mt_n nn WHERE n1 IS NOT NULL
${(0 until D).map(k =>
      s"    UNION ALL SELECT $offM + $k, " +
        csv(d => microQ(s"ef$k * va$d")) +
        s"\n      FROM mef$e CROSS JOIN mt_n nn").mkString("\n")}
${if (evolve)
      s"    UNION ALL SELECT $offEvo + r, ${csv(d => microQ(s"ef$d"))}" +
        s"\n      FROM mef$e CROSS JOIN mt_n nn WHERE r >= 0"
    else ""}
  ) GROUP BY tgt
)"""
  }

  private def evalSql(evolve: Boolean): String = {
    val sb = new StringBuilder
    sb ++= sideDict("a", "A")
    sb ++= sideDict("b", "B")
    sb ++= s"""
, mt_n AS (SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM entsa) AS na,
    (SELECT CAST(count(*) AS BIGINT) FROM entsb) AS nb)
, mt_pri AS (
  SELECT ra.ent_id AS a, rb.ent_id AS b, CAST(-1 AS BIGINT) AS r
  FROM (SELECT idA, idB FROM cand
        WHERE dni_a = dni_b AND dni_a % 10 < 3) p
  JOIN entsa ra ON ra.label = 'r' || CAST(p.idA AS VARCHAR)
  JOIN entsb rb ON rb.label = 'r' || CAST(p.idB AS VARCHAR)
)"""
    if (evolve) {
      val rels = GraphBuild.Relations
      val aCols = rels.map(r =>
        s"${OracleSql.relValSql(r)} AS a_$r").mkString(", ")
      val bCols = rels.map(r =>
        s"${OracleSql.relValSql(r)} AS b_$r").mkString(", ")
      val vt = rels.zipWithIndex.map { case (r, rid) =>
        s"      SELECT a_$r AS val_a, b_$r AS val_b, CAST($rid AS BIGINT) AS r FROM mt_jv"
      }.mkString("\n      UNION ALL\n")
      sb ++= s"""
, mt_tp AS (SELECT idA, idB FROM cand WHERE dni_a = dni_b AND dni_a % 10 < 3)
, mt_ka AS (SELECT id AS idA, $aCols FROM keyed)
, mt_kb AS (SELECT id AS idB, $bCols FROM keyed)
, mt_jv AS (SELECT * FROM mt_tp JOIN mt_ka USING (idA) JOIN mt_kb USING (idB))
, mt_vp AS (
  SELECT val_a, val_b, r FROM (
$vt
  ) GROUP BY val_a, val_b, r
)
, mt_evo AS (
  SELECT la.ent_id AS a, lb.ent_id AS b, v.r
  FROM mt_vp v
  JOIN entsa la ON la.label = ($prefixCase) || v.val_a
  JOIN entsb lb ON lb.label = ($prefixCase) || v.val_b
)
, mt_al AS (SELECT * FROM mt_pri UNION ALL SELECT * FROM mt_evo)"""
    } else {
      sb ++= "\n, mt_al AS (SELECT * FROM mt_pri)"
    }
    // init: matrix slots mirror MTransE.train (0=entA 1=entB 2=relA
    // 3=relB 4=m 5=evolveVec); only entA/entB rows are normalized
    sb ++= s"""
, mt_iasrc AS (SELECT e.ent_id AS row, rj.j FROM entsa e CROSS JOIN range(0, $D) rj(j))
, mt_ibsrc AS (SELECT e.ent_id AS row, rj.j FROM entsb e CROSS JOIN range(0, $D) rj(j))
, mt_rsrc AS (SELECT rr.rid, rj.j FROM range(0, $NRel) rr(rid) CROSS JOIN range(0, $D) rj(j))
, mt_msrc AS (SELECT rr.rid, rj.j FROM range(0, $D) rr(rid) CROSS JOIN range(0, $D) rj(j))"""
    OracleSqlTransE.initMatrix(sb, "mia", "mt_iasrc", "row", 0, 5,
      "mte_a0", "ent_id", "e", normalize = true)
    OracleSqlTransE.initMatrix(sb, "mib", "mt_ibsrc", "row", 1, 5,
      "mte_b0", "ent_id", "e", normalize = true)
    OracleSqlTransE.initMatrix(sb, "mra", "mt_rsrc", "rid", 2, 2,
      "mtr_a0", "rid", "r", normalize = false)
    OracleSqlTransE.initMatrix(sb, "mrb", "mt_rsrc", "rid", 3, 2,
      "mtr_b0", "rid", "r", normalize = false)
    OracleSqlTransE.initMatrix(sb, "mim", "mt_msrc", "rid", 4, 2,
      "mtm0", "rid", "m", normalize = false)
    if (evolve)
      OracleSqlTransE.initMatrix(sb, "miv", "mt_rsrc", "rid", 5, 2,
        "mtv0", "rid", "v", normalize = false)
    // negative draws: per-side tail corruption + alignment partners
    val yKg = OracleSqlTransE.bytesFor(Cfg.epochs.toLong * Cfg.negRate - 1)
    // x prefixes folded once per triple / alignment pair (constant
    // across the (ep, j) grid) — byte-identical splits of the chains
    sb ++= OracleSql.fnvMixChainW("mnap", "mt_ta",
      "(h * 31 + t + 0)::HUGEINT", "", 6, -1)
    sb ++= s"""
, mt_ansrc AS (
  SELECT t.h, t.t, t.r, t.mnap_h AS pfh, e.ep, j.j FROM mnap4 t
  CROSS JOIN range(0, ${Cfg.epochs}) e(ep) CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("mna", "mt_ansrc",
      s"(ep * ${Cfg.negRate} + j)::HUGEINT", "", yKg, -1,
      init = Some("pfh"))
    sb ++= s"""
, mt_anegs AS MATERIALIZED (
  SELECT h, t, r, ep, tn FROM (
    SELECT h, t, r, ep,
      CAST((((${OracleSql.signed64("mna_h")}) % nn.na) + nn.na) % nn.na AS BIGINT) AS tn
    FROM mna4 CROSS JOIN mt_n nn
  ) WHERE tn <> t
)
"""
    sb ++= OracleSql.fnvMixChainW("mnbp", "mt_tb",
      "(h * 31 + t + 131)::HUGEINT", "", 6, -1)
    sb ++= s"""
, mt_bnsrc AS (
  SELECT t.h, t.t, t.r, t.mnbp_h AS pfh, e.ep, j.j FROM mnbp4 t
  CROSS JOIN range(0, ${Cfg.epochs}) e(ep) CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("mnb", "mt_bnsrc",
      s"(ep * ${Cfg.negRate} + j)::HUGEINT", "", yKg, -1,
      init = Some("pfh"))
    sb ++= s"""
, mt_bnegs AS MATERIALIZED (
  SELECT h, t, r, ep, tn FROM (
    SELECT h, t, r, ep,
      CAST((((${OracleSql.signed64("mnb_h")}) % nn.nb) + nn.nb) % nn.nb AS BIGINT) AS tn
    FROM mnb4 CROSS JOIN mt_n nn
  ) WHERE tn <> t
)
"""
    sb ++= OracleSql.fnvMixChainW("mnlp", "mt_al",
      "(a * 53 + b)::HUGEINT", "", 6, -1)
    sb ++= s"""
, mt_alsrc AS (
  SELECT t.a, t.b, t.r, t.mnlp_h AS pfh, e.ep, j.j FROM mnlp4 t
  CROSS JOIN range(0, ${Cfg.epochs}) e(ep) CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("mnl", "mt_alsrc",
      s"((ep + 104729) * ${Cfg.negRate} + j)::HUGEINT", "",
      OracleSqlTransE.bytesFor(
        (Cfg.epochs.toLong - 1 + 104729) * Cfg.negRate + Cfg.negRate - 1),
      -1, init = Some("pfh"))
    sb ++= s"""
, mt_alnegs AS MATERIALIZED (
  SELECT a, b, r, ep, j, bn FROM (
    SELECT a, b, r, ep, j,
      CAST((((${OracleSql.signed64("mnl_h")}) % nn.nb) + nn.nb) % nn.nb AS BIGINT) AS bn
    FROM mnl4 CROSS JOIN mt_n nn
  ) WHERE bn <> b
)"""
    for (e <- 0 until Cfg.epochs) {
      kgEpoch(sb, e, "a", "mt_anegs", s"mte_a$e", s"mtr_a$e",
        "0", offRelA)
      kgEpoch(sb, e, "b", "mt_bnegs", s"mte_b$e", s"mtr_b$e",
        "nn.na", s"$offRelA + $NRel")
      // Scala order: apply A grads, apply B grads, THEN normalize both
      // entity matrices (one normalize per side per kg phase), update
      // rel matrices un-normalized
      upd(sb, s"mka${e}g", s"mte_a$e", s"mte_am$e", "ent_id", "e",
        "m.ent_id", normalize = true)
      upd(sb, s"mka${e}g", s"mtr_a$e", s"mtr_a${e + 1}", "rid", "r",
        s"$offRelA + m.rid", normalize = false)
      upd(sb, s"mkb${e}g", s"mte_b$e", s"mte_bm$e", "ent_id", "e",
        "nn.na + m.ent_id", normalize = true)
      upd(sb, s"mkb${e}g", s"mtr_b$e", s"mtr_b${e + 1}", "rid", "r",
        s"$offRelA + $NRel + m.rid", normalize = false)
      mPivot(sb, e)
      alignEpoch(sb, e, evolve)
      upd(sb, s"malg$e", s"mte_am$e", s"mte_a${e + 1}", "ent_id", "e",
        "m.ent_id", normalize = true)
      upd(sb, s"malg$e", s"mte_bm$e", s"mte_b${e + 1}", "ent_id", "e",
        "nn.na + m.ent_id", normalize = true)
      upd(sb, s"malg$e", s"mtm$e", s"mtm${e + 1}", "rid", "m",
        s"$offM + m.rid", normalize = false)
      if (evolve)
        upd(sb, s"malg$e", s"mtv$e", s"mtv${e + 1}", "rid", "v",
          s"$offEvo + m.rid", normalize = false)
    }
    mPivot(sb, Cfg.epochs)
    val finA = s"mte_a${Cfg.epochs}"
    val finB = s"mte_b${Cfg.epochs}"
    sb ++= s"""
, te_reca AS (
  SELECT CAST(substr(label, 2) AS BIGINT) AS rid, ent_id
  FROM entsa WHERE regexp_matches(label, '^r[0-9]+$$')
)
, te_recb AS (
  SELECT CAST(substr(label, 2) AS BIGINT) AS rid, ent_id
  FROM entsb WHERE regexp_matches(label, '^r[0-9]+$$')
)
, te_tj AS (
  SELECT c.idA, c.idB,
    CAST(CASE WHEN c.dni_a = c.dni_b THEN 1 ELSE 0 END AS BIGINT) AS label,
    c.split_a, c.split_b,
    ${csv(d => s"${maExpr(d, "ea.e")} AS a$d")},
    ${csv(d => s"eb.e$d AS b$d")}
  FROM cand c
  JOIN te_reca ra ON ra.rid = c.idA
  JOIN $finA ea ON ea.ent_id = ra.ent_id
  JOIN te_recb rb ON rb.rid = c.idB
  JOIN $finB eb ON eb.ent_id = rb.ent_id
  CROSS JOIN mtm1r${Cfg.epochs} mp
)"""
    sb ++= OracleSqlTransE.scoringTail(D.toLong, Cfg.epochs.toLong,
      s"CAST(${if (evolve) 1 else 0} AS BIGINT) AS evolve,\n  ")
    OracleSql.q(sb.toString)
  }

  val mtranseEval: String = evalSql(evolve = false)
  val etranseEval: String = evalSql(evolve = true)
}
