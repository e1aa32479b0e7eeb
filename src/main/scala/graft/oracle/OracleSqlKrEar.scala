package graft.oracle

import graft.sim.KrEar
import graft.graph.GraphBuild

/**
 * DuckDB replay of the KR-EAR training run + linkage eval
 * ([[graft.sim.KrEar.eval]]): the alternating relational/attributional
 * encoders unrolled per epoch, on top of the TransE replay discipline
 * (OracleSqlTransE) plus KrEar's own rule — tanh outputs are
 * micro-quantized in BOTH engines before any use (KrEar.tanhQ), so the
 * one transcendental the trainer needs cannot leak a 1-ulp libm
 * divergence into the float lattice.
 *
 * Epoch sequence mirrors KrEar.train exactly: relational grads from
 * the epoch-start state -> entity update + L2 normalize (kr_em<e>) ->
 * attributional grads from THAT mid-epoch entity state -> entity /
 * value / proj updates + normalize, attr / rel updates un-normalized
 * (negRelRate=0 in the registered config).
 */
object OracleSqlKrEar {

  private val Cfg = KrEar.Config()
  // drift guard: the shared replay core (OracleSqlTransE.default —
  // chain widths, initExpr bound, init seed stream) bakes
  // TransE.Config()'s literals; KrEar carries its OWN Config, so a
  // divergence would silently break bit-exactness. Fails at oracle
  // construction (Verify startup), not at diff time.
  require(Cfg.dim == graft.sim.TransE.Config().dim &&
    Cfg.lr == graft.sim.TransE.Config().lr &&
    Cfg.margin == graft.sim.TransE.Config().margin &&
    Cfg.negRate == graft.sim.TransE.Config().negRate &&
    Cfg.seed == graft.sim.TransE.Config().seed,
    s"KrEar.Config diverged from the shared replay core constants: $Cfg")
  // the SQL replay below covers ONLY the no-relation-corruption path
  require(Cfg.negRelRate == 0,
    s"the KrEar replay assumes negRelRate == 0 (no relation " +
      s"corruption CTEs are emitted): $Cfg")
  private val D = Cfg.dim
  private val NRel = GraphBuild.RelationalRels.size // 2
  private val NAttr = GraphBuild.AttributionalRels.size // 5
  private def dims = 0 until D
  private def chain(f: Int => String) = OracleSqlTransE.chain(f)
  private def csv(f: Int => String) = OracleSqlTransE.csv(f)
  private def microQ(x: String) = OracleSqlTransE.microQ(x)

  /** ER rel_id -> kr relational / attributional dense index (the
    * prepare() relIdx/attrIdx maps, derived from the same Relations
    * order). */
  private def caseMap(rels: Seq[String]): String =
    rels.zipWithIndex.map { case (r, i) =>
      s"WHEN ${GraphBuild.Relations.indexOf(r)} THEN $i"
    }.mkString(" ")
  private val relIds = GraphBuild.RelationalRels
    .map(GraphBuild.Relations.indexOf).mkString(", ")

  /** Per-epoch relational pass: plain-TransE hinge over the kr entity
    * space (model kr_e<e>, kr_r<e>), gradient keys h/t/tn entity-space
    * and ne+nv+r for relations. */
  private def relEpoch(sb: StringBuilder, e: Int): Unit = {
    sb ++= s"""
, kr_rac$e AS MATERIALIZED (
  SELECT h, t, tn, r,
    ${csv(d => s"CASE WHEN p$d > 0 THEN 1 WHEN p$d < 0 THEN -1 ELSE 0 END AS sp$d")},
    ${csv(d => s"CASE WHEN q$d > 0 THEN 1 WHEN q$d < 0 THEN -1 ELSE 0 END AS sn$d")}
  FROM (
    SELECT n.h, n.t, n.tn, n.r,
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - et.e$d::DOUBLE) AS p$d")},
      ${csv(d => s"(eh.e$d::DOUBLE + rr.r$d::DOUBLE - en.e$d::DOUBLE) AS q$d")}
    FROM kr_rnegs n
    JOIN kr_e$e eh ON eh.ent_id = n.h
    JOIN kr_e$e et ON et.ent_id = n.t
    JOIN kr_e$e en ON en.ent_id = n.tn
    JOIN kr_r$e rr ON rr.rid = n.r
    WHERE n.ep = $e
  )
  WHERE (${chain(d => s"abs(p$d)")}) - (${chain(d => s"abs(q$d)")}) + ${Cfg.margin} > 0
)
, kr_rg$e AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT h AS tgt, ${csv(d => s"(sp$d - sn$d) * 1000000 AS g$d")} FROM kr_rac$e
    UNION ALL SELECT t, ${csv(d => s"-sp$d * 1000000")} FROM kr_rac$e
    UNION ALL SELECT tn, ${csv(d => s"sn$d * 1000000")} FROM kr_rac$e
    UNION ALL SELECT nn.ne + nn.nv + r, ${csv(d => s"(sp$d - sn$d) * 1000000")}
      FROM kr_rac$e CROSS JOIN kr_n nn
  ) GROUP BY tgt
)"""
  }

  /** Per-epoch attributional pass from the mid-epoch entity state:
    * z = tanhQ(h_proj + a) per dim (MATERIALIZED level — z, signs and
    * the hinge filter snap to columns so downstream trees stay flat),
    * then the projected subgradients. */
  private def attrEpoch(sb: StringBuilder, e: Int): Unit = {
    sb ++= s"""
, kr_az$e AS MATERIALIZED (
  SELECT h, v, a, vn, hn,
    ${dims.map(d => s"z$d").mkString(", ")},
    ${csv(d => s"CASE WHEN z$d - ev$d > 0 THEN 1 WHEN z$d - ev$d < 0 THEN -1 ELSE 0 END AS sp$d")},
    ${csv(d => s"CASE WHEN z$d - en$d > 0 THEN 1 WHEN z$d - en$d < 0 THEN -1 ELSE 0 END AS sn$d")}
  FROM (
    SELECT h, v, a, vn, hn,
      ${csv(d => s"floor((1.0 - 2.0 / (exp(((eh$d - hn * np$d) + ea$d) * 2.0) + 1.0))" +
        s" * 1000000.0 + 0.5) / 1000000.0 AS z$d")},
      ${dims.map(d => s"ev$d").mkString(", ")},
      ${dims.map(d => s"en$d").mkString(", ")}
    FROM (
      SELECT h, v, a, vn,
        (${chain(d => s"eh$d * np$d")}) AS hn,
        ${dims.map(d => s"eh$d").mkString(", ")},
        ${dims.map(d => s"np$d").mkString(", ")},
        ${dims.map(d => s"ea$d").mkString(", ")},
        ${dims.map(d => s"ev$d").mkString(", ")},
        ${dims.map(d => s"en$d").mkString(", ")}
      FROM (
        SELECT n.h, n.v, n.a, n.vn,
          ${csv(d => s"eh.e$d::DOUBLE AS eh$d")},
          ${csv(d => s"pp.p$d::DOUBLE AS np$d")},
          ${csv(d => s"aa.a$d::DOUBLE AS ea$d")},
          ${csv(d => s"ev.v$d::DOUBLE AS ev$d")},
          ${csv(d => s"en.v$d::DOUBLE AS en$d")}
        FROM kr_anegs n
        JOIN kr_em$e eh ON eh.ent_id = n.h
        JOIN kr_v$e ev ON ev.vid = n.v
        JOIN kr_v$e en ON en.vid = n.vn
        JOIN kr_a$e aa ON aa.rid = n.a
        JOIN kr_p$e pp ON pp.rid = n.a
        WHERE n.ep = $e
      )
    )
  )
  WHERE (${chain(d => s"abs(z$d - ev$d)")}) - (${chain(d => s"abs(z$d - en$d)")}) + ${Cfg.margin} > 0
)"""
  }

  /** The gradient aggregation over the gHp level (kr_agr<e>). */
  private def attrGrads(sb: StringBuilder, e: Int): Unit = {
    sb ++= s"""
, kr_ag$e AS MATERIALIZED (
  SELECT tgt, ${dims.map(d => s"SUM(g$d) AS g$d").mkString(", ")}
  FROM (
    SELECT h AS tgt,
      ${csv(d => microQ(s"gHp$d - gnd * np$d") + s" AS g$d")} FROM kr_agr$e
    UNION ALL SELECT nn.ne + v, ${csv(d => s"-sp$d * 1000000")}
      FROM kr_agr$e CROSS JOIN kr_n nn
    UNION ALL SELECT nn.ne + vn, ${csv(d => s"sn$d * 1000000")}
      FROM kr_agr$e CROSS JOIN kr_n nn
    UNION ALL SELECT nn.ne + nn.nv + $NRel + a, ${csv(d => microQ(s"gHp$d"))}
      FROM kr_agr$e CROSS JOIN kr_n nn
    UNION ALL SELECT nn.ne + nn.nv + ${NRel + NAttr} + a,
      ${csv(d => microQ(s"-((gnd * eh$d) + (hn * gHp$d))"))}
      FROM kr_agr$e CROSS JOIN kr_n nn
  ) GROUP BY tgt
)"""
  }

  /** gHp/gnd level between kr_az and kr_ag — re-joins the entity/proj
    * rows (cheap key joins) so z/sp/sn stay flat column references. */
  private def attrGradLevel(sb: StringBuilder, e: Int): Unit = {
    sb ++= s"""
, kr_agr$e AS MATERIALIZED (
  SELECT h, v, a, vn, hn, ${dims.map(d => s"sp$d").mkString(", ")},
    ${dims.map(d => s"sn$d").mkString(", ")},
    ${dims.map(d => s"gHp$d").mkString(", ")},
    (${chain(d => s"gHp$d * np$d")}) AS gnd,
    ${dims.map(d => s"np$d").mkString(", ")},
    ${dims.map(d => s"eh$d").mkString(", ")}
  FROM (
    SELECT z.h, z.v, z.a, z.vn, z.hn,
      ${dims.map(d => s"z.sp$d").mkString(", ")},
      ${dims.map(d => s"z.sn$d").mkString(", ")},
      ${csv(d => s"((1.0 - z.z$d * z.z$d) * z.sp$d) - ((1.0 - z.z$d * z.z$d) * z.sn$d) AS gHp$d")},
      ${csv(d => s"pp.p$d::DOUBLE AS np$d")},
      ${csv(d => s"eh.e$d::DOUBLE AS eh$d")}
    FROM kr_az$e z
    JOIN kr_p$e pp ON pp.rid = z.a
    JOIN kr_em$e eh ON eh.ent_id = z.h
  )
)"""
  }

  /** One matrix update from a gradient CTE (the reduceApply image). */
  private def upd(sb: StringBuilder, gradCte: String, inCte: String,
                  outCte: String, idCol: String, pfx: String,
                  keyExpr: String, normalize: Boolean): Unit = {
    val from = s"$inCte m CROSS JOIN kr_n nn LEFT JOIN $gradCte g " +
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

  val krearEval: String = {
    val sb = new StringBuilder
    sb ++= OracleSql.rawtCte
    sb ++= s"""
, kr_ear AS MATERIALIZED (
  SELECT eh.ent_id AS h, et.ent_id AS t, rawt.rel_id AS r
  FROM rawt
  JOIN ents eh ON eh.label = rawt.rec
  JOIN ents et ON et.label = rawt.value
)
, kr_ente AS MATERIALIZED (
  SELECT eid, CAST(row_number() OVER (ORDER BY eid) - 1 AS BIGINT) AS kid
  FROM (SELECT DISTINCT eid FROM (
    SELECT h AS eid FROM kr_ear
    UNION ALL SELECT t FROM kr_ear WHERE r IN ($relIds)))
)
, kr_vale AS MATERIALIZED (
  SELECT eid, CAST(row_number() OVER (ORDER BY eid) - 1 AS BIGINT) AS kid
  FROM (SELECT DISTINCT t AS eid FROM kr_ear WHERE r NOT IN ($relIds))
)
, kr_relt AS MATERIALIZED (
  SELECT he.kid AS h, te.kid AS t,
    CAST(CASE ear.r ${caseMap(GraphBuild.RelationalRels)} END AS BIGINT) AS r
  FROM kr_ear ear
  JOIN kr_ente he ON he.eid = ear.h
  JOIN kr_ente te ON te.eid = ear.t
  WHERE ear.r IN ($relIds)
)
, kr_attrt AS MATERIALIZED (
  SELECT he.kid AS h, ve.kid AS v,
    CAST(CASE ear.r ${caseMap(GraphBuild.AttributionalRels)} END AS BIGINT) AS a
  FROM kr_ear ear
  JOIN kr_ente he ON he.eid = ear.h
  JOIN kr_vale ve ON ve.eid = ear.t
  WHERE ear.r NOT IN ($relIds)
)
, kr_n AS (SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM kr_ente) AS ne,
    (SELECT CAST(count(*) AS BIGINT) FROM kr_vale) AS nv)
, kr_isrc AS (SELECT k.kid AS row, rj.j FROM kr_ente k CROSS JOIN range(0, $D) rj(j))
, kr_vsrc AS (SELECT k.kid AS row, rj.j FROM kr_vale k CROSS JOIN range(0, $D) rj(j))
, kr_rsrc AS (SELECT rr.rid, rj.j FROM range(0, $NRel) rr(rid) CROSS JOIN range(0, $D) rj(j))
, kr_asrc AS (SELECT rr.rid, rj.j FROM range(0, $NAttr) rr(rid) CROSS JOIN range(0, $D) rj(j))"""
    // matrix slots mirror KrEar.train's init calls: 0=ent 1=value
    // 2=rel 3=attr 4=proj; rel/attr rows un-normalized (negRelRate=0)
    OracleSqlTransE.initMatrix(sb, "kie", "kr_isrc", "row", 0, 5,
      "kr_e0", "ent_id", "e", normalize = true)
    OracleSqlTransE.initMatrix(sb, "kiv", "kr_vsrc", "row", 1, 5,
      "kr_v0", "vid", "v", normalize = true)
    OracleSqlTransE.initMatrix(sb, "kir", "kr_rsrc", "rid", 2, 2,
      "kr_r0", "rid", "r", normalize = false)
    OracleSqlTransE.initMatrix(sb, "kia", "kr_asrc", "rid", 3, 2,
      "kr_a0", "rid", "a", normalize = false)
    OracleSqlTransE.initMatrix(sb, "kip", "kr_asrc", "rid", 4, 2,
      "kr_p0", "rid", "p", normalize = true)
    // negative draws, both encoders, all epochs at once — the Scala
    // kernels' mix(h*31+t, ep*negRate+j) / mix(h*37+v, (ep+7919)*negRate+j)
    // x prefixes folded once per triple (constant across the (ep, j)
    // grid) — byte-identical splits of the two draw chains
    sb ++= OracleSql.fnvMixChainW("krp", "kr_relt",
      "(h * 31 + t)::HUGEINT", "", 6, -1)
    sb ++= s"""
, kr_rns AS (
  SELECT t.h, t.t, t.r, t.krp_h AS pfh, e.ep, j.j
  FROM krp4 t CROSS JOIN range(0, ${Cfg.epochs}) e(ep)
  CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("krn", "kr_rns",
      s"(ep * ${Cfg.negRate} + j)::HUGEINT", "",
      OracleSqlTransE.bytesFor(Cfg.epochs.toLong * Cfg.negRate - 1), -1,
      init = Some("pfh"))
    sb ++= s"""
, kr_rnegs AS MATERIALIZED (
  SELECT h, t, r, ep, tn FROM (
    SELECT h, t, r, ep,
      CAST((((${OracleSql.signed64("krn_h")}) % nn.ne) + nn.ne) % nn.ne AS BIGINT) AS tn
    FROM krn4 CROSS JOIN kr_n nn
  ) WHERE tn <> t
)
"""
    sb ++= OracleSql.fnvMixChainW("kap", "kr_attrt",
      "(h * 37 + v)::HUGEINT", "", 6, -1)
    sb ++= s"""
, kr_ans AS (
  SELECT t.h, t.v, t.a, t.kap_h AS pfh, e.ep, j.j
  FROM kap4 t CROSS JOIN range(0, ${Cfg.epochs}) e(ep)
  CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("kan", "kr_ans",
      s"((ep + 7919) * ${Cfg.negRate} + j)::HUGEINT", "",
      OracleSqlTransE.bytesFor(
        (Cfg.epochs.toLong - 1 + 7919) * Cfg.negRate + Cfg.negRate - 1),
      -1, init = Some("pfh"))
    sb ++= s"""
, kr_anegs AS MATERIALIZED (
  SELECT h, v, a, ep, vn FROM (
    SELECT h, v, a, ep,
      CAST((((${OracleSql.signed64("kan_h")}) % nn.nv) + nn.nv) % nn.nv AS BIGINT) AS vn
    FROM kan4 CROSS JOIN kr_n nn
  ) WHERE vn <> v
)"""
    for (e <- 0 until Cfg.epochs) {
      relEpoch(sb, e)
      upd(sb, s"kr_rg$e", s"kr_e$e", s"kr_em$e", "ent_id", "e",
        "m.ent_id", normalize = true)
      upd(sb, s"kr_rg$e", s"kr_r$e", s"kr_r${e + 1}", "rid", "r",
        "nn.ne + nn.nv + m.rid", normalize = false)
      attrEpoch(sb, e)
      attrGradLevel(sb, e)
      attrGrads(sb, e)
      upd(sb, s"kr_ag$e", s"kr_em$e", s"kr_e${e + 1}", "ent_id", "e",
        "m.ent_id", normalize = true)
      upd(sb, s"kr_ag$e", s"kr_v$e", s"kr_v${e + 1}", "vid", "v",
        "nn.ne + m.vid", normalize = true)
      upd(sb, s"kr_ag$e", s"kr_a$e", s"kr_a${e + 1}", "rid", "a",
        s"nn.ne + nn.nv + $NRel + m.rid", normalize = false)
      upd(sb, s"kr_ag$e", s"kr_p$e", s"kr_p${e + 1}", "rid", "p",
        s"nn.ne + nn.nv + ${NRel + NAttr} + m.rid", normalize = true)
    }
    val recent = """
, te_recent AS (
  SELECT r.rid, k.kid AS ent_id
  FROM (SELECT CAST(substr(label, 2) AS BIGINT) AS rid, ent_id
        FROM ents WHERE regexp_matches(label, '^r[0-9]+$')) r
  JOIN kr_ente k ON k.eid = r.ent_id
)"""
    sb ++= OracleSqlTransE.scoringSql(s"kr_e${Cfg.epochs}", recent,
      dimOut = D.toLong, epochsOut = Cfg.epochs.toLong)
    OracleSql.q(sb.toString)
  }
}
