package graft.oracle

import graft.graph.GraphBuild
import graft.sim.{RLTransE, TransE}

/**
 * DuckDB replay of the DISTRIBUTED batch RLTransE variant
 * ([[graft.sim.RLTransE.trainBatch]] / evalBatch): the train-split
 * value-evolution graph and its per-relation vocabulary re-derived in
 * SQL (the graph_veg_train_triples derivation + a per-relation
 * row_number dictionary), the offset-indexed triples trained through
 * the SAME replay core as transe_eval ([[OracleSqlTransE.Replay]]:
 * FNV init, integer micro-unit gradients, float-rounded updates) with
 * the ONE difference that negative tails are drawn from the triple's
 * relation's OWN value range (base + draw mod cnt — the offset-table
 * scheme, TransE.Config.tailRanges), then the per-field translated
 * cosine scoring, field-chain record distance, train-swept theta and
 * test metrics unrolled exactly as the Scala eval computes them.
 *
 * Field scoring runs in LONG FORM (one row per pair x scored field,
 * one dim-16 cosine chain) and pivots back to per-field columns so the
 * record distance is the LITERAL left-to-right field chain — never a
 * float SUM over an engine-chosen row order. The mean st-field
 * distance is the order-free integer form evalBatch exports (per-pair
 * micro-quantized, summed exactly, one final division).
 */
object OracleSqlRLTransEBatch {

  private val R = OracleSqlTransE.default
  private val Cfg = RLTransE.BatchCfg
  private val Rels = GraphBuild.Relations
  private val NRel = Rels.size
  private val Scored = RLTransE.ScoredRels
  private val E = Cfg.epochs
  private def dims = R.dims
  private def csv(f: Int => String) = R.csv(f)
  private def chain(f: Int => String) = R.chain(f)

  /** The batch training chain (graph, vocab, init, draws, epochs
    * 0..`upTo`) — leaves te_e<k>/te_r<k> for every k <= upTo. The draw
    * stream is emitted for ALL E epochs regardless (the negsrc grid is
    * part of the verified byte image; unread epochs cost one filtered
    * scan), so a shorter unroll is a true prefix of the full one. */
  private def trainOnlyCtes(upTo: Int): String = {
    // the default replay's literal constants (dim/lr/margin/seed) are
    // baked into the shared core — the batch config must agree
    require(Cfg.dim == R.D && Cfg.lr == TransE.Config().lr &&
      Cfg.margin == TransE.Config().margin &&
      Cfg.seed == TransE.Config().seed && Cfg.negRelRate == 0 &&
      !Cfg.transH,
      s"BatchCfg diverged from the shared replay core constants: $Cfg")
    val sb = new StringBuilder
    sb ++= OracleSql.vegCtes(
      "dni_a = dni_b AND split_a = 'train' AND split_b = 'train'")
    sb ++= s"""
, voc AS MATERIALIZED (
  SELECT r, value,
    CAST(row_number() OVER (PARTITION BY r ORDER BY value) - 1 AS BIGINT) AS vidx
  FROM (SELECT r, val_a AS value FROM vegt UNION SELECT r, val_b FROM vegt)
)
, vcnt AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS cnt FROM voc GROUP BY r)
, vmax AS (SELECT MAX(cnt) AS mv FROM vcnt)
, te_n AS (SELECT CAST($NRel * (SELECT mv FROM vmax) AS BIGINT) AS ne)
, te_ranges AS (SELECT r, r * (SELECT mv FROM vmax) AS base, cnt FROM vcnt)
, te_trip AS MATERIALIZED (
  SELECT h, t, r, (h * $NRel + r) * te_n.ne + t AS idx
  FROM (
    SELECT (g.r * mv.mv + va.vidx) AS h, (g.r * mv.mv + vb.vidx) AS t, g.r
    FROM vegt g
    JOIN voc va ON va.r = g.r AND va.value = g.val_a
    JOIN voc vb ON vb.r = g.r AND vb.value = g.val_b
    CROSS JOIN vmax mv
  ) CROSS JOIN te_n
)
, te_isrc AS (SELECT (v.r * mv.mv + v.vidx) AS row, rj.j
    FROM voc v CROSS JOIN vmax mv CROSS JOIN range(0, ${R.D}) rj(j))
, te_rsrc AS (SELECT rr.rid, rj.j FROM range(0, $NRel) rr(rid) CROSS JOIN range(0, ${R.D}) rj(j))"""
    // vocab rows only: slots past a relation's count are initialized
    // and re-normalized by the Scala trainer but never read (draws stay
    // inside the relation's range; scoring goes through the vocab), and
    // the FNV init is pure per (matId, row, dim) — dropping them is
    // value-preserving for every row that matters
    R.initMatrix(sb, "tei", "te_isrc", "row", 0, 5, "te_e0", "ent_id", "e",
      normalize = true)
    R.initMatrix(sb, "ter", "te_rsrc", "rid", 1, 2, "te_r0", "rid", "r",
      normalize = false)
    // idx prefix folded once per triple (constant across the (ep, j)
    // grid) — byte-identical split of the draw chain, ~negRate*epochs x
    // fewer 7-byte folds
    sb ++= OracleSql.fnvMixChainW("tetp", "te_trip", "idx::HUGEINT", "",
      7, -1)
    sb ++= s"""
, te_negsrc AS (
  SELECT t.h, t.t, t.r, t.tetp_h AS pfh, e.ep, j.j
  FROM tetp4 t
  CROSS JOIN range(0, $E) e(ep)
  CROSS JOIN range(0, ${Cfg.negRate}) j(j)
)"""
    sb ++= OracleSql.fnvMixChainW("ten", "te_negsrc",
      s"(ep * ${Cfg.negRate} + j)::HUGEINT", "",
      OracleSqlTransE.bytesFor((E.toLong * Cfg.negRate - 1) max 1), -1,
      init = Some("pfh"))
    sb ++= s"""
, te_negs AS MATERIALIZED (
  SELECT h, t, r, ep, tn FROM (
    SELECT n.h, n.t, n.r, n.ep, v.cnt,
      v.base + CAST((((${OracleSql.signed64("ten_h")}) % v.cnt) + v.cnt) % v.cnt AS BIGINT) AS tn
    FROM ten4 n JOIN te_ranges v ON v.r = n.r
  ) WHERE cnt > 1 AND tn <> t
)"""
    for (e <- 0 until upTo) {
      R.plainEpoch(sb, e)
      R.updateMatrix(sb, e, s"te_e$e", s"te_e${e + 1}", "ent_id", "e",
        "", normalize = true)
      // normalizeRel = true for the batch variant (the reference
      // normalizes every relation lookup)
      R.updateMatrix(sb, e, s"te_r$e", s"te_r${e + 1}", "rid", "r",
        "te_n.ne", normalize = true)
    }
    sb.toString
  }

  /** rltranse_batch_model — the batch family's ROOT ANCHOR: the full
    * training replay (FNV init, seeded per-relation draws, integer
    * micro-unit gradients, float-rounded updates) read out as the RAW
    * Float32 model matrices at the full- and half-epochs marks (the
    * grid_werl epochs axis — te_e${E/2} is an intermediate matrix of
    * the one chain). Every replay step is IEEE-correctly-rounded
    * (+, -, *, /, sqrt; no transcendentals), so the compare is
    * bit-exact on the raw floats — a STRONGER check than any
    * quantized projection, and the dump the per-field / per-dimension
    * feature oracles stage on (one training replay per gate run
    * instead of one per consumer). */
  val rltranseBatchModel: String = OracleSql.q(
    trainOnlyCtes(E) + s"""
SELECT 'ent' AS kind, CAST($E AS BIGINT) AS epochs, ent_id AS row_id,
  ${csv(d => s"e$d AS f$d")}
FROM te_e$E
UNION ALL SELECT 'rel', CAST($E AS BIGINT), rid, ${csv(d => s"r$d")}
FROM te_r$E
UNION ALL SELECT 'ent', CAST(${E / 2} AS BIGINT), ent_id, ${csv(d => s"e$d")}
FROM te_e${E / 2}
UNION ALL SELECT 'rel', CAST(${E / 2} AS BIGINT), rid, ${csv(d => s"r$d")}
FROM te_r${E / 2}""")

  /** STAGED replacement for the training chain: the per-relation
    * vocabulary re-derived first-principles (cheap — it is the index
    * space the staged matrices are addressed by) and the epoch-`ep`
    * matrices `te_e<ep>`/`te_r<ep>` read back from the verified
    * [[rltranseBatchModel]] anchor dump (raw Float32 — parquet
    * roundtrips them exactly, so downstream arithmetic sees the
    * identical REAL values the full replay would produce). */
  private def stagedModelCtes(sb: StringBuilder,
                              epochsList: Seq[Int]): Unit = {
    sb ++= OracleSql.vegCtes(
      "dni_a = dni_b AND split_a = 'train' AND split_b = 'train'")
    sb ++= s"""
, voc AS MATERIALIZED (
  SELECT r, value,
    CAST(row_number() OVER (PARTITION BY r ORDER BY value) - 1 AS BIGINT) AS vidx
  FROM (SELECT r, val_a AS value FROM vegt UNION SELECT r, val_b FROM vegt)
)
, vcnt AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS cnt FROM voc GROUP BY r)
, vmax AS (SELECT MAX(cnt) AS mv FROM vcnt)"""
    for (ep <- epochsList) {
      sb ++= s"""
, te_e$ep AS MATERIALIZED (
  SELECT row_id AS ent_id, ${csv(d => s"f$d AS e$d")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_model/*.parquet')
  WHERE kind = 'ent' AND epochs = $ep
)
, te_r$ep AS (
  SELECT row_id AS rid, ${csv(d => s"f$d AS r$d")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_model/*.parquet')
  WHERE kind = 'rel' AND epochs = $ep
)"""
    }
  }

  /** Candidate-pair long form (pair x scored field) — epoch-independent,
    * emitted once even when several epoch readouts score it
    * ([[gridWerl]]). Lazy for declaration-order safety of the val
    * initializers that embed it. */
  private lazy val pairCtes: String = {
    val aCols = Scored.map(r => s"${OracleSql.relValSql(r)} AS a_$r")
      .mkString(", ")
    val bCols = Scored.map(r => s"${OracleSql.relValSql(r)} AS b_$r")
      .mkString(", ")
    val unions = Scored.map { rel =>
      s"  SELECT idA, idB, label, split_a, split_b, CAST(${Rels.indexOf(rel)} AS BIGINT) AS rid, a_$rel AS va, b_$rel AS vb FROM fbase"
    }.mkString("\n  UNION ALL\n")
    s"""
, rka AS (SELECT id AS idA, $aCols FROM keyed)
, rkb AS (SELECT id AS idB, $bCols FROM keyed)
, fbase AS (
  SELECT c.idA, c.idB,
    CAST(CASE WHEN c.dni_a = c.dni_b THEN 1 ELSE 0 END AS BIGINT) AS label,
    c.split_a, c.split_b, ${Scored.map(r => s"a_$r").mkString(", ")},
    ${Scored.map(r => s"b_$r").mkString(", ")}
  FROM cand c JOIN rka ON rka.idA = c.idA JOIN rkb ON rkb.idB = c.idB
)
, fpair AS (
$unions
)"""
  }

  /** Per-field distances of the epoch-`ep` matrices: `fdist$sfx` /
    * `fwide$sfx` (the training chain's te_e`ep` is a PREFIX of the
    * full unroll, so a shorter-epochs combo reads an intermediate
    * matrix of the ONE shared chain — the Scala trainer at that epoch
    * count produces the identical matrix, the per-epoch draw keys
    * don't involve the total). */
  private def distCtes(ep: Int, sfx: String): String = s"""
, fdist$sfx AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b, rid,
    CASE WHEN va = vb THEN 0.0
         WHEN iav IS NULL OR ibv IS NULL THEN 1.0
         ELSE abs(1.0 - (CASE WHEN na = 0.0 OR nb = 0.0 THEN 0.0
                              ELSE dot / sqrt(na * nb) END))
    END AS fd
  FROM (
    SELECT *,
      (${chain(d => s"sh$d::DOUBLE * b$d::DOUBLE")}) AS dot,
      (${chain(d => s"sh$d::DOUBLE * sh$d::DOUBLE")}) AS na,
      (${chain(d => s"b$d::DOUBLE * b$d::DOUBLE")}) AS nb
    FROM (
      SELECT p.idA, p.idB, p.label, p.split_a, p.split_b, p.rid, p.va, p.vb,
        ia.vidx AS iav, ib.vidx AS ibv,
        ${csv(d => s"CAST(ea.e$d::DOUBLE + rr.r$d::DOUBLE AS REAL) AS sh$d")},
        ${csv(d => s"eb.e$d AS b$d")}
      FROM fpair p
      LEFT JOIN voc ia ON ia.r = p.rid AND ia.value = p.va
      LEFT JOIN voc ib ON ib.r = p.rid AND ib.value = p.vb
      CROSS JOIN vmax mv
      LEFT JOIN te_e$ep ea ON ea.ent_id = p.rid * mv.mv + ia.vidx
      LEFT JOIN te_e$ep eb ON eb.ent_id = p.rid * mv.mv + ib.vidx
      LEFT JOIN te_r$ep rr ON rr.rid = p.rid
    )
  )
)
, fwide$sfx AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b,
    ${Scored.map(rel =>
      s"MAX(CASE WHEN rid = ${Rels.indexOf(rel)} THEN fd END) AS f_$rel")
      .mkString(",\n    ")}
  FROM fdist$sfx GROUP BY idA, idB, label, split_a, split_b
)"""

  /** rltranse_batch_eval — STAGED on the verified
    * [[rltranseBatchFields]] anchor (which replays the full training
    * chain first-principles): the Scala side puts each field on the
    * mq6 grid before summing, so `micros / 1e6` here reconstructs the
    * identical doubles and this row re-derives only sum + sweep +
    * confusion + ranking. Both engines add the same doubles in the
    * same ScoredRels order. Saved ~40 s of duplicate DuckDB training
    * replay per gate run (VERIFY_BUDGET.json). */
  val rltranseBatchEval: String = OracleSql.q(s"""
, fwide AS MATERIALIZED (
  SELECT idA, idB, CAST(label AS BIGINT) AS label, split_a, split_b,
    ${Scored.map(rel =>
      s"f_${rel}_micros / 1000000.0 AS f_$rel").mkString(",\n    ")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_fields/*.parquet')
)
, rtsc AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b, f_st,
    (${Scored.map(r => s"f_$r").mkString(" + ")}) AS dist
  FROM fwide
)
, rb_swb AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM rtsc WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, rb_sw AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM rb_swb
  )
)
, rb_fmax AS (SELECT max(f1) AS fm FROM rb_sw)
, rb_blo AS (SELECT min(bucket) AS b FROM rb_sw, rb_fmax WHERE f1 = fm)
, rb_bhi AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM rb_blo)) AS b
    FROM rb_sw, rb_fmax, rb_blo WHERE bucket > rb_blo.b AND f1 < fm)
, rb_th AS (SELECT CAST(floor(((SELECT b FROM rb_blo) + (SELECT b FROM rb_bhi)) / 2.0) AS BIGINT) / 50.0 AS th)
, rb_conf AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM rb_th) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM rb_th) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM rb_th) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM rtsc WHERE split_a = 'test' AND split_b = 'test'
)
, rb_rk AS (
  SELECT idA, label,
    CAST(row_number() OVER (PARTITION BY idA ORDER BY dist, idB) AS BIGINT) AS rank
  FROM rtsc WHERE split_a = 'test' AND split_b = 'test'
)
, rb_qf AS (
  SELECT idA, CAST(SUM(label) AS BIGINT) AS n_rel,
    CAST(coalesce(MIN(CASE WHEN label = 1 THEN rank END), 0) AS BIGINT) AS first_rel_rank
  FROM rb_rk GROUP BY idA
)
, rb_ir AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
    CAST(coalesce(SUM(CAST(round(1000000.0 / first_rel_rank) AS BIGINT)), 0) AS BIGINT) AS srr
  FROM rb_qf WHERE n_rel > 0
)
, rb_st AS (
  SELECT CAST(coalesce(SUM(CAST(floor(f_st * 1000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM rtsc WHERE split_a = 'test' AND split_b = 'test' AND label = 1
)
SELECT CAST(${Cfg.dim} AS BIGINT) AS dim, CAST($E AS BIGINT) AS epochs,
  (SELECT th FROM rb_th) AS theta,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  (SELECT srr / n_queries / 1000000.0 FROM rb_ir) AS mrr,
  (SELECT CASE WHEN n = 0 THEN 0 ELSE CAST(floor(s / n + 0.5) AS BIGINT) END FROM rb_st) AS tp_st_dist_micros
FROM rb_conf""")

  // --- WERL over the batch fit: balanced GD on the frozen channels ---

  private val WCfg = graft.ml.Weights
  private val nF = Scored.length
  private def fdims = 0 until nF
  private def fcsv(f: Int => String) = fdims.map(f).mkString(",\n    ")
  private def fchain(f: Int => String) = fdims.map(f).mkString(" + ")

  /** The per-pair per-field micro distances of the batch fit — each
    * field micro-quantized on the mq6 grid (floor(x*1e6 + 0.5), the
    * same lattice the WERL channels use), at BOTH the full- and
    * half-epochs readouts (`f_<rel>_e${E/2}_micros` serves grid_werl's
    * half-trained cell). STAGED on the verified [[rltranseBatchModel]]
    * anchor (which replays the whole training chain first-principles
    * and compares the raw floats): this row re-derives only the
    * per-field translated-cosine scoring from those exact matrices. */
  val rltranseBatchFields: String = {
    val sb = new StringBuilder
    stagedModelCtes(sb, Seq(E, E / 2))
    sb ++= pairCtes
    sb ++= distCtes(E, "")
    sb ++= distCtes(E / 2, "_h")
    sb ++= s"""
SELECT f.idA, f.idB, f.label, f.split_a, f.split_b,
  ${Scored.map(rel =>
      s"CAST(floor(f.f_$rel * 1000000.0 + 0.5) AS BIGINT) AS f_${rel}_micros")
      .mkString(",\n  ")},
  ${Scored.map(rel =>
      s"CAST(floor(h.f_$rel * 1000000.0 + 0.5) AS BIGINT) AS f_${rel}_e${E / 2}_micros")
      .mkString(",\n  ")}
FROM fwide f JOIN fwide_h h ON h.idA = f.idA AND h.idB = f.idB"""
    OracleSql.q(sb.toString)
  }

  /** STAGED channel CTEs shared by the two werl_batch oracles: x_i =
    * the verified anchor's micro integers / 1e6 (exactly the mq6 value
    * — floor()'s DOUBLE k and the dump's BIGINT k divide identically)
    * in ScoredRels order (the Scala feat array layout). Leaves `wbf`
    * / `wbtrain` / `wbnc`. */
  private def werlChannelCtes(sb: StringBuilder): Unit = {
    sb ++= s"""
, wbf AS MATERIALIZED (
  SELECT idA, idB, CAST(label AS BIGINT) AS label, split_a, split_b,
    ${Scored.zipWithIndex.map { case (rel, i) =>
        s"f_${rel}_micros / 1000000.0 AS x$i" }.mkString(",\n    ")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_fields/*.parquet')
)
, wbtrain AS MATERIALIZED (
  SELECT label, ${fdims.map(d => s"x$d").mkString(", ")} FROM wbf
  WHERE split_a = 'train' AND split_b = 'train'
)
, wbnc AS (SELECT CAST(SUM(label) AS BIGINT) AS np,
    CAST(SUM(1 - label) AS BIGINT) AS nn FROM wbtrain)"""
  }

  /** [[werlChannelCtes]] + the balanced-GD unroll (`wbit<iters>`). */
  private def werlGdCtes(sb: StringBuilder): Unit = {
    werlChannelCtes(sb)
    OracleSqlGd.gdCtes(sb, "wbit", nF, "wbtrain", "wbnc",
      WCfg.WerlBatchLr, WCfg.WerlBatchReg, WCfg.WerlBatchIters)
  }

  /** werl_batch_metrics: dist = 1 - sigmoid(logit), train-swept theta
    * plateau, test confusion — the pairMetrics output shape.
    * STAGED twice over: channels from the verified
    * [[rltranseBatchFields]] anchor, GD weights reconstructed exactly
    * from the verified [[werlBatchWeights]] nano dump — this row
    * re-derives only scoring + sweep + confusion. */
  val werlBatchMetrics: String = {
    val sb = new StringBuilder
    werlChannelCtes(sb)
    val it = "wbwf"
    sb ++= s"""
, wbwf AS (
  SELECT
    ${fdims.map(d =>
      s"MAX(CASE WHEN feature = '${WCfg.WerlFeatures(d)}' THEN " +
      s"weight_nanos END) / 1e9 AS w$d").mkString(",\n    ")},
    MAX(CASE WHEN feature = 'intercept' THEN weight_nanos END) / 1e9 AS b
  FROM read_parquet('${OracleSql.OutDirToken}/werl_batch_weights/*.parquet')
)"""
    val zf = fchain(d => s"i.w$d * f.x$d")
    sb ++= s"""
, wbsc AS MATERIALIZED (
  SELECT f.idA, f.idB, f.label, f.split_a, f.split_b,
    1.0 - 1.0 / (1.0 + exp(-($zf + i.b))) AS dist
  FROM wbf f CROSS JOIN $it i
)
, wbswb AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM wbsc WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, wbsw AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM wbswb
  )
)
, wbfmax AS (SELECT max(f1) AS fm FROM wbsw)
, wbblo AS (SELECT min(bucket) AS b FROM wbsw, wbfmax WHERE f1 = fm)
, wbbhi AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM wbblo)) AS b
    FROM wbsw, wbfmax, wbblo WHERE bucket > wbblo.b AND f1 < fm)
, wbth AS (SELECT CAST(floor(((SELECT b FROM wbblo) + (SELECT b FROM wbbhi)) / 2.0) AS BIGINT) / 50.0 AS th)
, wbconf AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM wbth) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM wbth) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM wbth) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM wbth) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM wbsc WHERE split_a = 'test' AND split_b = 'test'
)
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  (tp + tn) / (tp + fp + fn + tn) AS accuracy
FROM wbconf"""
    OracleSql.q(sb.toString)
  }

  /** werl_batch_weights: (feature, weight_nanos) rows + intercept —
    * exact nano-lattice integers. STAGED: channels read from the
    * verified [[rltranseBatchFields]] anchor; the balanced-GD chain is
    * still replayed in full here (this query IS the fit's oracle). */
  val werlBatchWeights: String = {
    val sb = new StringBuilder
    werlGdCtes(sb)
    val names = WCfg.WerlFeatures :+ "intercept"
    val pick = fdims.map(d => s"WHEN $d THEN i.w$d").mkString(" ")
    sb ++= s"""
SELECT f.feature,
  CAST(floor((CASE f.d $pick ELSE i.b END) * 1e9 + 0.5) AS BIGINT)
    AS weight_nanos
FROM wbit${WCfg.WerlBatchIters} i
CROSS JOIN (VALUES ${names.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")}) f(d, feature)"""
    OracleSql.q(sb.toString)
  }

  /** grid_werl: the reference's WERL hyperparameter sweep
    * (/root/reference/tests/test_werl.py:223-260) on its epochs axis —
    * {E/2, E} batch-fit training epochs, each combo the FULL WERL
    * batch tier (mq6 channels, balanced GD, train-swept theta, test
    * F1/P/R + ranking MRR). ONE training chain serves both combos
    * (te_e{E/2} is a prefix of the E-epoch unroll and the per-epoch
    * draw keys don't involve the total); the E combo is STAGED on the
    * verified rltranse_batch_fields / werl_batch_weights dumps (that
    * cell IS the default werl_batch tier, fit-verified there), so only
    * the half-epochs combo replays training + GD from first
    * principles. */
  val gridWerl: String = {
    val eHalf = E / 2
    require(WCfg.WerlGridEpochs == Seq(eHalf, E),
      s"grid_werl shares the one training chain: axis must be " +
        s"{E/2, E}, got ${WCfg.WerlGridEpochs}")
    val sb = new StringBuilder
    // the half-epochs cell's channels come from the ANCHOR's
    // f_<rel>_e${E/2}_micros columns — the verified intermediate
    // readout of the one training chain rltranse_batch_fields unrolls
    // (micros / 1e6 IS the mq6 lattice value); this statement now
    // re-derives only the two GD/scoring tails, no training
    sb ++= s"""
, gwfa AS MATERIALIZED (
  SELECT idA, idB, CAST(label AS BIGINT) AS label, split_a, split_b,
    ${Scored.zipWithIndex.map { case (rel, i) =>
        s"f_${rel}_e${eHalf}_micros / 1000000.0 AS x$i" }.mkString(",\n    ")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_fields/*.parquet')
)
, gwtra AS MATERIALIZED (
  SELECT label, ${fdims.map(d => s"x$d").mkString(", ")} FROM gwfa
  WHERE split_a = 'train' AND split_b = 'train'
)
, gwnca AS (SELECT CAST(SUM(label) AS BIGINT) AS np,
    CAST(SUM(1 - label) AS BIGINT) AS nn FROM gwtra)"""
    OracleSqlGd.gdCtes(sb, "gwita", nF, "gwtra", "gwnca",
      WCfg.WerlBatchLr, WCfg.WerlBatchReg, WCfg.WerlBatchIters)
    sb ++= s"""
, gwfb AS MATERIALIZED (
  SELECT idA, idB, CAST(label AS BIGINT) AS label, split_a, split_b,
    ${Scored.zipWithIndex.map { case (rel, i) =>
        s"f_${rel}_micros / 1000000.0 AS x$i" }.mkString(",\n    ")}
  FROM read_parquet('${OracleSql.OutDirToken}/rltranse_batch_fields/*.parquet')
)
, gwwb AS (
  SELECT
    ${fdims.map(d =>
      s"MAX(CASE WHEN feature = '${WCfg.WerlFeatures(d)}' THEN " +
      s"weight_nanos END) / 1e9 AS w$d").mkString(",\n    ")},
    MAX(CASE WHEN feature = 'intercept' THEN weight_nanos END) / 1e9 AS b
  FROM read_parquet('${OracleSql.OutDirToken}/werl_batch_weights/*.parquet')
)"""
    def combo(sfx: String, fCte: String, wCte: String,
              epochs: Int): String = {
      val zf = fchain(d => s"i.w$d * f.x$d")
      sb ++= s"""
, gsc_$sfx AS MATERIALIZED (
  SELECT f.idA, f.idB, f.label, f.split_a, f.split_b,
    1.0 - 1.0 / (1.0 + exp(-($zf + i.b))) AS dist
  FROM $fCte f CROSS JOIN $wCte i
)
, gswb_$sfx AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM gsc_$sfx WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, gsw_$sfx AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM gswb_$sfx
  )
)
, gfm_$sfx AS (SELECT max(f1) AS fm FROM gsw_$sfx)
, glo_$sfx AS (SELECT min(bucket) AS b FROM gsw_$sfx, gfm_$sfx WHERE f1 = fm)
, ghi_$sfx AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM glo_$sfx)) AS b
    FROM gsw_$sfx, gfm_$sfx, glo_$sfx WHERE bucket > glo_$sfx.b AND f1 < fm)
, gth_$sfx AS (SELECT CAST(floor(((SELECT b FROM glo_$sfx) + (SELECT b FROM ghi_$sfx)) / 2.0) AS BIGINT) / 50.0 AS th)
, gconf_$sfx AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM gth_$sfx) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM gth_$sfx) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM gth_$sfx) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM gsc_$sfx WHERE split_a = 'test' AND split_b = 'test'
)
, grk_$sfx AS (
  SELECT idA, label,
    CAST(row_number() OVER (PARTITION BY idA
      ORDER BY dist ASC, idB ASC) AS BIGINT) AS rank
  FROM gsc_$sfx WHERE split_a = 'test' AND split_b = 'test'
)
, gqf_$sfx AS (
  SELECT idA, CAST(SUM(label) AS BIGINT) AS n_rel,
    CAST(coalesce(MIN(CASE WHEN label = 1 THEN rank END), 0) AS BIGINT)
      AS first_rel_rank
  FROM grk_$sfx GROUP BY idA
)
, gir_$sfx AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
    CAST(coalesce(SUM(CAST(round(1000000.0 / first_rel_rank) AS BIGINT)), 0)
      AS BIGINT) AS srr
  FROM gqf_$sfx WHERE n_rel > 0
)"""
      s"""SELECT CAST($epochs AS DOUBLE) AS epochs,
  (SELECT CASE WHEN tp = 0 THEN 0.0
    ELSE tp * 2 / (tp * 2 + fp + fn) END FROM gconf_$sfx) AS f1,
  (SELECT CASE WHEN tp + fp = 0 THEN 0.0
    ELSE tp / (tp + fp) END FROM gconf_$sfx) AS precision,
  (SELECT CASE WHEN tp + fn = 0 THEN 0.0
    ELSE tp / (tp + fn) END FROM gconf_$sfx) AS recall,
  (SELECT srr / n_queries / 1000000.0 FROM gir_$sfx) AS mrr"""
    }
    val rows = Seq(
      combo("a", "gwfa", s"gwita${WCfg.WerlBatchIters}", eHalf),
      combo("b", "gwfb", "gwwb", E))
    sb ++= "\n" + rows.mkString("\nUNION ALL\n")
    OracleSql.q(sb.toString)
  }

  // --- LogisticRLTransE over the batch fit: balanced GD on the
  // dim-wide per-field translated DIFFERENCE vectors (the reference's
  // tests/test_logistic_rl_transe.py tier re-expressed over the
  // distributed batch trainer so every stage is SQL-replayable; the
  // sequential-fit variant stays in ml.Weights under its spec test,
  // off the driver surface) ---

  private val nLF = WCfg.LogRltBatchDim
  // drift guard: the pivot below lays features out field-major over
  // ScoredRels x dim — the Scala fieldDiffFeatures layout
  require(nLF == Scored.length * R.D,
    s"LogRltBatchDim ($nLF) diverged from ScoredRels x dim " +
      s"(${Scored.length} x ${R.D})")

  /** Dim-wide diff features of the epoch-`ep` batch model, long form
    * (pair x field) then pivoted to x0..x{nLF-1} micro integers.
    * Mirrors [[graft.sim.RLTransE.fieldDiffFeatures]] exactly:
    * ((ea + er) - eb) per dimension in DOUBLE left to right, zero
    * block on va = vb, 1.0 fill when either value misses the train
    * vocabulary; then the mq6 floor both engines share. */
  private def diffFeatCtes(ep: Int): String = {
    val pivots = Scored.zipWithIndex.flatMap { case (rel, f) =>
      dims.map(d =>
        s"MAX(CASE WHEN rid = ${Rels.indexOf(rel)} THEN m$d END) " +
          s"AS x${f * R.D + d}_micros")
    }.mkString(",\n    ")
    s"""
, ldf AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b, rid,
    ${csv(d => s"CASE WHEN va = vb THEN CAST(0 AS BIGINT) " +
        s"WHEN iav IS NULL OR ibv IS NULL THEN CAST(1000000 AS BIGINT) " +
        s"ELSE CAST(floor(((ea$d + er$d) - eb$d) * 1000000.0 + 0.5) " +
        s"AS BIGINT) END AS m$d")}
  FROM (
    SELECT p.idA, p.idB, p.label, p.split_a, p.split_b, p.rid, p.va, p.vb,
      ia.vidx AS iav, ib.vidx AS ibv,
      ${csv(d => s"ea.e$d::DOUBLE AS ea$d")},
      ${csv(d => s"rr.r$d::DOUBLE AS er$d")},
      ${csv(d => s"eb.e$d::DOUBLE AS eb$d")}
    FROM fpair p
    LEFT JOIN voc ia ON ia.r = p.rid AND ia.value = p.va
    LEFT JOIN voc ib ON ib.r = p.rid AND ib.value = p.vb
    CROSS JOIN vmax mv
    LEFT JOIN te_e$ep ea ON ea.ent_id = p.rid * mv.mv + ia.vidx
    LEFT JOIN te_e$ep eb ON eb.ent_id = p.rid * mv.mv + ib.vidx
    LEFT JOIN te_r$ep rr ON rr.rid = p.rid
  )
)
, lfw AS MATERIALIZED (
  SELECT idA, idB, label, split_a, split_b,
    $pivots
  FROM ldf GROUP BY idA, idB, label, split_a, split_b
)"""
  }

  /** logistic_rltranse_batch_feats — the tier's feature anchor: exact
    * micro integers per pair x flattened dimension, STAGED on the
    * verified [[rltranseBatchModel]] root anchor (this row re-derives
    * only the per-dimension translated differences from the exact
    * matrices). The weights / metrics oracles stage on this dump. */
  val logisticRlTransEBatchFeats: String = {
    val sb = new StringBuilder
    stagedModelCtes(sb, Seq(E))
    sb ++= pairCtes
    sb ++= diffFeatCtes(E)
    sb ++= s"""
SELECT idA, idB, label, split_a, split_b,
  ${(0 until nLF).map(i => s"x${i}_micros").mkString(", ")}
FROM lfw"""
    OracleSql.q(sb.toString)
  }

  /** STAGED feature CTEs shared by the two downstream oracles: x_i =
    * the verified anchor's micro integers / 1e6 (exactly the mq6
    * doubles the Scala GD consumes). Leaves `lbf` / `lbtrain` /
    * `lbnc`. */
  private def logRltChannelCtes(sb: StringBuilder): Unit = {
    sb ++= s"""
, lbf AS MATERIALIZED (
  SELECT idA, idB, CAST(label AS BIGINT) AS label, split_a, split_b,
    ${(0 until nLF).map(i =>
        s"x${i}_micros / 1000000.0 AS x$i").mkString(",\n    ")}
  FROM read_parquet('${OracleSql.OutDirToken}/logistic_rltranse_batch_feats/*.parquet')
)
, lbtrain AS MATERIALIZED (
  SELECT label, ${(0 until nLF).map(d => s"x$d").mkString(", ")} FROM lbf
  WHERE split_a = 'train' AND split_b = 'train'
)
, lbnc AS (SELECT CAST(SUM(label) AS BIGINT) AS np,
    CAST(SUM(1 - label) AS BIGINT) AS nn FROM lbtrain)"""
  }

  /** logistic_rltranse_batch_weights: (feature, weight_nanos) rows —
    * STAGED channels from the verified feats anchor; the balanced-GD
    * chain is replayed in full here (this query IS the fit's
    * oracle). */
  val logisticRlTransEBatchWeights: String = {
    val sb = new StringBuilder
    logRltChannelCtes(sb)
    OracleSqlGd.gdCtes(sb, "lbit", nLF, "lbtrain", "lbnc",
      WCfg.LogRltBatchLr, WCfg.LogRltBatchReg, WCfg.LogRltBatchIters)
    val names = WCfg.LogRltBatchFeatures :+ "intercept"
    val pick = (0 until nLF).map(d => s"WHEN $d THEN i.w$d").mkString(" ")
    sb ++= s"""
SELECT f.feature,
  CAST(floor((CASE f.d $pick ELSE i.b END) * 1e9 + 0.5) AS BIGINT)
    AS weight_nanos
FROM lbit${WCfg.LogRltBatchIters} i
CROSS JOIN (VALUES ${names.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")}) f(d, feature)"""
    OracleSql.q(sb.toString)
  }

  /** logistic_rltranse_batch_metrics: dist = 1 - sigmoid(logit),
    * train-swept theta plateau, test confusion — STAGED twice over
    * (channels from the feats anchor, GD weights reconstructed from
    * the verified nano dump), so this row re-derives only scoring +
    * sweep + confusion. */
  val logisticRlTransEBatchMetrics: String = {
    val sb = new StringBuilder
    logRltChannelCtes(sb)
    sb ++= s"""
, lbwf AS (
  SELECT
    ${(0 until nLF).map(d =>
        s"MAX(CASE WHEN feature = 'x$d' THEN weight_nanos END) / 1e9 " +
          s"AS w$d").mkString(",\n    ")},
    MAX(CASE WHEN feature = 'intercept' THEN weight_nanos END) / 1e9 AS b
  FROM read_parquet('${OracleSql.OutDirToken}/logistic_rltranse_batch_weights/*.parquet')
)"""
    val zf = (0 until nLF).map(d => s"i.w$d * f.x$d").mkString(" + ")
    sb ++= s"""
, lbsc AS MATERIALIZED (
  SELECT f.idA, f.idB, f.label, f.split_a, f.split_b,
    1.0 - 1.0 / (1.0 + exp(-($zf + i.b))) AS dist
  FROM lbf f CROSS JOIN lbwf i
)
, lbswb AS (
  SELECT CAST(ceil(dist * 50) AS INT) AS bucket,
    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS npos
  FROM lbsc WHERE split_a = 'train' AND split_b = 'train' GROUP BY 1
)
, lbsw AS (
  SELECT bucket,
    CASE WHEN tp = 0 THEN 0.0
         ELSE tp * 2 / (tp * 2 + (cum_n - tp) + (total_pos - tp)) END AS f1
  FROM (
    SELECT bucket,
      CAST(SUM(npos) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
      CAST(SUM(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
      CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
    FROM lbswb
  )
)
, lbfmax AS (SELECT max(f1) AS fm FROM lbsw)
, lbblo AS (SELECT min(bucket) AS b FROM lbsw, lbfmax WHERE f1 = fm)
, lbbhi AS (SELECT coalesce(min(bucket) - 1, (SELECT b FROM lbblo)) AS b
    FROM lbsw, lbfmax, lbblo WHERE bucket > lbblo.b AND f1 < fm)
, lbth AS (SELECT CAST(floor(((SELECT b FROM lbblo) + (SELECT b FROM lbbhi)) / 2.0) AS BIGINT) / 50.0 AS th)
, lbconf AS (
  SELECT
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM lbth) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN dist <= (SELECT th FROM lbth) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM lbth) AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN dist >  (SELECT th FROM lbth) AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM lbsc WHERE split_a = 'test' AND split_b = 'test'
)
SELECT tp, fp, fn, tn,
  CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
  CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
  CASE WHEN tp = 0 THEN 0.0 ELSE tp * 2 / (tp * 2 + fp + fn) END AS f1,
  (tp + tn) / (tp + fp + fn + tn) AS accuracy
FROM lbconf"""
    OracleSql.q(sb.toString)
  }
}
