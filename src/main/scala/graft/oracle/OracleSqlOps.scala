package graft.oracle

import graft.ops.TextOps

/**
 * DuckDB oracle SQL for the training-data-pipeline operators over the
 * `documents` / `embeddings` tables (dedup, text analysis, ANN).
 * Mirrors graft.ops.* semantics token for token; float discipline as
 * in [[OracleSql]] (integer-derived doubles and rank-stable ids only).
 */
object OracleSqlOps {

  private def ducklist(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private val normText = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val toksCte =
    s"""WITH t AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)"""

  val textStats: String = toksCte + s""",
s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS len_chars,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_token_len,
    CAST(len(list_filter(toks, x -> list_contains(${ducklist(TextOps.Stopwords)}, x))) AS BIGINT) AS n_stopwords,
    CAST(len(string_split_regex(text, '[^a-z0-9\\s]')) - 1 AS BIGINT) AS n_punct
  FROM t
)
SELECT *,
  sum_token_len / n_tokens AS avg_token_len,
  n_stopwords / n_tokens AS stopword_ratio,
  n_punct / len_chars AS punct_ratio,
  (CASE WHEN n_tokens >= 10 AND n_tokens <= 2000 THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
    * (1.0::DOUBLE - (n_stopwords / n_tokens) * 0.5::DOUBLE) AS quality_score
FROM s"""

  val langId: String = toksCte + s""",
s AS (
  SELECT doc_id, lang,
${TextOps.LangMarkers.map { case (l, ws) =>
    s"    CAST(len(list_filter(toks, x -> list_contains(${ducklist(ws)}, x))) AS BIGINT) AS s_$l"
  }.mkString(",\n")}
  FROM t
), m AS (
  SELECT *, greatest(${TextOps.LangMarkers.map(lm => s"s_${lm._1}").mkString(", ")}) AS mx FROM s
), p AS (
  SELECT doc_id, lang,
    CASE ${TextOps.LangMarkers.map { case (l, _) =>
      s"WHEN s_$l = mx THEN '$l'" }.mkString(" ")} ELSE 'unknown' END AS pred_lang
  FROM m
)
SELECT doc_id, lang, pred_lang,
  CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
FROM p"""

  val tokenCount: String = """SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents"""

  val docFingerprint: String = s"""WITH t AS (
  SELECT doc_id, $normText AS nt FROM documents
), tk AS (
  SELECT doc_id, nt, string_split(nt, ' ') AS toks FROM t
)
SELECT doc_id, md5(nt) AS md5_full,
  list_min([md5(array_to_string(list_slice(toks, i, i + 4), ' '))
            for i in range(1, greatest(len(toks) - 4, 1) + 1)]) AS min_shingle_md5
FROM tk"""

  val dedupExact: String = s"""WITH d AS (
  SELECT doc_id, md5($normText) AS fp FROM documents
), g AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS group_size, MIN(doc_id) AS canonical_id
  FROM d GROUP BY fp
)
SELECT doc_id, fp, group_size, canonical_id,
  CAST(CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM d JOIN g USING (fp)"""

  private val shinglesCte = s"""WITH t AS (
  SELECT doc_id, string_split($normText, ' ') AS toks FROM documents
), shall AS (
  SELECT doc_id,
         unnest(list_distinct([md5(array_to_string(list_slice(toks, i, i + 2), ' '))
                for i in range(1, greatest(len(toks) - 2, 1) + 1)])) AS shingle
  FROM t
), keep AS (
  SELECT shingle FROM shall GROUP BY shingle
  HAVING COUNT(*) <= ${graft.ops.Dedup.ShingleDfCap}
), sh AS (
  SELECT doc_id, shingle FROM shall JOIN keep USING (shingle)
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT s1.doc_id AS doc1, s2.doc_id AS doc2, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh s1 JOIN sh s2 USING (shingle)
  WHERE s1.doc_id < s2.doc_id GROUP BY 1, 2
)"""

  val shingleDfStats: String = shinglesCte + s"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(SUM(CASE WHEN df > ${graft.ops.Dedup.ShingleDfCap} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(MAX(df) AS BIGINT) AS max_df,
  CAST(${graft.ops.Dedup.ShingleDfCap} AS BIGINT) AS df_cap
FROM (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM shall GROUP BY shingle)"""

  val ngramJaccard: String = shinglesCte + """
SELECT doc1, doc2, inter / (n1 + n2 - inter) AS jaccard
FROM inter
JOIN (SELECT doc_id AS doc1, n_sh AS n1 FROM sizes) USING (doc1)
JOIN (SELECT doc_id AS doc2, n_sh AS n2 FROM sizes) USING (doc2)
ORDER BY jaccard DESC, doc1, doc2 LIMIT 20"""

  val minhashLsh: String = shinglesCte + """,
seeded AS (
  SELECT doc_id, seed, shingle FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed)
), sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM seeded GROUP BY doc_id, seed
), bands AS (
  SELECT doc_id, CAST(floor(seed / 2) AS INT) AS band,
    md5(array_to_string(list_sort(list(CAST(seed AS VARCHAR) || '=' || mh)), '|')) AS band_key
  FROM sig GROUP BY doc_id, CAST(floor(seed / 2) AS INT)
), cands AS (
  SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
  FROM bands b1 JOIN bands b2 USING (band, band_key)
  WHERE b1.doc_id < b2.doc_id
)
SELECT doc1, doc2,
  coalesce(inter, 0) / (n1 + n2 - coalesce(inter, 0)) AS jaccard
FROM cands
LEFT JOIN inter USING (doc1, doc2)
JOIN (SELECT doc_id AS doc1, n_sh AS n1 FROM sizes) USING (doc1)
JOIN (SELECT doc_id AS doc2, n_sh AS n2 FROM sizes) USING (doc2)
ORDER BY jaccard DESC, doc1, doc2 LIMIT 20"""

  /** Near-dup document clustering ([[graft.ops.Dedup.dedupClusters]]):
    * the SAME banded-minhash edge derivation as [[minhashLsh]]
    * (threshold on the exact verified Jaccard — one integer division,
    * bit-identical across engines), then transitive closure via a
    * RECURSIVE CTE with cluster = min doc_id, exactly the fixpoint the
    * large/small-star loop converges to (same shape as
    * [[OracleSql.ccClusters]]). */
  val dedupClusters: String = "WITH RECURSIVE " +
    shinglesCte.stripPrefix("WITH ") + s""",
seeded AS (
  SELECT doc_id, seed, shingle FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed)
), sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS mh
  FROM seeded GROUP BY doc_id, seed
), bands AS (
  SELECT doc_id, CAST(floor(seed / 2) AS INT) AS band,
    md5(array_to_string(list_sort(list(CAST(seed AS VARCHAR) || '=' || mh)), '|')) AS band_key
  FROM sig GROUP BY doc_id, CAST(floor(seed / 2) AS INT)
), cands AS (
  SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2
  FROM bands b1 JOIN bands b2 USING (band, band_key)
  WHERE b1.doc_id < b2.doc_id
), medge AS MATERIALIZED (
  SELECT doc1, doc2
  FROM cands
  LEFT JOIN inter USING (doc1, doc2)
  JOIN (SELECT doc_id AS doc1, n_sh AS n1 FROM sizes) USING (doc1)
  JOIN (SELECT doc_id AS doc2, n_sh AS n2 FROM sizes) USING (doc2)
  WHERE coalesce(inter, 0) / (n1 + n2 - coalesce(inter, 0))
        >= ${graft.ops.Dedup.ClusterMinJaccard}
), uedge AS MATERIALIZED (
  SELECT doc1 AS a, doc2 AS b FROM medge
  UNION ALL
  SELECT doc2 AS a, doc1 AS b FROM medge
), reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM t
  UNION
  SELECT e.b AS node, r.lbl FROM reach r JOIN uedge e ON e.a = r.node
), cl AS (
  SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster
  FROM reach GROUP BY node
), sz AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM cl GROUP BY cluster
)
SELECT doc_id, cluster, cluster_size,
  CAST(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM cl JOIN sz USING (cluster)"""

  /** [[graft.ops.Dedup.simhash64]]'s per-token FNV-1a 32-bit hash as a
    * DuckDB `list_reduce`. The Scala kernel folds each UTF-16 char as
    * two steps (`c & 0xff` then `c >>> 8`); for 7-bit ASCII the second
    * step xors 0, i.e. is a plain extra multiply — the `ascii_guard`
    * CTE below THROWS (DuckDB `error()`) on any non-ASCII char, so a
    * corpus change fails loudly instead of silently diverging. All
    * intermediates fit BIGINT: (h ^ c) < 2^32 times the FNV prime
    * (~2^24) < 2^57. */
  private def fnvTokSql(basis: Long): String =
    s"""list_reduce(list_prepend($basis::BIGINT,
      list_transform(range(1, length(tok) + 1), i -> ord(substr(tok, i, 1))::BIGINT)),
      (h, c) -> ((xor(h, c) * 16777619) % 4294967296 * 16777619) % 4294967296)"""

  /** Brute-force mirror of [[graft.ops.Dedup.simhashPairs]]: the Spark
    * side buckets by 4x16-bit bands before verifying, but the band
    * pigeonhole (hamming<=3 differs in at most 3 of 4 bands) makes its
    * output EQUAL to the exact hamming filter, which is what the oracle
    * computes — the oracle thereby also re-proves the pigeonhole claim
    * on every run. Signed-64 composition: the unsigned (hi<<32)|lo sum
    * is built in HUGEINT and wrapped to BIGINT two's-complement. */
  val dedupSimhash: String = s"""WITH nd AS (
  SELECT doc_id, $normText AS t FROM documents
), toks0 AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM nd
), toks AS (
  SELECT doc_id,
    CASE WHEN tok ~ '^[ -~]*$$' THEN tok
         ELSE error('dedup_simhash oracle: non-ASCII token; the FNV char fold no longer matches') END AS tok
  FROM toks0 WHERE tok <> ''
), th AS (
  SELECT doc_id,
    ${fnvTokSql(0x811c9dc5L)} AS hi,
    ${fnvTokSql(0x9e3779b9L)} AS lo
  FROM toks
), bits AS (
  SELECT doc_id, b,
    SUM(CASE WHEN b < 32 THEN (lo >> b) & 1 ELSE (hi >> (b - 32)) & 1 END * 2 - 1) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) GROUP BY doc_id, b
), sh0 AS (
  SELECT doc_id, COALESCE(SUM(CASE WHEN acc > 0 THEN (1::HUGEINT << b) ELSE 0 END), 0) AS u
  FROM bits GROUP BY doc_id
), sh AS (
  SELECT doc_id,
    CAST(u - CASE WHEN u >= 9223372036854775808::HUGEINT
                  THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS simhash
  FROM sh0
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= ${graft.ops.Dedup.SimhashMaxHamming}
ORDER BY hamming ASC, doc1 ASC, doc2 ASC LIMIT 50"""

  val dedupEmbedCosine: String = """WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
)
SELECT id1, id2, label FROM (
  SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
         list_cosine_similarity(a.v, b.v) AS cos
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  ORDER BY cos DESC, id1, id2 LIMIT 20
)"""

  /** Exact near-dup pairs over the planted augmented embedding view
    * (mirrors graft.ops.Dedup.augmentedEmbeddings / embedLshPairs: the
    * LSH + rerank output must equal this exact cosine join — natural
    * max cosine ~0.51 vs planted ~0.995+, so the 0.9 threshold has a
    * huge kernel-difference margin). */
  val dedupEmbedLsh: String = s"""WITH base AS (
  SELECT vec_id, embedding FROM embeddings
), aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM base
  UNION ALL
  SELECT vec_id + ${graft.ops.Dedup.PlantOffset},
         ([embedding[1] * 1.1] || embedding[2:])::DOUBLE[] AS v
  FROM base WHERE vec_id % 5 = 0
)
SELECT a.vec_id AS id1, b.vec_id AS id2
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.9
ORDER BY id1, id2"""

  val streamWindowed: String = """SELECT
  CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS window_epoch,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2"""

  val mmBinaryMeta: String = """SELECT doc_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  md5(text) AS payload_md5,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS kind,
  CAST(doc_id % 640 + 64 AS BIGINT) AS width,
  CAST(doc_id % 480 + 48 AS BIGINT) AS height
FROM documents"""

  /** Closed-form expected stats of graft.ops.Multimodal.decodeFeatures:
    * the Spark side ENCODES a real BMP/WAV container per doc_id and
    * DECODES it by header/chunk parsing; this oracle recomputes the
    * same stats arithmetically — a parsing bug (stride, row order,
    * chunk offsets, sample widths) cannot hash-match it. */
  val mmDecodeFeatures: String = """WITH f AS (
  SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
         doc_id % 4 + 4 AS w, strlen(text) AS n_bytes
  FROM documents
)
SELECT doc_id,
  CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(CASE m WHEN 0 THEN w
              WHEN 1 THEN 8000 + (doc_id % 8) * 1000
              ELSE 0 END AS BIGINT) AS dim1,
  CAST(CASE m WHEN 0 THEN 4 WHEN 1 THEN 32 ELSE 16 END AS BIGINT) AS dim2,
  CAST(CASE m
    WHEN 0 THEN list_sum(list_transform(range(0, w * 4 * 3),
                  i -> (doc_id * 3 + i) % 256))
    WHEN 1 THEN list_sum(list_transform(range(0, 32),
                  i -> abs((doc_id * 7 + i * 13) % 2048 - 1024)))
    ELSE n_bytes END AS BIGINT) AS stat
FROM f"""

  /** recordlinkage-style gauss comparator over two embedding dims,
    * micro-rounded (mirrors graft.ml.EmbedLogistic.gaussSim). */
  val gaussComparator: String = """SELECT vec_id,
  CAST(round(CASE WHEN abs(a - b) <= 0 THEN 1.0
    ELSE power(2.0, -power(abs(a - b) / 0.5, 2.0)) END * 1000000) AS BIGINT)
    AS gauss_micros
FROM (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS a,
             CAST(embedding[2] AS DOUBLE) AS b
      FROM embeddings WHERE vec_id < 100)"""

  val annTopK: String = """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 50
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
    CAST(round(list_cosine_similarity(qv, v) * 1000000) AS BIGINT) AS cos_micros
  FROM q CROSS JOIN e WHERE e.vec_id <> query_id
), ranked AS (
  SELECT query_id,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_micros DESC, neighbor_id) AS BIGINT) AS rank,
    neighbor_id
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3"""

  /**
   * Full bit-exact replay of [[graft.ops.Ann.lshTopK]]: the FNV-seeded
   * hyperplanes ([[graft.ops.Ann.planeComponent]] — fnvMix replayed via
   * [[OracleSql.fnvMixSql]], top-53-bit uniform double, REAL-truncated),
   * the integer-exact signature width bound ([[graft.ops.Ann.lshBits]]),
   * sign-bit signatures whose dot products sum LEFT-TO-RIGHT in double
   * exactly like the Scala kernel (explicit 64-term `+` chain — a sign
   * threshold has no rounding tolerance, unlike the micro-rounded
   * rerank), bucket equi-join, distinct id pairs, exact micro-rounded
   * cosine rerank.
   */
  val annLshTopK: String = {
    val dot = (1 to 64).map(i => s"p[$i] * v[$i]").mkString(" + ")
    s"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), nb AS (
  SELECT MIN(b) AS bits
  FROM range(3, 31) t(b), (SELECT count(*) AS n FROM e) c
  WHERE (1::BIGINT << b) * ${graft.ops.Ann.TargetBucket} >= c.n OR b = 30
), planes AS MATERIALIZED (
  SELECT t, b, list(comp ORDER BY i) AS p
  FROM (
    SELECT t, b, i,
      CAST(CAST(CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0
           AS REAL) AS DOUBLE) AS comp
    FROM (
      SELECT t, b, i,
        ${OracleSql.fnvMixSql("(t * 4099 + b)::HUGEINT", "i::HUGEINT")} AS h
      FROM range(0, ${graft.ops.Ann.LshTables}) rt(t)
      CROSS JOIN (SELECT unnest(range(0, (SELECT bits FROM nb))) AS b)
      CROSS JOIN range(0, 64) ri(i)
    )
  ) GROUP BY t, b
), sigs AS MATERIALIZED (
  SELECT vec_id, t,
    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
  FROM (
    SELECT e.vec_id, pl.t, pl.b, $dot AS dot
    FROM e CROSS JOIN planes pl
  ) GROUP BY vec_id, t
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id
), scored AS (
  SELECT query_id, neighbor_id,
    CAST(round(list_cosine_similarity(qv.v, nv.v) * 1000000) AS BIGINT) AS cm
  FROM cand
  JOIN e qv ON qv.vec_id = query_id
  JOIN e nv ON nv.vec_id = neighbor_id
), ranked AS (
  SELECT query_id,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cm DESC, neighbor_id) AS BIGINT) AS rank,
    neighbor_id
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3"""
  }

  /** IVF ANN oracle: per-label centroid means, top-2 probed labels per
    * query, exact rerank — all on micro-rounded cosine (both engines'
    * cosine kernels sum identical doubles in identical index order;
    * centroids stay double on both sides). */
  val annIvfTopK: String = {
    val centCols = (1 to 64).map(i => s"avg(v[$i])").mkString(", ")
    s"""WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), cent AS (
  SELECT label, [$centCols]::DOUBLE[] AS c FROM e GROUP BY label
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 50
), probe AS (
  SELECT query_id, label,
    row_number() OVER (PARTITION BY query_id ORDER BY
      CAST(round(list_cosine_similarity(qv, c) * 1000000) AS BIGINT) DESC,
      label) AS pr
  FROM q CROSS JOIN cent
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    CAST(round(list_cosine_similarity(q.qv, e.v) * 1000000) AS BIGINT) AS cm
  FROM q
  JOIN probe p ON p.query_id = q.query_id AND p.pr <= 2
  JOIN e ON e.label = p.label AND e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cm DESC, neighbor_id) AS BIGINT) AS rank,
    neighbor_id
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3"""
  }

  // ---- deterministic stratified sampling ---------------------------
  // graft.ops.Sample replayed exactly: the seeded FNV-1a u20 draw runs
  // through OracleSql.fnvMixChainW (doc_id is structurally < 2^40 -> 5
  // live bytes; the salt is one byte), the per-stratum rate table is
  // the same CASE, and every exported value is an exact integer.

  private def sampleRateCase: String =
    "(CASE lang " + graft.ops.Sample.Rates.map { case (l, r) =>
      s"WHEN '$l' THEN $r::HUGEINT " }.mkString +
      s"ELSE ${graft.ops.Sample.DefaultRateU20}::HUGEINT END)"

  private def sampleChain: String =
    "WITH sdoc AS MATERIALIZED (SELECT doc_id, lang FROM documents)" +
      OracleSql.fnvMixChainW("sst", "sdoc", "doc_id::HUGEINT",
        s"${graft.ops.Sample.Salt}::HUGEINT", 5, 1)

  private val sampleMask = graft.ops.Sample.RateOne - 1

  val sampleStratified: String = sampleChain + s"""
SELECT doc_id, lang,
  CAST((sst_h & $sampleMask::HUGEINT) AS BIGINT) AS draw_u20
FROM sst4
WHERE (sst_h & $sampleMask::HUGEINT) < $sampleRateCase"""

  val sampleStrataStats: String = sampleChain + s"""
SELECT lang,
  CAST($sampleRateCase AS BIGINT) AS rate_u20,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN (sst_h & $sampleMask::HUGEINT) < $sampleRateCase
    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM sst4
GROUP BY lang"""
}
