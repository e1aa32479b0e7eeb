package graft.sim

/**
 * Deterministic char-n-gram feature-hash embeddings.
 *
 * Stand-in for the reference's trained TransE/RLTransE embedding
 * matrices (/root/reference/ER/transe.py:156-158,
 * /root/reference/VEG/rltranse.py:59-84) with the same *operator
 * semantics* — cosine distance between dense vectors looked up from a
 * broadcast matrix inside `mapPartitions` — but reproducible
 * (SURVEY.md §7.4 v1 decision: the graft metric is cluster/F1
 * fidelity, not TF weight equality; reference training is
 * nondeterministic).
 *
 * Scale design: the broadcast state is a FIXED-SIZE projection matrix
 * (`buckets x dim`, ~2 MB), not a per-record or per-token table — a
 * record's vector is the L2-normalized sum of projection rows indexed
 * by the FNV-1a hash of its char trigrams. At 10^12 rows the broadcast
 * cost is unchanged, unlike a vocab-sized matrix.
 */
object Embed {

  final val DefaultDim = 64
  final val DefaultBuckets = 4096

  /** Seed multiplier separating the projection's fnvMix stream from the
    * ANN hyperplane and sampler streams (any distinct affine works). */
  final val ProjSeed = 100003L

  /**
   * Uniform double in [-1, 1): FNV-1a mix of (bucket, dim) with the top
   * 53 bits mapped to a uniform double. Seeded-hash instead of
   * `java.util.Random` so the DuckDB oracle replays the exact matrix
   * (same fnvMix already replayed in SQL for the negative samplers and
   * ANN hyperplanes).
   */
  def projComponent(bkt: Int, j: Int): Double = {
    val h = NegativeSampler.fnvMix((bkt.toLong + 1L) * ProjSeed, j.toLong)
    (h >>> 11).toDouble / 9007199254740992.0 * 2.0 - 1.0
  }

  /**
   * buckets x dim pseudo-random rows, deterministic AND SQL-replayable.
   * Rows are deliberately NOT normalized: the record vector is
   * L2-normalized after accumulation, so per-row norms only perturb
   * bucket weights — skipping the row normalization removes a whole
   * rounding stage the oracle would otherwise have to replicate.
   */
  def projection(buckets: Int = DefaultBuckets,
                 dim: Int = DefaultDim): Array[Array[Double]] =
    Array.tabulate(buckets)(b => Array.tabulate(dim)(j => projComponent(b, j)))

  /** FNV-1a 32-bit over UTF-16 chars; stable across JVMs. */
  def fnv1a(s: CharSequence, from: Int, until: Int): Int =
    fnv1aSeeded(s, from, until, 0x811c9dc5)

  /** FNV-1a with an explicit offset basis: two different bases give two
    * (near-)independent 32-bit hashes of the same token. */
  def fnv1aSeeded(s: CharSequence, from: Int, until: Int, basis: Int): Int = {
    var h = basis
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h = (h ^ (c & 0xff)) * 0x01000193
      h = (h ^ (c >>> 8)) * 0x01000193
      i += 1
    }
    h
  }

  def l2normalize(v: Array[Float]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    if (s > 0) {
      val inv = (1.0 / math.sqrt(s))
      i = 0
      while (i < v.length) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
  }

  def l2normalize(v: Array[Double]): Unit = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < v.length) { v(i) *= inv; i += 1 }
    }
  }

  /**
   * L2-normalized trigram feature-hash vector of `s` under `proj` —
   * all-double accumulation, so the only divergence from the DuckDB
   * replay (which SUMs the same bucket components in an engine-chosen
   * order) is non-associativity noise ~1e-15, absorbed by the
   * micro-rounded export.
   */
  def vector(s: String, proj: Array[Array[Double]]): Array[Double] = {
    val dim = proj(0).length
    val mask = proj.length - 1
    require((proj.length & mask) == 0, "buckets must be a power of two")
    val out = new Array[Double](dim)
    val n = s.length
    if (n == 0) return out
    val gram = 3
    var i = 0
    val last = math.max(n - gram, 0)
    while (i <= last) {
      val until = math.min(i + gram, n)
      val row = proj(fnv1a(s, i, until) & mask)
      var j = 0
      while (j < dim) { out(j) += row(j); j += 1 }
      i += 1
    }
    l2normalize(out)
    out
  }

  /** Cosine similarity of two (not necessarily normalized) vectors. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i)
      nb += b(i) * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Cosine similarity of two (not necessarily normalized) vectors. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Cosine distance as the reference uses it (abs of scipy cosine):
    * abs(1 - cos) (/root/reference/tests/er/test_transe.py:46-51). */
  def cosineDistance(a: Array[Float], b: Array[Float]): Double =
    math.abs(1.0 - cosine(a, b))

  /** Mean elementwise absolute difference — the reference's unweighted
    * "mean embedding" record distance: np.mean(abs(a + rel - b)) per
    * field (/root/reference/werl.py:345-349). */
  def l1Mean(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += math.abs(a(i).toDouble - b(i)); i += 1 }
    if (a.length == 0) 0.0 else s / a.length
  }
}
