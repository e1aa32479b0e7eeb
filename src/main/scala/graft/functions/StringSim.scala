package graft.functions

/**
 * Pure-Scala string-similarity kernels used both by the Catalyst
 * [[JaroWinkler]] expression (codegen calls these statics) and by the
 * batched `mapPartitions` pair scorer.
 *
 * Semantics mirror the reference's comparator set — Jaro-Winkler with
 * 0.85 match threshold and exact comparators
 * (/root/reference/data/census.py:140-168) — with the textbook
 * Jaro-Winkler definition (Winkler boost only when jaro > 0.7, prefix
 * capped at 4, scale 0.1), which is also what the DuckDB oracle's
 * `jaro_winkler_similarity` computes. Arithmetic order is pinned so
 * results are bit-identical to the oracle:
 * `(m/|a| + m/|b| + (m-t)/m) / 3` then `j + l*0.1*(1-j)`.
 */
object StringSim {

  /**
   * Per-thread reusable scratch: the kernels run millions of times per
   * task, and per-call allocation (two match arrays for Jaro, a
   * 128-row Peq table for Myers) costs ~5 KB of garbage per PAIR —
   * multi-GB/s of allocation at full scoring throughput, which turns
   * into GC/memory-bus pressure that is precisely the shared resource
   * that caps wide-executor scaling. mapPartitions tasks are
   * single-threaded, so ThreadLocal reuse is safe; the Peq table keeps
   * an all-zero invariant by re-zeroing exactly the slots each call
   * set (O(pattern) — never O(128 x blocks)).
   */
  private final class Scratch {
    var m1 = new Array[Boolean](256)
    var m2 = new Array[Boolean](256)
    var peq = new Array[Long](128 * 8) // flat [char * blocks + block], all-zero
    var vp = new Array[Long](8)
    var vn = new Array[Long](8)
    // Jaro fast-path char-position index over s2 (ASCII): `off` holds
    // per-char segment offsets (counting-sort layout), `ptr` the
    // per-char consumption cursor, `pos` the positions grouped by char.
    val off = new Array[Int](130)
    val ptr = new Array[Int](129)
    var pos = new Array[Int](256)
    def boolCap(n: Int): Unit = {
      if (m1.length < n) m1 = new Array[Boolean](math.max(n, m1.length * 2))
      if (m2.length < n) m2 = new Array[Boolean](math.max(n, m2.length * 2))
    }
    def posCap(n: Int): Unit = {
      if (pos.length < n) pos = new Array[Int](math.max(n, pos.length * 2))
    }
    def myersCap(bl: Int): Unit = {
      if (vp.length < bl) {
        vp = new Array[Long](math.max(bl, vp.length * 2))
        vn = new Array[Long](vp.length)
      }
      if (peq.length < 128 * bl) peq = new Array[Long](128 * math.max(bl, 8))
    }
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 128) return false
      i += 1
    }
    true
  }

  /**
   * Greedy Jaro matching via per-char position queues (ASCII fast
   * path): for each i, the first unmatched j in [i-window, i+window]
   * with s2(j)==s1(i) is exactly the head of char c's position queue
   * once positions below the window are discarded — the window's lower
   * bound is non-decreasing in i, so a discarded position can never
   * re-enter, and a consumed (matched) position is never rescanned.
   * O(len1+len2) instead of the textbook loop's O(len1*window); the
   * match SET is identical by construction (same greedy order), so
   * jaro results are bit-identical to [[matchWindowScan]] (fuzz-pinned
   * in StringSimSpec).
   */
  private def matchAscii(s1: String, s2: String, window: Int,
                         sc: Scratch): Int = {
    val len1 = s1.length
    val len2 = s2.length
    val off = sc.off
    val ptr = sc.ptr
    java.util.Arrays.fill(off, 0, 130, 0)
    sc.posCap(len2)
    val pos = sc.pos
    var j = 0
    while (j < len2) { off(s2.charAt(j) + 1) += 1; j += 1 }
    var c = 0
    while (c < 128) { off(c + 1) += off(c); c += 1 }
    System.arraycopy(off, 0, ptr, 0, 128)
    j = 0
    while (j < len2) {
      val ch = s2.charAt(j)
      pos(ptr(ch)) = j
      ptr(ch) += 1
      j += 1
    }
    System.arraycopy(off, 0, ptr, 0, 128)
    val m1 = sc.m1
    val m2 = sc.m2
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = i - window
      val hi = math.min(len2 - 1, i + window)
      val ch = s1.charAt(i)
      var p = ptr(ch)
      val end = off(ch + 1)
      while (p < end && pos(p) < lo) p += 1
      if (p < end && pos(p) <= hi) {
        m1(i) = true; m2(pos(p)) = true; matches += 1
        ptr(ch) = p + 1
      } else ptr(ch) = p
      i += 1
    }
    matches
  }

  /** Textbook windowed scan (reference semantics; non-ASCII fallback). */
  private def matchWindowScan(s1: String, s2: String, window: Int,
                              sc: Scratch): Int = {
    val len1 = s1.length
    val len2 = s2.length
    val m1 = sc.m1
    val m2 = sc.m2
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    matches
  }

  /** Jaro similarity in [0,1]. Any empty operand -> 0 (DuckDB semantics, incl. ('','') -> 0). */
  def jaro(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val sc = scratch.get()
    sc.boolCap(math.max(len1, len2))
    val m1 = sc.m1
    val m2 = sc.m2
    java.util.Arrays.fill(m1, 0, len1, false)
    java.util.Arrays.fill(m2, 0, len2, false)
    val matches =
      if (isAscii(s1) && isAscii(s2)) matchAscii(s1, s2, window, sc)
      else matchWindowScan(s1, s2, window, sc)
    if (matches == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    var i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val half = t / 2 // integer halving, as in the common bit-parallel impls
    (m / len1 + m / len2 + (m - half) / m) / 3.0
  }

  /** Jaro-Winkler similarity in [0,1]; boost threshold 0.7, prefix <= 4, scale 0.1. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /**
   * Exact Levenshtein edit distance: common prefix/suffix trimming
   * (near-duplicate hot path collapses to a few chars), then Myers'
   * bit-parallel algorithm (blocked Hyyro variant, ~64 DP cells per
   * word op) — exact, ~15x fewer ops than the two-row DP on the
   * ~200-char contents this engine scores.
   */
  def levenshtein(s1: String, s2: String): Int = {
    if (s1 == s2) return 0
    // trim common prefix / suffix (distance-preserving)
    var lo = 0
    val n1 = s1.length
    val n2 = s2.length
    val minLen = math.min(n1, n2)
    while (lo < minLen && s1.charAt(lo) == s2.charAt(lo)) lo += 1
    var hi = 0
    while (hi < minLen - lo && s1.charAt(n1 - 1 - hi) == s2.charAt(n2 - 1 - hi)) hi += 1
    val t1 = s1.substring(lo, n1 - hi)
    val t2 = s2.substring(lo, n2 - hi)
    val (a, b) = if (t1.length <= t2.length) (t1, t2) else (t2, t1)
    if (a.isEmpty) return b.length
    myers(a, b)
  }

  /** Myers/Hyyro bit-parallel edit distance; p is the (shorter)
    * pattern, t the text. Exact for any lengths (blocked). Uses the
    * thread-local flat Peq table (ASCII fast path; map fallback for
    * other chars) — zeroed back slot-exactly on exit, so the
    * between-calls all-zero invariant holds at any block count. */
  def myers(p: String, t: String): Int = {
    val m = p.length
    val n = t.length
    val bl = (m + 63) >>> 6
    val sc = scratch.get()
    sc.myersCap(bl)
    val peq = sc.peq // flat [c * bl + b], all-zero on entry
    var other: java.util.HashMap[Character, Array[Long]] = null
    var i = 0
    while (i < m) {
      val c = p.charAt(i)
      if (c < 128) peq(c * bl + (i >>> 6)) |= 1L << (i & 63)
      else {
        if (other == null) other = new java.util.HashMap()
        var a0 = other.get(c)
        if (a0 == null) { a0 = new Array[Long](bl); other.put(c, a0) }
        a0(i >>> 6) |= 1L << (i & 63)
      }
      i += 1
    }
    val vp = sc.vp
    val vn = sc.vn
    java.util.Arrays.fill(vp, 0, bl, -1L)
    java.util.Arrays.fill(vn, 0, bl, 0L)
    var score = m
    val lastMask = 1L << ((m - 1) & 63)
    val last = bl - 1
    var j = 0
    while (j < n) {
      val c = t.charAt(j)
      val peqOff = if (c < 128) c * bl else -1
      val peqOther =
        if (c >= 128 && other != null) other.get(c) else null
      var hin = 1
      var b = 0
      while (b < bl) {
        var eq =
          if (peqOff >= 0) peq(peqOff + b)
          else if (peqOther != null) peqOther(b)
          else 0L
        val pv = vp(b)
        val mv = vn(b)
        val xv = eq | mv
        if (hin < 0) eq |= 1L
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (b == last) {
          if ((ph & lastMask) != 0L) score += 1
          else if ((mh & lastMask) != 0L) score -= 1
        }
        val hout =
          if ((ph & Long.MinValue) != 0L) 1
          else if ((mh & Long.MinValue) != 0L) -1
          else 0
        ph <<= 1
        mh <<= 1
        if (hin > 0) ph |= 1L else if (hin < 0) mh |= 1L
        vp(b) = mh | ~(xv | ph)
        vn(b) = ph & xv
        hin = hout
        b += 1
      }
      j += 1
    }
    // restore the all-zero invariant: clear exactly the slots set above
    i = 0
    while (i < m) {
      val c = p.charAt(i)
      if (c < 128) peq(c * bl + (i >>> 6)) = 0L
      i += 1
    }
    score
  }

  /** Reference two-row DP (used to fuzz-validate [[myers]]). */
  def levenshteinDP(s1: String, s2: String): Int = {
    val (a, b) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (a.isEmpty) return b.length
    val prev = new Array[Int](a.length + 1)
    val cur = new Array[Int](a.length + 1)
    var i = 0
    while (i <= a.length) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= b.length) {
      cur(0) = j
      val cb = b.charAt(j - 1)
      i = 1
      while (i <= a.length) {
        val cost = if (a.charAt(i - 1) == cb) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, a.length + 1)
      j += 1
    }
    prev(a.length)
  }

  /** Levenshtein similarity: 1 - dist / max(len); both empty -> 1. */
  def levSim(s1: String, s2: String): Double = {
    val n = math.max(s1.length, s2.length)
    if (n == 0) 1.0 else 1.0 - levenshtein(s1, s2).toDouble / n
  }
}
