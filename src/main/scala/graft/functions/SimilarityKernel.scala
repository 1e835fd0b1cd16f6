package graft.functions

/**
 * String-similarity kernels used by the matching operators.
 *
 * Semantics mirror the reference engine's fuzzy scorer
 * (reference: src/transform/entity_match.py:473-491 — RapidFuzz
 * `token_sort_ratio / 100`, with a token-Jaccard fallback): the ratio is the
 * normalized *InDel* similarity (insertions/deletions only, substitutions
 * cost 2) of the two strings after whitespace-tokenizing and sorting the
 * tokens. `sim = 1 - dist_indel / (len1 + len2)`.
 *
 * The InDel distance is computed with Myers' bit-parallel LCS algorithm
 * (Hyyrö 2004 variant) — O(ceil(n/64) * m) — with a 64-bit fast path for the
 * common case (company names are short). All methods are static, null-safe
 * at the call site (wrapped via StaticInvoke with propagateNull), and
 * deterministic, so they stay inside whole-stage codegen.
 */
object SimilarityKernel extends Serializable {

  /** InDel (LCS) distance: substitutions forbidden, ins/del cost 1 each. */
  def indelDistance(s1: String, s2: String): Int = {
    val (a, b) = if (s1.length <= s2.length) (s2, s1) else (s1, s2)
    // a is the longer string; bit-vector is built over the shorter one when
    // it fits a single 64-bit word.
    if (b.isEmpty) return a.length
    val lcs =
      if (b.length <= 64) lcsBitParallel64(a, b)
      else lcsDp(a, b)
    a.length + b.length - 2 * lcs
  }

  /** Normalized InDel similarity in [0,1]: 1 - dist/(len1+len2). */
  def indelSimilarity(s1: String, s2: String): Double = {
    val total = s1.length + s2.length
    if (total == 0) return 1.0
    1.0 - indelDistance(s1, s2).toDouble / total
  }

  /** Whitespace-tokenize, sort tokens, rejoin with single spaces. */
  def tokenSort(s: String): String = {
    val toks = s.split("\\s+").filter(_.nonEmpty)
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    toks.mkString(" ")
  }

  /**
   * RapidFuzz-style token_sort_ratio scaled to [0,1]
   * (reference: src/transform/entity_match.py:479). Empty/blank input → 0.0
   * (reference returns 0.0 for falsy names, entity_match.py:224-225).
   */
  def tokenSortRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val t1 = tokenSort(s1)
    val t2 = tokenSort(s2)
    if (t1.isEmpty || t2.isEmpty) return 0.0
    indelSimilarity(t1, t2)
  }

  /** Token-set Jaccard similarity on lowercase whitespace tokens
    * (reference: src/transform/entity_match.py:236-250). */
  def jaccardTokens(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val set1 = s1.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val set2 = s2.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val union = set1.union(set2).size
    if (union == 0) 0.0 else set1.intersect(set2).size.toDouble / union
  }

  /** RapidFuzz `ratio` equivalent (no token sort), scaled to [0,1]
    * (reference: src/transform/feature_engineering.py fuzz.ratio). */
  def ratio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null || s1.isEmpty || s2.isEmpty) return 0.0
    indelSimilarity(s1, s2)
  }

  /** RapidFuzz `token_set_ratio` equivalent, scaled to [0,1]: compares
    * sorted-intersection against each sorted-diff-augmented side and takes
    * the max (reference: feature_engineering.py token_set feature). */
  def tokenSetRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    tokenSetFromSets(s1.split("\\s+").filter(_.nonEmpty).toSet,
      s2.split("\\s+").filter(_.nonEmpty).toSet)
  }

  /**
   * All four name-similarity ratios in one pass —
   * [ratio, token_sort_ratio, token_set_ratio, partial_ratio] — sharing
   * the whitespace tokenization the individual kernels each redo.
   * Value-identical to calling the four kernels separately (asserted in
   * SimilarityKernelSpec); exists because the feature projection
   * evaluates all four per candidate pair.
   */
  def nameRatios(s1: String, s2: String): Array[Double] = {
    if (s1 == null || s2 == null) return Array(0.0, 0.0, 0.0, 0.0)
    val fuzzy = if (s1.isEmpty || s2.isEmpty) 0.0 else indelSimilarity(s1, s2)
    val t1 = s1.split("\\s+").filter(_.nonEmpty)
    val t2 = s2.split("\\s+").filter(_.nonEmpty)
    val sorted1 = { val a = t1.clone()
      java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]]); a.mkString(" ") }
    val sorted2 = { val a = t2.clone()
      java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]]); a.mkString(" ") }
    val tokenSort = if (sorted1.isEmpty || sorted2.isEmpty) 0.0
      else indelSimilarity(sorted1, sorted2)
    val tokenSet = tokenSetFromSets(t1.toSet, t2.toSet)
    val partial = partialRatio(s1, s2)
    Array(fuzzy, tokenSort, tokenSet, partial)
  }

  private def tokenSetFromSets(t1: Set[String], t2: Set[String]): Double = {
    if (t1.isEmpty || t2.isEmpty) return 0.0
    val inter = (t1 intersect t2).toArray.sorted.mkString(" ")
    val d1 = (t1 diff t2).toArray.sorted.mkString(" ")
    val d2 = (t2 diff t1).toArray.sorted.mkString(" ")
    val s1c = if (d1.isEmpty) inter else if (inter.isEmpty) d1 else s"$inter $d1"
    val s2c = if (d2.isEmpty) inter else if (inter.isEmpty) d2 else s"$inter $d2"
    if (inter.nonEmpty && (d1.isEmpty || d2.isEmpty)) return 1.0
    math.max(
      indelSimilarity(inter, s1c) max indelSimilarity(inter, s2c),
      indelSimilarity(s1c, s2c))
  }

  /** RapidFuzz `partial_ratio` approximation, scaled to [0,1]: best InDel
    * similarity of the shorter string against any equal-length substring
    * window of the longer (exact for the common short-name case). */
  def partialRatio(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null || s1.isEmpty || s2.isEmpty) return 0.0
    val (shorter, longer) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (shorter.length == longer.length) return indelSimilarity(shorter, longer)
    val m = shorter.length
    if (m > 64) {
      // rare long-name fallback: per-window DP
      var best = 0.0
      var i = 0
      val n = longer.length - m
      while (i <= n && best < 1.0) {
        val sim = indelSimilarity(shorter, longer.substring(i, i + m))
        if (sim > best) best = sim
        i += 1
      }
      return best
    }
    // Bit-parallel fast path: the pattern (shorter) is constant across
    // windows, so its match-mask table is built ONCE; each window is
    // scanned in place (no substring allocation, no per-window HashMap).
    val masks = new java.util.HashMap[Character, java.lang.Long](m * 2)
    var p = 0
    while (p < m) {
      val c = Character.valueOf(shorter.charAt(p))
      val prev = masks.get(c)
      masks.put(c, java.lang.Long.valueOf(
        (if (prev == null) 0L else prev.longValue()) | (1L << p)))
      p += 1
    }
    val full = if (m == 64) -1L else (1L << m) - 1
    var bestLcs = 0
    var i = 0
    val n = longer.length - m
    while (i <= n && bestLcs < m) {
      var s = full
      var j = i
      val end = i + m
      while (j < end) {
        val mk = masks.get(Character.valueOf(longer.charAt(j)))
        if (mk != null) {
          val u = s & mk.longValue()
          s = (s + u) | (s - u)
        }
        j += 1
      }
      val lcs = m - java.lang.Long.bitCount(s & full)
      if (lcs > bestLcs) bestLcs = lcs
      i += 1
    }
    // max over windows of indelSimilarity, computed from the best LCS
    // (monotone); same float expression as indelSimilarity for bit parity
    1.0 - (2 * (m - bestLcs)).toDouble / (2 * m)
  }

  // ---------------------------------------------------------------- internals

  /** LCS length via bit-parallel algorithm; pattern `b` must be <= 64 chars. */
  private def lcsBitParallel64(a: String, b: String): Int = {
    // Build match bitmasks for the pattern (shorter string).
    val masks = new java.util.HashMap[Character, java.lang.Long](b.length * 2)
    var i = 0
    while (i < b.length) {
      val c = Character.valueOf(b.charAt(i))
      val prev = masks.get(c)
      masks.put(c, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) | (1L << i)))
      i += 1
    }
    var s = if (b.length == 64) -1L else (1L << b.length) - 1
    var j = 0
    while (j < a.length) {
      val m = masks.get(Character.valueOf(a.charAt(j)))
      val matches = if (m == null) 0L else m.longValue()
      val u = s & matches
      s = (s + u) | (s - u)
      j += 1
    }
    // LCS = number of zero bits in s within the pattern window.
    b.length - java.lang.Long.bitCount(s & (if (b.length == 64) -1L else (1L << b.length) - 1))
  }

  /** Row-DP LCS fallback for patterns longer than 64 chars (rare for
    * company names; O(n*m) with two int rows). */
  private def lcsDp(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      val ac = a.charAt(i)
      var j = 0
      while (j < b.length) {
        cur(j + 1) =
          if (ac == b.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, b.length + 1)
      i += 1
    }
    prev(b.length)
  }
}
