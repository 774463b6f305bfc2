package graft.operators.text

/** Rolling-hash execution kernel behind [[SpanDedup.runHashed]]
  * (round 14 — rationale and exactness contract in that scaladoc).
  *
  * Tokenization contract: [[SpanDedup]]'s SINGLE-SPACE split (Catalyst
  * `split(text, ' ')` ≡ DuckDB `string_split(text, ' ')`) — adjacent
  * spaces yield empty tokens, a trailing space yields a trailing empty
  * token, and `"" → [""]`. [[tokenBounds]] reproduces it exactly:
  * n_spaces + 1 tokens, boundaries at every space.
  */
object SpanDedupKernel {

  /** (start, end) character bounds of each single-space token. */
  private def tokenBounds(text: String): Array[Int] = {
    // flattened pairs: bounds(2k) = start, bounds(2k+1) = end
    var count = 1
    var i = 0
    val n = text.length
    while (i < n) { if (text.charAt(i) == ' ') count += 1; i += 1 }
    val out = new Array[Int](2 * count)
    var tok = 0
    var start = 0
    i = 0
    while (i < n) {
      if (text.charAt(i) == ' ') {
        out(2 * tok) = start; out(2 * tok + 1) = i
        tok += 1; start = i + 1
      }
      i += 1
    }
    out(2 * tok) = start; out(2 * tok + 1) = n
    out
  }

  /** FNV-1a/splitmix over a char range — the per-token hash. Hashing
    * UTF-16 code units directly (not UTF-8 bytes) is fine: only
    * equality of window hashes matters, and equal token text ⇒ equal
    * code units.
    */
  private def tokenHash(text: String, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      val c = text.charAt(i).toInt
      h ^= (c & 0xFF).toLong
      h *= 0x100000001B3L
      h ^= ((c >> 8) & 0xFF).toLong
      h *= 0x100000001B3L
      i += 1
    }
    graft.functions.Hash64.mix(h)
  }

  /** Odd multiplier for the window polynomial (golden-ratio constant —
    * odd, so multiplication is a bijection mod 2⁶⁴).
    */
  private val B = 0x9E3779B97F4A7C15L

  /** All w-token window hashes of `text`, in window order (empty when
    * the document has fewer than w tokens). H(i) = Σⱼ h(tokᵢ₊ⱼ)·B^(w-1-j)
    * rolled across the document: one token-hash each, O(tokens) total.
    */
  def windowHashes(text: String, w: Int): Array[Long] = {
    val bounds = tokenBounds(text)
    val nTok = bounds.length / 2
    if (nTok < w) return Array.emptyLongArray
    val th = new Array[Long](nTok)
    var t = 0
    while (t < nTok) { th(t) = tokenHash(text, bounds(2 * t), bounds(2 * t + 1)); t += 1 }
    // B^(w-1) for the roll-out term
    var bPow = 1L
    var p = 0
    while (p < w - 1) { bPow *= B; p += 1 }
    val out = new Array[Long](nTok - w + 1)
    var h = 0L
    var j = 0
    while (j < w) { h = h * B + th(j); j += 1 }
    out(0) = h
    var i = 1
    while (i <= nTok - w) {
      h = (h - th(i - 1) * bPow) * B + th(i + w - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Rebuild after removal: drop every token covered by any window
    * start in `rm` (each covers [start, start+w)), join the rest with
    * single spaces. Returns (text_clean, n_tokens, n_removed) — the
    * exact [[SpanDedup.run]] output triple. Boolean cover mask ⇒
    * O(tokens + rm·w) bounded by O(tokens + covered).
    */
  def rebuild(text: String, w: Int, rm: Seq[Int]): (String, Int, Int) = {
    val bounds = tokenBounds(text)
    val nTok = bounds.length / 2
    if (rm.isEmpty) return (text, nTok, 0)
    val covered = new Array[Boolean](nTok)
    var nRemoved = 0
    rm.foreach { s =>
      var i = s
      val end = math.min(s + w, nTok)
      while (i < end) {
        if (!covered(i)) { covered(i) = true; nRemoved += 1 }
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder(text.length)
    var t = 0
    var first = true
    while (t < nTok) {
      if (!covered(t)) {
        if (!first) sb.append(' ')
        sb.append(text, bounds(2 * t), bounds(2 * t + 1))
        first = false
      }
      t += 1
    }
    (sb.toString, nTok, nRemoved)
  }
}
