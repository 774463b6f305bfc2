package graft.operators.text

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled single-pass PII scanner — the execution kernel behind
  * [[TextOps.PiiScan]].
  *
  * WHY NOT A REGEX: the scan's semantics are one leftmost-partition
  * pass of [[TextOps.PiiScan.CombinedPattern]], and the DuckDB oracle
  * runs exactly that pattern through RE2's DFA. java.util.regex is a
  * backtracking NFA: on the 6-arm alternation it re-attempts the email
  * arm at every word character and re-scans each candidate span per
  * start position — measured 35 s (scan) / 72 s (redact) for 5 M
  * documents at sf100 where RE2 takes 5.5/9.7 s (BENCH_SF100.md round
  * 13). This kernel IS that combined regex, compiled by hand into
  * first-char-dispatched deterministic matchers with an email-run memo
  * (a local-part run not followed by `@` can host no email start, so
  * the scan skips it once instead of re-walking it per position) —
  * O(n) amortized, JIT-compiled char loops.
  *
  * EXACTNESS CONTRACT: for every input, [[scan]] must produce the same
  * spans and classes as scanning the text with
  * `CombinedPattern` under Java-regex/RE2 semantics (leftmost match;
  * first alternative wins at equal positions; greedy quantifiers with
  * backtracking inside an arm; non-overlapping continuation after each
  * match; ASCII `\b` — RE2's semantics; java.util.regex's `\b` is
  * Unicode-aware, so the contract sides with the oracle engine).
  * PiiKernelSpec pins this with a java.util.regex reference whose
  * patterns have every `\b` rewritten to an explicit ASCII-lookaround
  * boundary, over fixed fixtures AND randomized fuzz corpora that
  * include non-ASCII letters/digits — any divergence is a spec
  * failure, not a silent oracle drift. Per-arm notes on the
  * backtracking cases each matcher reproduces are inline below.
  */
object PiiKernel {

  // class ids, in CombinedPattern arm order
  final val Url = 0
  final val Email = 1
  final val Ipv6 = 2
  final val Ipv4 = 3
  final val Id = 4
  final val Phone = 5
  final val NumClasses = 6

  final case class Span(cls: Int, start: Int, end: Int)

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  // [A-Za-z0-9._%+-]
  @inline private def isLocal(c: Char): Boolean =
    isWord(c) && c != '_' || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  // [A-Za-z0-9.-]
  @inline private def isDomain(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'
  // [A-Za-z0-9./_%-]
  @inline private def isUrlChar(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '/' || c == '_' ||
      c == '%' || c == '-'
  @inline private def isSep3(c: Char): Boolean =
    c == '-' || c == '.' || c == ' '

  /** All PII spans of `t`, leftmost-partition, non-overlapping. */
  def scan(t: String): ArrayBuffer[Span] = {
    val out = ArrayBuffer.empty[Span]
    val n = t.length
    var i = 0
    // no email can START before this position (local-part run memo)
    var emailSkipUntil = 0
    while (i < n) {
      val c = t.charAt(i)
      val bBefore = i == 0 || !isWord(t.charAt(i - 1))
      var end = -1
      var cls = -1
      // arm 1: URL (no \b in the pattern — may start mid-word)
      if (c == 'h' && t.startsWith("http", i)) {
        end = matchUrl(t, i); if (end > 0) cls = Url
      }
      // arm 2: email
      if (cls < 0 && i >= emailSkipUntil && isLocal(c)) {
        val (e, skip) = matchEmail(t, i)
        if (e > 0) cls = Email
        end = e
        if (skip > emailSkipUntil) emailSkipUntil = skip
      }
      // arm 3: IPv6 — full form first, then the compressed arms, in
      // CombinedPattern's alternative order
      if (cls < 0 && ((bBefore && isHex(c)) || c == ':')) {
        end = matchIpv6(t, i, bBefore); if (end > 0) cls = Ipv6
      }
      // arm 4: IPv4
      if (cls < 0 && bBefore && isDigit(c)) {
        end = matchIpv4(t, i); if (end > 0) cls = Ipv4
      }
      // arm 5: SSN-shaped id
      if (cls < 0 && bBefore && isDigit(c)) {
        end = matchId(t, i); if (end > 0) cls = Id
      }
      // arm 6: phone (three first-char-disjoint sub-arms)
      if (cls < 0 && (c == '(' || c == '+' || (bBefore && isDigit(c)))) {
        end = matchPhone(t, i, bBefore); if (end > 0) cls = Phone
      }
      if (cls >= 0) {
        out += Span(cls, i, end)
        i = end
        if (emailSkipUntil < i) emailSkipUntil = i
      } else i += 1
    }
    out
  }

  @inline private def boundaryAfter(t: String, j: Int): Boolean =
    j >= t.length || !isWord(t.charAt(j))

  /** Maximal run end of `pred` chars from `i`. */
  @inline private def runEnd(t: String, i: Int, pred: Char => Boolean): Int = {
    var j = i
    while (j < t.length && pred(t.charAt(j))) j += 1
    j
  }

  /** `https?://[A-Za-z0-9./_%-]+` — `s?` is greedy but `://` must
    * follow either way, so the branch is deterministic.
    */
  private def matchUrl(t: String, i: Int): Int = {
    var j = i + 4
    if (j < t.length && t.charAt(j) == 's' && t.startsWith("://", j + 1)) j += 4
    else if (t.startsWith("://", j)) j += 3
    else return -1
    val e = runEnd(t, j, isUrlChar)
    if (e > j) e else -1
  }

  /** `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`.
    *
    * Returns (matchEnd | -1, skipUntil): `@` is not a local char, so
    * the greedy local run ends exactly before an `@` or the arm fails
    * for EVERY start inside the run — skipUntil memoizes that.
    * The domain reproduces Java's backtracking: the domain run is
    * maximal-first, giving back until a `.` with ≥2 letters after it
    * fits — i.e. the RIGHTMOST `.` inside the run whose following
    * letter-run is ≥2; `{2,}` then takes that whole letter run (which
    * may end before the domain run does: `a@b.co7` matches `a@b.co`).
    */
  private def matchEmail(t: String, i: Int): (Int, Int) = {
    val e = runEnd(t, i, isLocal)
    if (e >= t.length || t.charAt(e) != '@') return (-1, e)
    val a = e + 1
    val b = runEnd(t, a, isDomain)
    if (b == a) return (-1, e)
    var p = b - 1
    while (p > a) {
      if (t.charAt(p) == '.') {
        val le = runEnd(t, p + 1, isLetter)
        if (le - (p + 1) >= 2) return (le, e)
      }
      p -= 1
    }
    (-1, e)
  }

  /** A hex group `H{1,4}:`: the run is maximal (a shorter take leaves
    * a hex char where `:` is required), so group parsing is
    * deterministic — returns position after the `:`, or -1.
    */
  @inline private def hexGroup(t: String, i: Int): Int = {
    val e = runEnd(t, i, isHex)
    val r = e - i
    if (r >= 1 && r <= 4 && e < t.length && t.charAt(e) == ':') e + 1 else -1
  }

  /** Full-form and compressed IPv6, alternatives in pattern order:
    *  full `\b(H{1,4}:){7}H{1,4}\b`
    *  | inner `\b(H{1,4}:){1,7}(:H{1,4}){1,7}\b`
    *  | leading `::(H{1,4}:){0,6}H{1,4}\b`
    *  | trailing `\b(H{1,4}:){1,7}:`
    */
  private def matchIpv6(t: String, i: Int, bBefore: Boolean): Int = {
    if (bBefore && isHex(t.charAt(i))) {
      // full form
      var pos = i
      var g = 0
      var ok = true
      while (ok && g < 7) {
        val next = hexGroup(t, pos)
        if (next < 0) ok = false else { pos = next; g += 1 }
      }
      if (ok) {
        val e = runEnd(t, pos, isHex)
        val r = e - pos
        if (r >= 1 && r <= 4 && boundaryAfter(t, e)) return e
      }
      // inner `::`: k leading groups, then `:`, then m trailing
      // `:H{1,4}` groups. Since round 14 the pattern enumerates
      // `(?:H:){k}(?::H){1,7-k}` arms for k=1..6 (explicit groups ≤ 7,
      // the compressed-IPv6 shape; advice-r13). The arm is text-
      // determined: k is where the hex-group run stops (every other
      // arm meets a hex char where it needs `:`), so the greedy k-loop
      // IS the arm dispatch; k>6 means no inner arm matches. If `\b`
      // fails after the greedy m (a non-hex word char follows),
      // dropping the last group lands before its `:` — a boundary —
      // which is the one backtracking step the regex takes; m-1 must
      // stay ≥1.
      var pos2 = i
      var k = 0
      var more = true
      while (more) {
        val next = hexGroup(t, pos2)
        if (next < 0) more = false else { pos2 = next; k += 1 }
      }
      if (k >= 1 && k <= 6 && pos2 < t.length && t.charAt(pos2) == ':') {
        var m = 0
        var p = pos2
        var lastLen = 0
        val mMax = 7 - k
        while (m < mMax && p < t.length && t.charAt(p) == ':' && {
          val e = runEnd(t, p + 1, isHex); val r = e - (p + 1)
          r >= 1 && r <= 4
        }) {
          val e = runEnd(t, p + 1, isHex)
          lastLen = e - p
          p = e
          m += 1
        }
        if (m >= 1) {
          if (boundaryAfter(t, p)) return p
          else if (m >= 2) return p - lastLen // before the last group's ':'
        }
      }
      // trailing `::`
      var pos3 = i
      var k3 = 0
      var more3 = true
      while (more3) {
        val next = hexGroup(t, pos3)
        if (next < 0) more3 = false else { pos3 = next; k3 += 1 }
      }
      if (k3 >= 1 && k3 <= 7 && pos3 < t.length && t.charAt(pos3) == ':')
        return pos3 + 1
      -1
    } else if (t.charAt(i) == ':' && i + 1 < t.length && t.charAt(i + 1) == ':') {
      // leading `::(H{1,4}:){0,6}H{1,4}\b` — if the final H fails, the
      // greedy group loop gives back its last group whose hex run then
      // serves as the final H with `:` (a non-word char) after it.
      var pos = i + 2
      var g = 0
      var lastGroupStart = -1
      while (g < 6 && {
        val next = hexGroup(t, pos)
        if (next > 0) { lastGroupStart = pos; pos = next; g += 1; true }
        else false
      }) ()
      val e = runEnd(t, pos, isHex)
      val r = e - pos
      if (r >= 1 && r <= 4 && boundaryAfter(t, e)) e
      else if (g >= 1) runEnd(t, lastGroupStart, isHex) // drop last group
      else -1
    } else -1
  }

  /** `\b([0-9]{1,3}\.){3}[0-9]{1,3}\b` — groups are maximal-run
    * deterministic like [[hexGroup]].
    */
  private def matchIpv4(t: String, i: Int): Int = {
    var pos = i
    var g = 0
    while (g < 3) {
      val e = runEnd(t, pos, isDigit)
      val r = e - pos
      if (r < 1 || r > 3 || e >= t.length || t.charAt(e) != '.') return -1
      pos = e + 1
      g += 1
    }
    val e = runEnd(t, pos, isDigit)
    val r = e - pos
    if (r >= 1 && r <= 3 && boundaryAfter(t, e)) e else -1
  }

  /** `\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b` — fixed counts: take exactly k
    * digits and let the separator/boundary checks fail naturally
    * (faithful to `{k}`, which never backtracks).
    */
  private def matchId(t: String, i: Int): Int = {
    var j = takeDigits(t, i, 3); if (j < 0 || j >= t.length || t.charAt(j) != '-') return -1
    j = takeDigits(t, j + 1, 2); if (j < 0 || j >= t.length || t.charAt(j) != '-') return -1
    j = takeDigits(t, j + 1, 4); if (j < 0 || !boundaryAfter(t, j)) return -1
    j
  }

  /** Exactly `k` digits from `i`, or -1. */
  @inline private def takeDigits(t: String, i: Int, k: Int): Int = {
    var j = i
    val lim = i + k
    if (lim > t.length) return -1
    while (j < lim) { if (!isDigit(t.charAt(j))) return -1; j += 1 }
    j
  }

  /** The three phone sub-arms (first-char disjoint: `(`, `+`, digit).
    * Optional elements (`[-. ]?`, `\(?`, `\)?`) consume only non-digit
    * chars, so skipping vs taking them never re-aligns a digit group —
    * no backtracking case survives to reproduce.
    */
  private def matchPhone(t: String, i: Int, bBefore: Boolean): Int = {
    val c = t.charAt(i)
    if (c == '(') {
      // \([0-9]{3}\)[-. ]?[0-9]{3}[-. ][0-9]{4}\b
      var j = takeDigits(t, i + 1, 3)
      if (j < 0 || j >= t.length || t.charAt(j) != ')') return -1
      j += 1
      if (j < t.length && isSep3(t.charAt(j))) j += 1
      j = takeDigits(t, j, 3)
      if (j < 0 || j >= t.length || !isSep3(t.charAt(j))) return -1
      j = takeDigits(t, j + 1, 4)
      if (j < 0 || !boundaryAfter(t, j)) return -1
      j
    } else if (c == '+') {
      // \+[0-9]{1,2}[-. ]\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}\b
      // {1,2} greedy: try 2 digits then 1 (a sep must follow either way)
      var j = -1
      val two = takeDigits(t, i + 1, 2)
      if (two > 0 && two < t.length && isSep3(t.charAt(two))) j = two + 1
      else {
        val one = takeDigits(t, i + 1, 1)
        if (one > 0 && one < t.length && isSep3(t.charAt(one))) j = one + 1
        else return -1
      }
      if (j < t.length && t.charAt(j) == '(') j += 1
      j = takeDigits(t, j, 3)
      if (j < 0) return -1
      if (j < t.length && t.charAt(j) == ')') j += 1
      if (j < t.length && isSep3(t.charAt(j))) j += 1
      j = takeDigits(t, j, 3)
      if (j < 0 || j >= t.length || !isSep3(t.charAt(j))) return -1
      j = takeDigits(t, j + 1, 4)
      if (j < 0 || !boundaryAfter(t, j)) return -1
      j
    } else if (bBefore && isDigit(c)) {
      // \b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b  (separators - or . only)
      var j = takeDigits(t, i, 3)
      if (j < 0 || j >= t.length ||
        (t.charAt(j) != '-' && t.charAt(j) != '.')) return -1
      j = takeDigits(t, j + 1, 3)
      if (j < 0 || j >= t.length ||
        (t.charAt(j) != '-' && t.charAt(j) != '.')) return -1
      j = takeDigits(t, j + 1, 4)
      if (j < 0 || !boundaryAfter(t, j)) return -1
      j
    } else -1
  }

  /** Per-class span counts, [[TextOps.PiiScan]] column order:
    * emails, urls, phones, ipv4, ipv6, ids.
    */
  def counts(t: String): Array[Int] = {
    val c = new Array[Int](NumClasses)
    scan(t).foreach(s => c(s.cls) += 1)
    c
  }

  /** Text with every span replaced by its class token. */
  def redact(t: String, tokens: Array[String]): String = {
    val spans = scan(t)
    if (spans.isEmpty) return t
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    spans.foreach { s =>
      sb.append(t, last, s.start).append(tokens(s.cls))
      last = s.end
    }
    sb.append(t, last, t.length)
    sb.toString
  }
}
