package graft.operators.text

/** Hand-rolled HTML→text extraction kernel — the execution engine
  * behind [[HtmlExtract.run]], reproducing [[HtmlExtract.extract]]'s
  * regex-pass pipeline pass for pass (same adopted-kernel rationale as
  * [[PiiKernel]]: the 15 `(?is)` java-regex traversals measured 1.48×
  * the RE2 oracle at sf100; these are all simple literal/charclass
  * scans a hand loop does in O(n) each).
  *
  * EXACTNESS CONTRACT: for every input, [[extract]] must equal
  * evaluating the Catalyst [[HtmlExtract.extract]] column (which the
  * DuckDB oracle mirrors) — including the deliberate quirks: comments
  * and tag blocks without a terminator survive, `<heading>` is not a
  * `<head>`, a raw U+0001 in the input is DELETED by the numeric-
  * entity split machinery and a raw U+0002 can hijack a preceding
  * valid-code prefix, `&#38;amp;` double-decodes — and the ASCII-only
  * case fold: Java `(?i)` without UNICODE_CASE folds `A-Z` only, so
  * `<ſcript>`/`<tıtle>` are NOT tag matches (advice-r13; the DuckDB
  * oracle's RE2 `(?i)` folds Unicode, an engine-parity boundary that
  * never bites the all-ASCII-tag corpus). HtmlKernelSpec fuzz
  * compares kernel output against the Catalyst expression on
  * randomized tag soup including non-ASCII case-pair chars —
  * divergence is a spec failure.
  */
object HtmlKernel {

  private val WsSet = " \t\n\u000B\f\r"
  @inline private def isWs(c: Char): Boolean = WsSet.indexOf(c.toInt) >= 0
  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** ASCII-only case fold — `A-Z` → `a-z`, nothing else. The Catalyst
    * reference's `(?i)`/`(?is)` java-regex flags fold ASCII only (no
    * UNICODE_CASE), so `<ſcript>`/`tıtle` are NOT tag matches there;
    * String.regionMatches(ignoreCase=true) does full Unicode folding
    * and would treat them as tags (advice-r13). Tag names are ASCII,
    * so the ASCII fold is also the only semantically sane one.
    */
  @inline private def foldAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  @inline private def regionEqIc(t: String, i: Int, lit: String): Boolean = {
    if (i < 0 || i + lit.length > t.length) return false
    var k = 0
    while (k < lit.length) {
      if (foldAscii(t.charAt(i + k)) != foldAscii(lit.charAt(k))) return false
      k += 1
    }
    true
  }

  /** `(?s)<!--.*?-->` → "" — unterminated comments survive. */
  private def stripComments(t: String): String = {
    var p = t.indexOf("<!--")
    if (p < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    while (p >= 0) {
      val e = t.indexOf("-->", p + 4)
      if (e < 0) { p = -1 } // no terminator anywhere: keep the rest
      else {
        sb.append(t, last, p)
        last = e + 3
        p = t.indexOf("<!--", last)
      }
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  /** `(?is)<name[^>]*>.*?</name>` → "" (script/style: the open tag
    * name is a PREFIX match — `<scriptfoo bar>` opens a script block,
    * exactly like the regex).
    */
  private def stripTagBlock(t: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name + ">"
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    var i = 0
    val n = t.length
    while (i >= 0 && i < n) {
      i = indexOfIc(t, open, i)
      if (i >= 0) {
        val g = t.indexOf('>', i + open.length)
        if (g < 0) i = -1 // no '>' anywhere after: no match can ever close
        else {
          val c = indexOfIc(t, close, g + 1)
          // no close tag at/after g+1 ⇒ none for ANY later open either
          // (a later open's close search starts later, a subset range),
          // so stop — this also makes the pass O(n): the round-13
          // `i += 1` rescan cost O(k·n) on k unclosed opens
          if (c < 0) i = -1
          else {
            sb.append(t, last, i)
            last = c + close.length
            i = last
          }
        }
      }
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  /** Case-insensitive indexOf. */
  private def indexOfIc(t: String, lit: String, from: Int): Int = {
    var i = math.max(from, 0)
    val lim = t.length - lit.length
    while (i <= lim) {
      if (regionEqIc(t, i, lit)) return i
      i += 1
    }
    -1
  }

  /** `(?is)<name(ws[^>]*)?>.*?</name ws*>` → "" (head/title: the open
    * tag name is ANCHORED — `<heading>` does not open a head block).
    */
  private def stripAnchoredBlock(t: String, name: String): String = {
    val open = "<" + name
    val closePrefix = "</" + name
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    var i = 0
    val n = t.length
    while (i >= 0 && i < n) {
      i = indexOfIc(t, open, i)
      if (i >= 0) {
        val j = i + open.length
        val openEnd =
          if (j < n && t.charAt(j) == '>') j + 1
          else if (j < n && isWs(t.charAt(j))) {
            val g = t.indexOf('>', j + 1)
            if (g < 0) -2 else g + 1 // -2: no '>' ever again
          } else -1 // not an open tag here (e.g. <heading>)
        if (openEnd == -2) i = -1
        else if (openEnd == -1) i += 1
        else {
          // first close-pattern occurrence (.*? is non-greedy)
          var q = openEnd
          var closeEnd = -1
          while (closeEnd < 0 && q >= 0) {
            q = indexOfIc(t, closePrefix, q)
            if (q >= 0) {
              var k = q + closePrefix.length
              while (k < n && isWs(t.charAt(k))) k += 1
              if (k < n && t.charAt(k) == '>') closeEnd = k + 1
              else q += 1
            }
          }
          // same O(n) stop as stripTagBlock: a close pattern absent
          // at/after openEnd is absent for every later open too
          if (closeEnd < 0) i = -1
          else {
            sb.append(t, last, i)
            last = closeEnd
            i = last
          }
        }
      }
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  // block-tag names in BlockTagPattern's alternation order (pairwise
  // non-prefix, so at most one can match at a position)
  private val BlockNames = Array(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "ul", "ol", "table")

  /** `(?i)</?(p|div|br|h[1-6]|li|tr|ul|ol|table)(ws[^>]*)?/?>` → `\n`. */
  private def replaceBlockTags(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    var i = 0
    val n = t.length
    while (i < n) {
      if (t.charAt(i) == '<') {
        var j = i + 1
        if (j < n && t.charAt(j) == '/') j += 1
        var end = -1
        var a = 0
        while (end < 0 && a < BlockNames.length) {
          val name = BlockNames(a)
          if (regionEqIc(t, j, name)) {
            val k = j + name.length
            if (k < n && t.charAt(k) == '>') end = k + 1
            else if (k + 1 < n && t.charAt(k) == '/' && t.charAt(k + 1) == '>')
              end = k + 2
            else if (k < n && isWs(t.charAt(k))) {
              // ws then [^>]* then (an optional '/' is eaten by [^>]*) '>'
              val g = t.indexOf('>', k + 1)
              if (g >= 0) end = g + 1
            }
          }
          a += 1
        }
        if (end > 0) {
          sb.append(t, last, i).append('\n')
          last = end
          i = end
        } else i += 1
      } else i += 1
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  /** `<[A-Za-z/!?][^>]*>` → " " (every remaining tag-like span). */
  private def stripInlineTags(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    var i = 0
    val n = t.length
    while (i < n) {
      val c = t.charAt(i)
      if (c == '<' && i + 1 < n && {
        val d = t.charAt(i + 1)
        (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z') ||
          d == '/' || d == '!' || d == '?'
      }) {
        val g = t.indexOf('>', i + 2)
        if (g < 0) i = n // no '>' ever again: no further tag can match
        else {
          sb.append(t, last, i).append(' ')
          last = g + 1
          i = last
        }
      } else i += 1
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  /** The two numeric-entity mark passes of
    * [[HtmlExtract.decodeNumericEntities]]: `&#xHH;`/`&#XHH;` (1-2 hex
    * digits) first, then `&#DDD;` (1-3 digits), each becoming
    * `\u0001<code>\u0002` with hex codes normalized to a lowercase
    * `x` prefix.
    */
  private def markNumericEntities(t: String): String = {
    // pass 1: hex forms
    val p1 = markPass(t, hex = true)
    // pass 2: decimal forms (over pass 1's output, like the regex chain)
    markPass(p1, hex = false)
  }

  private def markPass(t: String, hex: Boolean): String = {
    var p = t.indexOf("&#")
    if (p < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var last = 0
    val n = t.length
    while (p >= 0) {
      var end = -1
      var code: String = null
      if (hex) {
        val q = p + 2
        if (q < n && (t.charAt(q) == 'x' || t.charAt(q) == 'X')) {
          var e = q + 1
          while (e < n && isHexDigit(t.charAt(e))) e += 1
          val r = e - (q + 1)
          // {1,2} greedy + ';': only the full run can be followed by
          // ';' (a shorter take ends on a hex digit)
          if (r >= 1 && r <= 2 && e < n && t.charAt(e) == ';') {
            code = "x" + t.substring(q + 1, e)
            end = e + 1
          }
        }
      } else {
        val q = p + 2
        var e = q
        while (e < n && isDigit(t.charAt(e))) e += 1
        val r = e - q
        if (r >= 1 && r <= 3 && e < n && t.charAt(e) == ';') {
          code = t.substring(q, e)
          end = e + 1
        }
      }
      if (end > 0) {
        sb.append(t, last, p).append('\u0001').append(code).append('\u0002')
        last = end
        p = t.indexOf("&#", end)
      } else p = t.indexOf("&#", p + 1)
    }
    sb.append(t, last, t.length)
    sb.toString
  }

  /** The split/transform/join leg of decodeNumericEntities — including
    * its raw-sentinel quirks (split deletes every U+0001; a raw U+0002
    * makes whatever precedes it in the segment the "code", decoded
    * only if it passes the valid-code guard).
    */
  private def decodeMarked(t: String): String = {
    if (t.indexOf('\u0001') < 0 && t.indexOf('\u0002') < 0) return t
    val segs = t.split("\u0001", -1)
    val sb = new java.lang.StringBuilder(t.length)
    segs.foreach { seg =>
      val si = seg.indexOf('\u0002')
      if (si < 0) sb.append(seg)
      else {
        val code = seg.substring(0, si)
        if (!validCode(code)) sb.append(seg)
        else {
          val v =
            if (code.charAt(0) == 'x') Integer.parseInt(code.substring(1), 16)
            else code.toInt
          if (v >= 1 && v <= 255) sb.append(v.toChar)
          else sb.append("&#").append(code).append(';')
          sb.append(seg, si + 1, seg.length)
        }
      }
    }
    sb.toString
  }

  /** `^(x[0-9A-Fa-f]{1,2}|[0-9]{1,3})$` */
  private def validCode(code: String): Boolean =
    if (code.isEmpty) false
    else if (code.charAt(0) == 'x') {
      val len = code.length - 1
      len >= 1 && len <= 2 && (1 until code.length).forall(i => isHexDigit(code.charAt(i)))
    } else
      code.length >= 1 && code.length <= 3 && code.forall(isDigit)

  /** Per-line whitespace collapse + trim + short-line drop + rejoin. */
  private def filterLines(t: String, minLineWords: Int): String = {
    val out = new java.lang.StringBuilder(t.length)
    var first = true
    t.split("\n", -1).foreach { line =>
      // collapse WsClass runs to single spaces
      val col = new java.lang.StringBuilder(line.length)
      var i = 0
      val n = line.length
      while (i < n) {
        val c = line.charAt(i)
        if (isWs(c)) {
          while (i < n && isWs(line.charAt(i))) i += 1
          col.append(' ')
        } else { col.append(c); i += 1 }
      }
      // trim spaces (post-collapse the only whitespace IS the space)
      var s = 0
      var e = col.length
      while (s < e && col.charAt(s) == ' ') s += 1
      while (e > s && col.charAt(e - 1) == ' ') e -= 1
      if (e > s) {
        // words = single-space-separated tokens = spaces + 1
        var spaces = 0
        var k = s
        while (k < e) { if (col.charAt(k) == ' ') spaces += 1; k += 1 }
        if (spaces + 1 >= minLineWords) {
          if (!first) out.append('\n')
          out.append(col, s, e)
          first = false
        }
      }
    }
    out.toString
  }

  /** The full pipeline — the kernel twin of [[HtmlExtract.extract]]. */
  def extract(html: String, minLineWords: Int): String = {
    var t = stripComments(html)
    t = stripTagBlock(t, "script")
    t = stripTagBlock(t, "style")
    t = stripAnchoredBlock(t, "head")
    t = stripAnchoredBlock(t, "title")
    t = replaceBlockTags(t)
    t = stripInlineTags(t)
    t = t.replace("&nbsp;", " ").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"")
    t = decodeMarked(markNumericEntities(t))
    t = t.replace("&amp;", "&")
    filterLines(t, minLineWords)
  }
}
