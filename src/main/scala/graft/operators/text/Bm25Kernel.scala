package graft.operators.text

/** Hand-rolled BM25 scoring kernel — the execution path behind
  * [[KeywordSearch.bm25]] (round 14, same adopted-kernel rationale as
  * [[PiiKernel]]/[[HtmlKernel]]/[[TextStatsKernel]]: the Catalyst form
  * tokenizes every document into an array column, explodes it, and
  * shuffles every query-term hit through a groupBy — measured 25.7 s
  * for 5 M documents at sf100 where DuckDB takes ~15 s, the tokenize +
  * explode + per-hit exchange being the bulk. The query term set is
  * tiny and known up front, so per-document term frequencies are a
  * row-local fact: one char-level pass per document computes dl and
  * tf(t, D) for every query term with NO explode and NO shuffle —
  * corpus statistics (N, avgdl, df) reduce to one bounded
  * per-partition partial row each).
  *
  * EXACTNESS CONTRACT: [[KeywordSearch.bm25]] (kernelized) must produce
  * rows IDENTICAL to [[KeywordSearch.exprBm25]], the retained Catalyst
  * reference that stays the single source of semantics and the DuckDB
  * oracle's mirror. Divergence sources and why each is closed:
  *
  *  - tokenization: maximal runs of non-[[TextOps.WsChars]] chars over
  *    `lower(text)` — the [[TextOps.wsTokens]] contract, lowercased
  *    through [[TextStatsKernel.catalystLower]] (ICU, Catalyst's
  *    `lower`). The `'' → ['']` empty-token convention affects dl only
  *    (an empty token can never equal a query term — the query parser
  *    drops empties).
  *  - avgdl: Catalyst `avg` over an int column sums in DOUBLE, but
  *    integer-valued doubles add exactly below 2^53, so the kernel's
  *    long-sum ÷ long-count is bit-equal at any realistic corpus size.
  *  - idf/contrib arithmetic: same operand order and type promotions
  *    as the expression tree (see inline notes at each formula).
  *  - per-(query, doc) contribution sum: Catalyst's aggregation order
  *    is partition-dependent; the kernel sums in fixed term order.
  *    Both sides round to 4 dp (`Spark round`, HALF_UP) before ranking
  *    — the same guard the cross-engine oracle contract already relies
  *    on for exactly this reason (KeywordSearch scaladoc).
  *
  * Bm25KernelSpec fuzz-compares kernel vs expression outputs on
  * randomized corpora (non-ASCII case pairs, U+000B, empty and null
  * documents included).
  */
object Bm25Kernel {

  /** Compiled query-term matcher: terms grouped by length so a token
    * run resolves to a candidate list with one array index (most
    * tokens match no term length and cost O(1)). Term lists are tiny
    * (a search query), so candidate scans are a few char compares.
    */
  final class TermSet(val terms: Array[String]) extends Serializable {
    private val maxLen: Int = if (terms.isEmpty) 0 else terms.map(_.length).max
    private val byLen: Array[Array[Int]] = {
      val b = Array.fill(maxLen + 1)(List.empty[Int])
      for (i <- terms.indices) b(terms(i).length) ::= i
      b.map(_.reverse.toArray)
    }

    /** Index of the term equal to `s[start, end)`, or -1. */
    def matchToken(s: String, start: Int, end: Int): Int = {
      val len = end - start
      if (len > maxLen || len == 0) return -1
      val cands = byLen(len)
      var c = 0
      while (c < cands.length) {
        val t = terms(cands(c))
        var i = 0
        while (i < len && t.charAt(i) == s.charAt(start + i)) i += 1
        if (i == len) return cands(c)
        c += 1
      }
      -1
    }
  }

  /** One pass over `lowered`: fills `tf` (zeroed first) with per-term
    * frequencies and returns dl — the [[TextOps.wsTokens]] token count
    * (empty/ws-only document = ONE empty token, which matches nothing).
    */
  def docScan(lowered: String, ts: TermSet, tf: Array[Int]): Int = {
    java.util.Arrays.fill(tf, 0)
    var dl = 0
    var i = 0
    val n = lowered.length
    while (i < n) {
      if (!TextStatsKernel.isWs(lowered.charAt(i))) {
        val start = i
        while (i < n && !TextStatsKernel.isWs(lowered.charAt(i))) i += 1
        dl += 1
        val idx = ts.matchToken(lowered, start, i)
        if (idx >= 0) tf(idx) += 1
      } else i += 1
    }
    if (dl == 0) 1 else dl
  }

  /** Per-partition corpus partials: (docs, docs with non-null text,
    * Σ dl, per-term document frequency). One row per partition — the
    * driver reduces a bounded `partitions × terms` matrix, the same
    * bounded-scalar class as KeyFinder's witnesses.
    */
  final case class Partial(nDocs: Long, nNonNull: Long, sumDl: Long,
                           df: Array[Long])

  def partitionStats(it: Iterator[(Long, String)], ts: TermSet): Iterator[Partial] = {
    val tf = new Array[Int](ts.terms.length)
    val df = new Array[Long](ts.terms.length)
    var nDocs = 0L
    var nNonNull = 0L
    var sumDl = 0L
    while (it.hasNext) {
      val (_, text) = it.next()
      nDocs += 1
      if (text != null) {
        nNonNull += 1
        sumDl += docScan(TextStatsKernel.catalystLower(text), ts, tf)
        var t = 0
        while (t < df.length) { if (tf(t) > 0) df(t) += 1; t += 1 }
      }
    }
    Iterator.single(Partial(nDocs, nNonNull, sumDl, df))
  }

  /** Scoring pass: (query_id, doc_id, score_raw) for every (query, doc)
    * where at least one of the query's terms occurs — exactly the rows
    * the expression form's tf→join→groupBy produces. `idf` is indexed
    * like `ts.terms`; `queryTerms` maps query_id → its distinct term
    * indices in parse order (the fixed summation order).
    */
  def scorePartition(it: Iterator[(Long, String)], ts: TermSet,
                     idf: Array[Double], avgdl: Double,
                     queryTerms: Array[(Int, Array[Int])],
                     k1: Double, b: Double): Iterator[(Int, Long, Double)] = {
    val tf = new Array[Int](ts.terms.length)
    it.flatMap { case (docId, text) =>
      if (text == null) Iterator.empty
      else {
        val dl = docScan(TextStatsKernel.catalystLower(text), ts, tf)
        queryTerms.iterator.flatMap { case (qid, tidx) =>
          var score = 0.0
          var hit = false
          var j = 0
          while (j < tidx.length) {
            val t = tidx(j)
            val f = tf(t)
            if (f > 0) {
              hit = true
              // expression order: idf * (tf * (k1+1)) / (tf + k1*((1-b) + b*dl/avgdl))
              score += idf(t) * (f.toDouble * (k1 + 1)) /
                (f.toDouble + k1 * ((1 - b) + b * dl.toDouble / avgdl))
            }
            j += 1
          }
          if (hit) Iterator.single((qid, docId, score)) else Iterator.empty
        }
      }
    }
  }

  /** idf(t) with the expression tree's exact promotion order:
    * `(n_docs - df)` in LONG, then `+ 0.5` promotes to double; the
    * denominator promotes `df` the same way; `log(1.0 + ratio)`.
    */
  def idfOf(nDocs: Long, df: Long): Double =
    math.log(1.0 + ((nDocs - df) + 0.5) / (df + 0.5))
}
