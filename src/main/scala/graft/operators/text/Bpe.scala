package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer over a corpus — the vocabulary-learning
  * step every LLM training pipeline runs before token counting or
  * sequence packing means anything (Sennrich et al. 2016; the
  * HuggingFace-tokenizers training shape). Spark-first decomposition:
  *
  *   1. [[wordCounts]] — the ONLY distributed pass the learner needs.
  *      One map-side-combined `groupBy(word)`: the shuffle is bounded by
  *      observed vocabulary, not corpus size — this is what makes BPE
  *      training tractable at 100 TB (HF tokenizers trains from exactly
  *      this word-frequency table single-node).
  *   2. [[learn]] — greedy merge learning, driver-local over the
  *      bounded top-`maxWords` frequency table (Zipf: the top 10⁵–10⁶
  *      words carry ~97%+ of token mass; tail words still ENCODE fine —
  *      the merges just aren't tuned to them). Deterministic: ties on
  *      pair count break to the lexicographically smallest pair.
  *   3. [[tokenStats]] — apply: merge ranks broadcast once, encoding is
  *      map-side `mapPartitions` with a per-partition word→length memo
  *      (Zipf again: the memo hit rate is the repeated-word mass), no
  *      shuffle at all.
  *
  * Word model: whitespace-split words, characters as initial symbols
  * with the classic `</w>` end-marker attached to the last character
  * (so merges can distinguish suffixes from infixes). [[encodeWord]]
  * repeatedly merges the lowest-rank adjacent pair, exactly the
  * greedy application order the learner's merge list defines.
  *
  * Not SQL-expressible (iterative data-dependent merges) → the
  * `text_bpe` query is rows-only; BpeSpec pins the semantics with a
  * hand-computed merge sequence, the detokenization roundtrip, and
  * token-count monotonicity in the number of merges.
  */
object Bpe {

  type Pair = (String, String)

  private val EndMark = "</w>"
  /** Per-partition memo bound — Zipf makes hits dominate far below it. */
  private val MemoCap = 262144

  /** Corpus word-frequency table: `(w, cnt)`, vocabulary-bounded.
    * Words are [[TextOps.wsTokens]] — the corpus-wide tokenizer
    * contract — with the `['']` empty-document convention filtered out.
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(filter(TextOps.wsTokens(col(textCol)), w => w =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: chars, `</w>` on the last. */
  private def symbols(w: String): Vector[String] = {
    val cs = w.map(_.toString).toVector
    cs.init :+ (cs.last + EndMark)
  }

  /** Merge every adjacent occurrence of `p` in `syms`, left to right. */
  private def mergePair(syms: Vector[String], p: Pair): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy merge learning over a word-frequency table. Returns the
    * merge list in rank order; stops early when no pair reaches
    * `minPairCount`.
    *
    * Incremental: pair counts and a pair→words index are built once;
    * each merge touches ONLY the words containing the merged pair
    * (remove their old adjacent-pair contributions, merge, re-add) —
    * the standard BPE-training shape, O(affected symbols) per merge
    * instead of a full corpus recount. Selection is by the total order
    * (count desc, pair asc), so hash-map iteration order never leaks
    * into the result.
    */
  def learn(wordFreq: Seq[(String, Long)], numMerges: Int,
            minPairCount: Long = 2L): Seq[Pair] = {
    val entries = wordFreq.collect { case (w, c) if w.nonEmpty => (symbols(w), c) }
    val words = entries.map(_._1).toArray
    val freq = entries.map(_._2).toArray
    val counts = mutable.HashMap.empty[Pair, Long]
    val index = mutable.HashMap.empty[Pair, mutable.Set[Int]]

    def eachPair(syms: Vector[String])(f: Pair => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) { f((syms(i), syms(i + 1))); i += 1 }
    }
    def add(i: Int): Unit = eachPair(words(i)) { p =>
      counts.updateWith(p)(v => Some(v.getOrElse(0L) + freq(i)))
      index.getOrElseUpdate(p, mutable.Set.empty) += i
    }
    def remove(i: Int): Unit = eachPair(words(i)) { p =>
      counts.updateWith(p) { v =>
        val n = v.getOrElse(0L) - freq(i)
        if (n <= 0) None else Some(n)
      }
      index.get(p).foreach { s => s -= i; if (s.isEmpty) index.remove(p) }
    }

    words.indices.foreach(add)
    val merges = mutable.ArrayBuffer.empty[Pair]
    var done = false
    while (merges.size < numMerges && !done) {
      val best = counts.foldLeft(Option.empty[(Pair, Long)]) {
        case (acc, (p, c)) =>
          if (acc.forall { case (bp, bc) =>
            c > bc || (c == bc && Ordering[Pair].lt(p, bp)) }) Some((p, c))
          else acc
      }
      best match {
        case Some((p, c)) if c >= minPairCount =>
          merges += p
          // snapshot: remove()/add() mutate the index sets under us
          index.get(p).map(_.toArray).getOrElse(Array.empty).foreach { i =>
            remove(i)
            words(i) = mergePair(words(i), p)
            add(i)
          }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** Distributed word counting + driver-local learning. `maxWords`
    * bounds the driver table via a distributed top-k by frequency
    * (deterministic `(cnt desc, w)` order).
    */
  def learnFromCorpus(df: DataFrame, numMerges: Int,
                      maxWords: Int = 200000, minPairCount: Long = 2L,
                      textCol: String = "text"): Seq[Pair] = {
    val wf = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learn(wf, numMerges, minPairCount)
  }

  /** Encode one word under the learned merge ranks: repeatedly apply
    * the lowest-rank adjacent pair until none applies.
    */
  def encodeWord(w: String, ranks: Map[Pair, Int]): Vector[String] = {
    if (w.isEmpty) return Vector.empty
    var syms = symbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var best: Pair = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** Map-side apply: `(doc_id, n_words, n_bpe_tokens)` per document.
    * No shuffle — the merge table is broadcast, encoding is
    * partition-local with a bounded word→length memo.
    */
  def tokenStats(df: DataFrame, merges: Seq[Pair],
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(col(idCol).cast("long"),
        filter(TextOps.wsTokens(col(textCol)), w => w =!= "").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Int]
        it.map { case (id, ws) =>
          var n = 0
          ws.foreach { w =>
            if (memo.size > MemoCap) memo.clear()
            n += memo.getOrElseUpdate(w, encodeWord(w, ranks).length)
          }
          (id, ws.length, n)
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
      .orderBy(idCol)
  }
}
