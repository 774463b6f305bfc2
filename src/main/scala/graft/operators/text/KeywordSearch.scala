package graft.operators.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword search over a document corpus (Robertson/Sparck Jones
  * probabilistic ranking, the Okapi BM25 form used by Lucene/ES and by
  * training-data curation pipelines for query-targeted subset mining).
  * For query q and document D:
  *
  *   score(q, D) = Σ_{t ∈ q} idf(t) · tf(t,D)·(k1+1) /
  *                             (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  *   idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *
  * Tokens are [[TextOps.wsTokens]] of `lower(text)` — the corpus-wide
  * tokenizer contract, so |D| here equals [[TextOps.TokenCount]]'s
  * `ws_tokens` for the same document; avgdl is the corpus mean.
  *
  * Scale shape (the part that matters at 100 TB): the query term set
  * is tiny and known up front, so tf(t, D) is a ROW-LOCAL fact —
  * [[bm25]] executes through [[Bm25Kernel]] (round 14): one char-level
  * pass per document computes dl and every query-term frequency with
  * no tokenize-array, no explode and no per-hit shuffle; corpus
  * statistics (N, avgdl, df per term) reduce to one bounded partial
  * row per partition (collected like any scalar agg — `partitions ×
  * |terms|` longs), and the scoring pass emits one row per (query,
  * matching doc) straight into the top-k window. Two O(n) scans total,
  * zero exchanges before the final window.
  * The final top-k is a rank window per query — Spark executes the
  * `rank <= k` filter as a WindowGroupLimit partial limit per input
  * partition, so only ~k·partitions rows reach the single-query-key
  * shuffle.
  *
  * [[exprBm25]] is the RETAINED CATALYST REFERENCE (the round-13
  * production form): tokenize → `explode_outer` → `isin` filter →
  * groupBy. It stays the single source of semantics — the DuckDB
  * oracle mirrors it and Bm25KernelSpec fuzz-pins [[bm25]] against it
  * — and documents two measured traps of the declarative form (the
  * InferFiltersFromGenerate re-tokenization and the rejected
  * containment gate, see inline comments).
  *
  * Determinism across engines: a BM25 score is a sum of per-term
  * doubles and aggregation order differs between Spark and DuckDB, so
  * ranking over the raw double could flip exact-real-value ties whose
  * float results differ in the last bit. The rank therefore orders by
  * `round(score, 4)` with `doc_id` as the unique tie-break — identical
  * on both engines (unlike [[graft.operators.similarity.Similarity]]'s
  * cosine, which is a deterministic left-to-right fold on both sides
  * and can rank the raw value).
  *
  * Output: `(query_id, doc_id, score, rank)`, `rank <= k` per query.
  */
object KeywordSearch {

  /** Parse queries to (query_id, term) pairs — distinct terms per
    * query, parse order preserved (the kernel's fixed summation order).
    */
  private def parseQueries(queries: Seq[(Int, String)]): Seq[(Int, String)] =
    queries.flatMap { case (qid, text) =>
      TextStatsKernel.catalystLower(text).trim.split(TextOps.WsClass + "+").filter(_.nonEmpty).distinct.map(qid -> _)
    }

  /** Shared ranking tail: round to 4 dp (the cross-engine guard), rank
    * per query with the doc_id tie-break, cut at k.
    */
  private def rankTail(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("score", round(col("score_raw"), 4))
      .withColumn("rank", rank().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Production path — executed by [[Bm25Kernel]] (see class doc for
    * the scale shape and the exactness contract vs [[exprBm25]]).
    */
  def bm25(docs: DataFrame, queries: Seq[(Int, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    TextOps.requireIntegralId(docs, idCol, "KeywordSearch.bm25")
    val pairs = parseQueries(queries)
    val terms = pairs.map(_._2).distinct.toArray
    val termIdx = terms.zipWithIndex.toMap
    val ts = new Bm25Kernel.TermSet(terms)
    val base = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]

    // pass 1: corpus statistics — one bounded partial row per
    // partition (nDocs counts ALL rows like count(lit(1)); avg(dl)
    // ignores null text like Catalyst avg ignores null dl)
    val partials = base.mapPartitions(it =>
      Bm25Kernel.partitionStats(it, ts)).collect()
    val nDocs = partials.map(_.nDocs).sum
    val nNonNull = partials.map(_.nNonNull).sum
    val sumDl = partials.map(_.sumDl).sum
    val avgdl = sumDl.toDouble / nNonNull.toDouble // NaN on empty corpus, like avg()=null
    val df = new Array[Long](terms.length)
    partials.foreach(p => (0 until terms.length).foreach(t => df(t) += p.df(t)))
    val idf = Array.tabulate(terms.length)(t => Bm25Kernel.idfOf(nDocs, df(t)))
    val queryTerms = pairs.groupBy(_._1).view
      .mapValues(_.map(p => termIdx(p._2)).toArray).toArray.sortBy(_._1)

    // pass 2: row-local scoring — no shuffle until the top-k window.
    // doc_id is cast back to the input column's type so the kernel and
    // Catalyst paths share one output schema (advice-r14: an int/short
    // id frame would otherwise come back LongType here but
    // original-typed from exprBm25, breaking the pinned equality)
    val scored = base.mapPartitions(it =>
      Bm25Kernel.scorePartition(it, ts, idf, avgdl, queryTerms, k1, b))
      .toDF("query_id", "doc_id", "score_raw")
      .withColumn("doc_id", col("doc_id").cast(docs.schema(idCol).dataType))
    rankTail(scored, k)
  }

  /** Retained Catalyst reference (see class doc). */
  private[graft] def exprBm25(docs: DataFrame, queries: Seq[(Int, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = parseQueries(queries)
    val qterms = pairs.toDF("query_id", "term")
    val allTerms = pairs.map(_._2).distinct

    // row-local doc length; the corpus scalar rides one 1-row crossJoin
    val withDl = docs.select(col(idCol).as("doc_id"),
      lower(col(textCol)).as("lt"))
      .withColumn("t", TextOps.wsTokens(col("lt")))
      .withColumn("dl", size(col("t")))
    // n_docs/avgdl are CORPUS statistics — computed over every document
    // (prefiltering here would change every score)
    val stats = withDl.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // only query-term occurrences survive the explode — the aggregate
    // below is sized by query-term hits, not the corpus vocabulary.
    // explode_outer, NOT explode (round-13): plain explode makes
    // InferFiltersFromGenerate add `size(t) > 0 AND isnotnull(t)`,
    // and predicate pushdown inlines the whole tokenize INTO those
    // conjuncts below the projection — every document then tokenizes
    // up to three times on this branch. wsTokens is never null and
    // never empty (`'' → ['']`), so outer ≡ inner here (a null term
    // row would be dropped by the isin anyway) and the inferred
    // filters simply disappear, leaving ONE tokenize per document.
    // (A `contains`-any-term candidate gate before the tokenize was
    // measured-and-REJECTED at sf100: 99.9% of this corpus contains
    // some query term, so the gate pruned nothing and its pushed-down
    // conjuncts re-triggered the inferred-filter inlining — 25.7 s →
    // 177 s. See BENCH_SF100.md round 13.)
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode_outer(col("t")).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(stats)
      .select(col("term"), col("n_docs"), col("avgdl"),
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"))

    val scored = tf
      .join(broadcast(idf), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id").agg(sum(col("contrib")).as("score_raw"))
    rankTail(scored, k)
  }

  /** Convenience for the CLI: one ad-hoc query string. */
  def search(docs: DataFrame, query: String, k: Int,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bm25(docs, Seq(0 -> query), k, textCol = textCol, idCol = idCol)
      .drop("query_id")

  /** DuckDB twin. Query strings must be single-quote-free. */
  def oracleSql(table: String, queries: Seq[(Int, String)], k: Int,
                k1: Double = 1.2, b: Double = 0.75): String = {
    val qvalues = queries.flatMap { case (qid, text) =>
      TextStatsKernel.catalystLower(text).trim.split(TextOps.WsClass + "+").filter(_.nonEmpty).distinct
        .map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH qterms(query_id, term) AS (VALUES $qvalues),
       |docs AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '${TextOps.WsClass}+', ' ', 'g')), ' ') AS t,
       |         len(string_split(trim(regexp_replace(lower(text), '${TextOps.WsClass}+', ' ', 'g')), ' ')) AS dl
       |  FROM $table),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(t) AS term FROM docs)
       |  WHERE term IN (SELECT DISTINCT term FROM qterms)
       |  GROUP BY doc_id, dl, term),
       |idf AS (
       |  SELECT term, ln(1 + (n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf,
       |         min(avgdl) AS avgdl
       |  FROM tf, stats GROUP BY term, n_docs),
       |scored AS (
       |  SELECT q.query_id, f.doc_id,
       |    round(sum(i.idf * (f.tf * ($k1 + 1)) /
       |              (f.tf + $k1 * ((1 - $b) + $b * f.dl / i.avgdl))), 4) AS score
       |  FROM tf f JOIN idf i USING (term) JOIN qterms q USING (term)
       |  GROUP BY q.query_id, f.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |    CAST(rank() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, doc_id, score, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
