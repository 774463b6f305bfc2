package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity filter" quality signal (Wenzek et al. 2020 train a 5-gram
  * KenLM on Wikipedia and keep low-perplexity web documents; the same
  * pipeline shape works with any n-gram order). The model here is
  * trained on the corpus itself in the same job: bigram and
  * first-token counts with Laplace (add-1) smoothing,
  *
  *   p(w2 | w1) = (c(w1,w2) + 1) / (c1(w1) + V)
  *
  * where `c1(w1)` counts bigram occurrences starting with `w1` and `V`
  * is the corpus vocabulary size, so the distribution sums to exactly 1
  * over the vocabulary. Per-document score = mean cross-entropy over
  * its bigrams (nats) and the derived perplexity `exp(xent)`.
  *
  * Two paths, same math (the [[LineDedup]] pattern):
  *
  *   - [[run]] — exact, oracle-checkable: bigrams are built row-locally
  *     (no self-join), model keys are the token strings. The shuffles
  *     carry exploded token text; right for audits and modest corpora.
  *   - [[runHashed]] — the 100 TB path: document text NEVER shuffles.
  *     Bigrams become 8-byte `xxhash64` keys in the same row-local
  *     projection (`xxhash64(w1, w2)` for the pair, `xxhash64(w1)` for
  *     the first token), counts and joins run over hashes only, and the
  *     final aggregate is keyed by doc id. Counts are identical to the
  *     exact path unless xxhash64 collides (P ≈ V²/2⁶⁴ — negligible
  *     below ~10⁹ distinct tokens), so both paths register against ONE
  *     oracle and the driver's hash compare proves the scale path too.
  *
  * Scale notes: bigram/first counts are map-side combined and bounded
  * by observed-vocabulary size, not corpus size; the model-side joins
  * are left to AQE (vocabulary tables are small relative to the
  * exploded bigram stream, so it broadcasts them when measured small
  * and shuffles otherwise — both sides of those joins are bounded by
  * vocab², never O(corpus·text)).
  *
  * Determinism caveat (shared by every rounded-double oracle in this
  * repo): `avg` over a document's per-bigram log terms is a
  * non-associative double sum whose accumulation order differs between
  * the exact plan, the hashed plan, and DuckDB. Each ln term is
  * identical across engines (same integer counts), so plans disagree
  * only by ~1 ulp × n_bigrams ≈ 1e-13 relative — `round(·, 3)` flips
  * only when a score lands within that distance of a rounding
  * boundary, P ≈ 1e-10 per document. Accepted, not prevented: a
  * fixed-order sum would force a per-document sort that the score
  * semantics don't need.
  *
  * Output, one row per input document:
  * `(doc_id, n_bigrams, xent_nats, ppl)` — documents with fewer than
  * two tokens carry `n_bigrams = 0` and null scores.
  */
object Perplexity {

  /** [[TextOps.wsTokens]] (the corpus-wide tokenizer contract) with the
    * empty-document `['']` convention dropped.
    */
  private def toks(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      filter(TextOps.wsTokens(col(textCol)), w => w =!= "").as("ws"))

  /** Row-local bigram explode; extra = per-bigram key columns. */
  private def bigrams(t: DataFrame, idCol: String): DataFrame =
    t.where(size(col("ws")) >= 2)
      .select(col(idCol),
        explode(expr(
          "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))"
        )).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Model counts come from `modelBi`; scored rows from `targetBi`. A
    * target bigram/first-token unseen in the model contributes its
    * smoothed mass ((0+1)/(0+V) in the worst case) via the left joins.
    */
  private def score(target: DataFrame, targetBi: DataFrame, modelBi: DataFrame,
                    vocab: DataFrame, pairKey: Seq[String], firstKey: String,
                    idCol: String): DataFrame = {
    // c1 is DERIVED from cb (round 18, guide §1.2/§2.4 — remove a full
    // pass): c1(w1) = Σ_w2 cb(w1, w2) exactly (both count model bigram
    // rows by first token, in integers), so the model corpus is scanned
    // + tokenized + exploded once for both model tables — ReuseExchange
    // dedups cb's identical partial-agg exchange across the two
    // consumers — and the replacement aggregate runs over the DISTINCT
    // bigrams (vocab²-bounded), never the corpus stream. The cb group
    // key carries firstKey (a function of the pair key in both paths:
    // w1 ⊂ (w1,w2); h1 = hash of hb's first component), which for the
    // hashed path also makes the join strictly more collision-robust
    // than the old hb-only key: an hb collision between bigrams with
    // different first tokens no longer merges their counts.
    val cbKeys = (firstKey +: pairKey).distinct
    val cb = modelBi.groupBy(cbKeys.map(col): _*).agg(count(lit(1)).as("cb"))
    val c1 = cb.groupBy(firstKey).agg(sum("cb").as("c1"))
    val scored = targetBi
      .join(cb, cbKeys, "left").join(c1, Seq(firstKey), "left").crossJoin(vocab)
      .groupBy(idCol).agg(
        count(lit(1)).as("nb"),
        avg(log(coalesce(col("c1"), lit(0L)) + col("v")) -
          log(coalesce(col("cb"), lit(0L)) + 1)).as("xent"))
    target.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        round(col("xent"), 3).as("xent_nats"),
        round(exp(col("xent")), 2).as("ppl"))
      .orderBy(idCol)
  }

  /** Exact path, self-trained: model corpus = scored corpus. */
  def run(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    runCross(df, df, textCol, idCol)

  /** Exact path, CCNet shape: train the bigram model on `model` (e.g.
    * a clean reference corpus), score every `target` document against
    * it. Token strings are the model keys — the oracle twin.
    *
    * The model subtree feeds three consumers (cb, c1, vocab — all
    * different grouping keys), so the corpus is scanned and exploded
    * once per consumer. Checkpointing the tokenized/bigram frames to
    * share one pass was MEASURED AND REJECTED at sf100: the
    * checkpointed blocks of a corpus-scale exploded frame (~250 M
    * bigram rows) are pinned storage the unified memory manager cannot
    * evict, and the model-count hash aggregates then die with
    * AGGREGATE_OUT_OF_MEMORY — while the recompute-from-parquet plan
    * runs the whole query in 29 s. Re-scanning columnar parquet is the
    * cheap, memory-safe side of that trade at every scale.
    */
  def runCross(model: DataFrame, target: DataFrame,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val mt = toks(model, textCol, idCol)
    val modelBi = bigrams(mt, idCol)
    val targetBi =
      if (target eq model) modelBi else bigrams(toks(target, textCol, idCol), idCol)
    val vocab = mt.select(explode(col("ws")).as("w")).agg(countDistinct("w").as("v"))
    score(target, targetBi, modelBi, vocab, Seq("w1", "w2"), "w1", idCol)
  }

  /** Scale path, self-trained. See class doc. */
  def runHashed(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    runCrossHashed(df, df, textCol, idCol)

  /** Scale path, CCNet shape: 8-byte hashes shuffle, text does not.
    * Same recompute-over-checkpoint trade as [[runCross]].
    */
  def runCrossHashed(model: DataFrame, target: DataFrame,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val mt = toks(model, textCol, idCol)
    def hashed(t: DataFrame) = bigrams(t, idCol)
      .select(col(idCol), xxhash64(col("w1"), col("w2")).as("hb"),
        xxhash64(col("w1")).as("h1"))
    val modelBi = hashed(mt)
    val targetBi =
      if (target eq model) modelBi else hashed(toks(target, textCol, idCol))
    val vocab = mt.select(explode(col("ws")).as("w"))
      .agg(countDistinct(xxhash64(col("w"))).as("v"))
    score(target, targetBi, modelBi, vocab, Seq("hb"), "h1", idCol)
  }

  /** DuckDB twin of [[run]] (and, by exact agreement, [[runHashed]]). */
  def oracleSql(table: String): String = crossOracleSql(table, table)

  /** DuckDB twin of [[runCross]] / [[runCrossHashed]]: model counts
    * from `modelTable`, scored rows from `targetTable` (either may be a
    * parenthesized subquery). Unseen bigrams take their smoothed mass
    * through the LEFT JOINs, exactly like the Spark side.
    */
  def crossOracleSql(modelTable: String, targetTable: String): String =
    s"""WITH mtoks AS (
       |  SELECT doc_id, list_filter(string_split(trim(regexp_replace(text, '${TextOps.WsClass}+', ' ', 'g')), ' '), x -> x <> '') AS ws
       |  FROM $modelTable),
       |ttoks AS (
       |  SELECT doc_id, list_filter(string_split(trim(regexp_replace(text, '${TextOps.WsClass}+', ' ', 'g')), ' '), x -> x <> '') AS ws
       |  FROM $targetTable),
       |mbi AS (
       |  SELECT doc_id,
       |    unnest(list_slice(ws, 1, len(ws) - 1)) AS w1,
       |    unnest(list_slice(ws, 2, len(ws))) AS w2
       |  FROM mtoks WHERE len(ws) >= 2),
       |tbi AS (
       |  SELECT doc_id,
       |    unnest(list_slice(ws, 1, len(ws) - 1)) AS w1,
       |    unnest(list_slice(ws, 2, len(ws))) AS w2
       |  FROM ttoks WHERE len(ws) >= 2),
       |cb AS (SELECT w1, w2, count(*) AS cb FROM mbi GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM mbi GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT unnest(ws) AS w FROM mtoks)),
       |scored AS (
       |  SELECT b.doc_id, count(*) AS nb,
       |    avg(ln(coalesce(c1.c1, 0) + v.v) - ln(coalesce(cb.cb, 0) + 1)) AS xent
       |  FROM tbi b
       |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
       |  LEFT JOIN c1 ON b.w1 = c1.w1
       |  CROSS JOIN v
       |  GROUP BY b.doc_id)
       |SELECT d.doc_id,
       |  coalesce(s.nb, 0) AS n_bigrams,
       |  round(s.xent, 3) AS xent_nats,
       |  round(exp(s.xent), 2) AS ppl
       |FROM (SELECT doc_id FROM $targetTable) d
       |LEFT JOIN scored s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
