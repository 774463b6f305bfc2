package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window passage chunking — the retrieval/embedding prep step
  * of a training-data pipeline (split long documents into fixed
  * token-budget windows with overlap, like HF tokenizers'
  * `return_overflowing_tokens` and every RAG chunker). NOTE on naming:
  * `stride` here is the STEP between window starts; HF tokenizers call
  * the overlap (`window - stride` here) the "stride" — invert when
  * porting HF parameters.
  *
  * Contract (whitespace tokens via [[TextOps.wsTokens]], the
  * [[TextOps.TokenCount]] convention): a document with `n` tokens yields
  * `numChunks = if (n <= window) 1 else ceil((n - window) / stride) + 1`
  * chunks; chunk `k` covers tokens `[k*stride, min(k*stride + window, n))`.
  * Every token is covered, consecutive chunks overlap by
  * `window - stride` tokens, and only the last chunk may be short — the
  * last start is always < `n`, so no empty chunk is ever emitted.
  * Empty / whitespace-only / NULL documents have no tokens and yield NO
  * chunks (they are filtered before the walk — without the filter the
  * `['']` convention `split` shares with [[TextOps.TokenCount]] would
  * emit one empty chunk with a claimed n_tok of 1).
  * All-integer arithmetic → bit-identical on any engine (the DuckDB
  * twin replays it verbatim).
  *
  * Scale shape: one codegen'd projection + explode over the generated
  * chunk indexes — NO shuffle, no UDF; fanout per row is
  * `ceil(n/stride)`, bounded by the document length. At 100 TB this is
  * a pure map over input splits; the output `orderBy` is presentation
  * only (Verify's hash compare is order-insensitive) and the only
  * exchange it introduces is the range sort, never a hash shuffle —
  * locked by PlanAuditSpec.
  *
  * Output: `(doc_id, chunk_id, start_tok, n_tok, chunk_text)` — one row
  * per chunk.
  */
object Chunker {

  /** Chunk `df(textCol)` into `window`-token pieces every `stride`
    * tokens. `stride <= window` guarantees full coverage; `stride <
    * window` gives `window - stride` tokens of overlap.
    */
  def run(df: DataFrame, window: Int, stride: Int,
          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = TextOps.wsTokens(col(textCol))
    // ceil((n - window) / stride) as floor division (dividend is
    // non-negative under the guard, and token counts are far inside
    // double's exact-integer range, so floor(a / b) IS a div b); the
    // `when` guards the n <= window case where the dividend is negative
    val n = col("n_doc")
    val lastK: Column = when(n <= window, lit(0))
      .otherwise(floor((n - window + (stride - 1)) / lit(stride)))
    // same normalize-then-trim as wsTokens: plain trim only strips
    // spaces and would let a tab-only document through as ['','']
    df.where(trim(regexp_replace(col(textCol), s"${TextOps.WsClass}+", " ")) =!= "")
      .select(col(idCol), toks.as("toks"), size(toks).as("n_doc"))
      .select(col(idCol), col("toks"), col("n_doc"),
        explode(sequence(lit(0), lastK.cast("int"))).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(window), col("n_doc") - col("chunk_id") * stride).as("n_tok"),
        array_join(
          slice(col("toks"), col("chunk_id") * stride + 1,
            least(lit(window), col("n_doc") - col("chunk_id") * stride)),
          " ").as("chunk_text"))
      .orderBy(idCol, "chunk_id")
  }

  /** DuckDB twin of [[run]] over `table(doc_id, text)` — the same
    * integer walk (`//` floors like Spark's `div` on the non-negative
    * operands the guard leaves), `generate_series` inclusive upper
    * bound = lastK, 1-based inclusive list slice = Spark's
    * `slice(toks, start+1, len)`.
    */
  def oracleSql(table: String, window: Int, stride: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(regexp_replace(text, '${TextOps.WsClass}+', ' ', 'g')), ' ') AS t,
       |    len(string_split(trim(regexp_replace(text, '${TextOps.WsClass}+', ' ', 'g')), ' ')) AS n
       |  FROM $table WHERE trim(regexp_replace(text, '${TextOps.WsClass}+', ' ', 'g')) <> ''),
       |ks AS (
       |  SELECT doc_id, t, n,
       |    unnest(generate_series(0,
       |      CASE WHEN n <= $window THEN 0
       |           ELSE (n - $window + ${stride - 1}) // $stride END)) AS k
       |  FROM toks)
       |SELECT doc_id, CAST(k AS INT) AS chunk_id,
       |  CAST(k * $stride AS INT) AS start_tok,
       |  CAST(least($window, n - k * $stride) AS INT) AS n_tok,
       |  array_to_string(
       |    t[k * $stride + 1 : k * $stride + least($window, n - k * $stride)],
       |    ' ') AS chunk_text
       |FROM ks ORDER BY doc_id, chunk_id""".stripMargin
}
