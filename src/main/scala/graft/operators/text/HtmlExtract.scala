package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-text extraction — the step every web-crawl pipeline
  * (C4, CCNet, RefinedWeb) runs before any text analysis: strip
  * markup, decode entities, and drop short boilerplate lines (nav,
  * titles, footers), keeping prose.
  *
  * Pipeline, one codegen'd projection (order matters and is mirrored
  * verbatim in the DuckDB twin):
  *
  *   1. comments / `<script>` / `<style>` blocks removed wholesale
  *      (their CONTENT is not text — `var x = 1 < 2` must not leak);
  *      RE2-compatible: dot-all non-greedy, no backreferences, so the
  *      same pattern runs on DuckDB
  *   2. block-level tags (`p`, `div`, `br`, `h1-6`, `li`, `tr`,
  *      `ul`/`ol`, `table`) become newlines — they are the line
  *      structure boilerplate filtering needs
  *   3. every remaining tag becomes a space (inline markup joins words)
  *   4. the five named entities + `&#39;`/`&nbsp;` decode via literal
  *      `replace` — `&amp;` LAST, so `&amp;lt;` decodes to the literal
  *      text `&lt;` the author wrote, not to `<`
  *   5. lines are trimmed, inner whitespace collapsed, and lines with
  *      fewer than `minLineWords` words dropped (the C4 short-line
  *      rule; nav/footer/title lines die here)
  *
  * Scale shape: pure per-row projection — no shuffle, no UDF, rides
  * WholeStageCodegen next to the scan like the rest of
  * [[TextOps]]. The output `orderBy` is presentation only.
  *
  * Output: `(doc_id, text, n_lines, n_chars)` — extracted prose, lines
  * kept, and its length.
  */
object HtmlExtract {

  /** Extracted main text of an HTML column. */
  def extract(html: Column, minLineWords: Int = 4): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript = regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val blocks = regexp_replace(noStyle,
      "(?i)</?(p|div|br|h[1-6]|li|tr|ul|ol|table)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    val lines = transform(split(decoded, "\n"),
      l => trim(regexp_replace(l, "\\s+", " ")))
    val kept = filter(lines,
      l => l =!= "" && size(split(l, " ")) >= minLineWords)
    array_join(kept, "\n")
  }

  def run(df: DataFrame, minLineWords: Int = 4,
          htmlCol: String = "html", idCol: String = "doc_id"): DataFrame = {
    val text = extract(col(htmlCol), minLineWords)
    df.select(col(idCol), text.as("text"))
      .withColumn("n_lines",
        when(col("text") === "", lit(0))
          .otherwise(size(split(col("text"), "\n"))))
      .withColumn("n_chars", length(col("text")))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[run]] over `table(doc_id, html)`. DuckDB's
    * `regexp_replace` is first-match-only without the `'g'` flag
    * (Spark's is always global), and `list_aggregate`'s `string_agg`
    * of an empty list is NULL where Spark's `array_join` is `''` —
    * both differences are papered over here, not in the operator.
    */
  def oracleSql(table: String, minLineWords: Int = 4): String =
    s"""WITH stripped AS (
       |  SELECT doc_id,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(html, '(?s)<!--.*?-->', '', 'g'),
       |            '(?is)<script[^>]*>.*?</script>', '', 'g'),
       |          '(?is)<style[^>]*>.*?</style>', '', 'g'),
       |        '(?i)</?(p|div|br|h[1-6]|li|tr|ul|ol|table)[^>]*>', chr(10), 'g'),
       |      '<[^>]*>', ' ', 'g') AS t
       |  FROM $table),
       |decoded AS (
       |  SELECT doc_id,
       |    replace(replace(replace(replace(replace(replace(t,
       |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
       |      '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
       |  FROM stripped),
       |joined AS (
       |  SELECT doc_id,
       |    coalesce(array_to_string(
       |      list_filter(
       |        list_transform(string_split(t, chr(10)),
       |          l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))),
       |        l -> l <> '' AND len(string_split(l, ' ')) >= $minLineWords),
       |      chr(10)), '') AS text
       |  FROM decoded)
       |SELECT doc_id, text,
       |  CASE WHEN text = '' THEN 0
       |       ELSE CAST(len(string_split(text, chr(10))) AS INTEGER) END AS n_lines,
       |  CAST(length(text) AS BIGINT) AS n_chars
       |FROM joined ORDER BY doc_id""".stripMargin
}
