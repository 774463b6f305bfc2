package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication — the RefinedWeb/CCNet boilerplate
  * rule: a line that appears verbatim `minCount`-or-more times across
  * the corpus (nav bars, cookie banners, license headers, "click here
  * to subscribe") is removed from EVERY document it appears in. Blank
  * lines are structural, never counted and never removed. Distinct from
  * [[TextOps.Repetition]] (within-document signals) and the document-
  * level dedup family (`operators.dedup`): the unit of removal here is
  * the line, and the frequency evidence is corpus-wide.
  *
  * Two paths, same rule:
  *
  *   - [[run]] — exact, oracle-checkable: explode to (doc, pos, line),
  *     count line frequency (map-side combine collapses boilerplate
  *     before the shuffle), left-anti against the hot set, rebuild each
  *     document in line order. The two heavy shuffles carry exploded
  *     line text; right for audits and modest corpora.
  *   - [[runHashed]] — the 100 TB path: document text NEVER shuffles.
  *     Frequency is counted over `xxhash64(line)` (8-byte keys, map-side
  *     combined), the inner join back carries only (doc, pos, hash)
  *     triples, the per-document removal set is an array of positions
  *     (boilerplate hits only), and the rebuild is a row-local
  *     index-aware `filter` over the re-split original text. The only
  *     shuffle that touches full rows is the final doc-keyed join, and
  *     AQE broadcasts the (small) removal side when it can. Collision
  *     risk: a false removal needs xxhash64(line) to equal a hot line's
  *     hash — P ≈ nLines·nHot/2⁶⁴, negligible below ~10¹² distinct
  *     lines; LineDedupSpec asserts exact agreement with [[run]].
  *
  * Output (one row per input document, stable under either path):
  * `(doc_id, text_clean, n_lines, n_removed)`.
  */
object LineDedup {

  /** Exact path: line strings are the count/join keys. */
  def run(df: DataFrame, minCount: Int = 2,
          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val hot = lines
      .where(trim(col("line")) =!= "")
      .groupBy("line").count()
      .where(col("count") >= minCount)
      .select("line")
    // blank lines are absent from `hot` by construction, so the plain
    // anti-join keeps them
    // same join hardening as SpanDedup.run (round-14): the rebuilt-text
    // aggregate must never ride a size-guessed broadcast
    val kept = lines.join(hot.hint("shuffle_hash"), Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")),
        "\n").as("text_clean"),
      count(lit(1)).as("n_kept"))
    df.select(col(idCol), size(split(col(textCol), "\n")).as("n_lines"))
      .join(rebuilt.hint("shuffle_merge"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
          .cast("int").as("n_removed"))
      .orderBy(idCol)
  }

  /** Scale path: hashes shuffle, text does not. See class doc. */
  def runHashed(df: DataFrame, minCount: Int = 2,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // (doc, pos, hash) triples — the line string is dropped before any
    // shuffle; blanks are excluded here (never counted, never removed)
    val lineHashes = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .where(trim(col("line")) =!= "")
      .select(col(idCol), col("pos"), xxhash64(col("line")).as("lh"))
    val hot = lineHashes.groupBy("lh").count()
      .where(col("count") >= minCount).select("lh")
    // inner join: output is boilerplate HITS only, the fraction being
    // removed — everything downstream is sized by it, not the corpus
    val removed = lineHashes.join(hot.hint("shuffle_hash"), Seq("lh"))
      .groupBy(idCol).agg(collect_set(col("pos")).as("rm"))
    df.select(col(idCol), col(textCol))
      .join(removed.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(split(col(textCol), "\n"),
            (l, i) => col("rm").isNull || !array_contains(col("rm"), i)),
          "\n").as("text_clean"),
        size(split(col(textCol), "\n")).as("n_lines"),
        coalesce(size(col("rm")), lit(0)).as("n_removed"))
      .orderBy(idCol)
  }

  def oracleSql(table: String, minCount: Int = 2): String =
    s"""WITH lines AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0, len(string_split(text, chr(10))) - 1)) AS pos,
       |    unnest(string_split(text, chr(10))) AS line
       |  FROM $table),
       |hot AS (
       |  SELECT line FROM lines WHERE trim(line) <> ''
       |  GROUP BY line HAVING count(*) >= $minCount),
       |kept AS (
       |  SELECT doc_id, pos, line FROM lines
       |  WHERE line NOT IN (SELECT line FROM hot)),
       |rebuilt AS (
       |  SELECT doc_id,
       |    string_agg(line, chr(10) ORDER BY pos) AS text_clean,
       |    count(*) AS n_kept
       |  FROM kept GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(r.text_clean, '') AS text_clean,
       |  CAST(len(string_split(d.text, chr(10))) AS INTEGER) AS n_lines,
       |  CAST(len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0)
       |       AS INTEGER) AS n_removed
       |FROM $table d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
