package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Self-contained tabbed HTML report — the reference's primary
  * human-facing artifact (reference: dbqt/tools/utils.py:462-660
  * `HTMLReport.add_tab`/`add_polars_tab`/`save`, emitted by dbstats /
  * colcompare / nullcheck). Same shape here: one file, one tab per
  * result table, rendered with Tabulator (CDN-linked, as the reference
  * links it), numeric columns get numeric sorters/filters, NaN becomes
  * null. Divergence: export is Tabulator's built-in per-tab CSV
  * download rather than a bundled spreadsheet library — one less CDN
  * script for the same "take the data with you" job.
  *
  * Reports are human-facing and SMALL by contract — a tab collects at
  * most `maxRows` rows to the driver and says so in the tab name when
  * it truncates. The 100 TB result set goes to parquet (`--out` default
  * path); this is the last-mile rendering of an already-aggregated
  * report, never a data sink.
  */
final class HtmlReport(title: String = "Report", maxRows: Int = 10000) {

  private case class Tab(name: String, colsJson: String, dataJson: String)
  private val tabs = scala.collection.mutable.ArrayBuffer.empty[Tab]

  /** HTML element/text escaping — for title, headings, tab labels.
    * Distinct from [[esc]]: JSON escaping (`<`, `\"`) renders as
    * literal backslash sequences in HTML contexts.
    */
  private def escHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'           => sb ++= "\\\""
      case '\\'          => sb ++= "\\\\"
      case '\n'          => sb ++= "\\n"
      case '\r'          => sb ++= "\\r"
      case '\t'          => sb ++= "\\t"
      case '<'           => sb ++= "\\u003c" // no accidental </script>
      case c if c < ' '  => sb ++= f"\\u${c.toInt}%04x"
      case c             => sb += c
    }
    sb.toString
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** One JSON value; NaN/Infinity → null (JSON has no NaN), everything
    * non-numeric renders as a string (timestamps, arrays, structs).
    */
  private def jsonValue(v: Any): String = v match {
    case null                              => "null"
    case d: Double if d.isNaN || d.isInfinite => "null"
    case f: Float if f.isNaN || f.isInfinite  => "null"
    case n: java.lang.Number               => n.toString
    case b: Boolean                        => b.toString
    case other                             => "\"" + esc(other.toString) + "\""
  }

  /** Add a tab from a DataFrame. Collects ≤ maxRows+1 rows (the +1 only
    * detects truncation); numeric columns get Tabulator number sorters.
    */
  def addTab(name: String, df: DataFrame): HtmlReport = {
    val schema = df.schema
    val rows = df.limit(maxRows + 1).collect()
    val truncated = rows.length > maxRows
    val shown = if (truncated) rows.take(maxRows) else rows
    val cols = schema.fields.map { f =>
      val (sorter, filter) =
        if (isNumeric(f.dataType)) ("number", "number") else ("string", "input")
      s"""{"title":"${esc(f.name)}","field":"${esc(f.name)}","sorter":"$sorter","headerFilter":"$filter"}"""
    }.mkString("[", ",", "]")
    val data = shown.map { r =>
      schema.fields.indices.map { i =>
        s""""${esc(schema.fields(i).name)}":${jsonValue(r.get(i))}"""
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val label = if (truncated) s"$name (first $maxRows rows)" else name
    tabs += Tab(label, cols, data)
    this
  }

  def render(): String = {
    val buttons = tabs.zipWithIndex.map { case (t, i) =>
      val cls = if (i == 0) "tab-btn on" else "tab-btn"
      s"""<button class="$cls" onclick="showTab(event,$i)">${escHtml(t.name)}</button>"""
    }.mkString("\n")
    val divs = tabs.indices.map { i =>
      val style = if (i == 0) "" else "display:none"
      s"""<section class="tab" id="tab$i" style="$style"><div id="tbl$i"></div></section>"""
    }.mkString("\n")
    val scripts = tabs.zipWithIndex.map { case (t, i) =>
      s"""tables[$i] = new Tabulator("#tbl$i", {data: ${t.dataJson}, columns: ${t.colsJson}, layout: "fitDataTable", height: "calc(100vh - 130px)"});"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>${escHtml(title)}</title>
<link rel="stylesheet" href="https://unpkg.com/tabulator-tables@6.3.1/dist/css/tabulator_midnight.min.css">
<script src="https://unpkg.com/tabulator-tables@6.3.1/dist/js/tabulator.min.js"></script>
<style>
 body { margin: 0; padding: 12px; font: 14px system-ui, sans-serif; background: #14151f; color: #e8e8e8; }
 h1 { font-size: 1.2em; margin: 0 0 10px; }
 nav { display: flex; gap: 6px; flex-wrap: wrap; margin-bottom: 10px; }
 .tab-btn { padding: 5px 14px; border: 0; border-radius: 4px; background: #232438; color: #999; cursor: pointer; }
 .tab-btn.on, .tab-btn:hover { background: #31437a; color: #fff; }
 .dl { margin-left: auto; padding: 5px 12px; border: 1px solid #444; border-radius: 4px; background: #232438; color: #bbb; cursor: pointer; }
</style>
</head>
<body>
<h1>${escHtml(title)}</h1>
<nav>
$buttons
<button class="dl" onclick="dlCsv()">Download CSV</button>
</nav>
$divs
<script>
var tables = {};
var current = 0;
function showTab(ev, i) {
  document.querySelectorAll('.tab').forEach(function(d){ d.style.display = 'none'; });
  document.querySelectorAll('.tab-btn').forEach(function(b){ b.classList.remove('on'); });
  document.getElementById('tab' + i).style.display = '';
  ev.currentTarget.classList.add('on');
  current = i;
  /* tables initialized inside display:none measure a 0-size container;
     force a relayout now that the tab is visible */
  if (tables[i]) tables[i].redraw(true);
}
function dlCsv() { if (tables[current]) tables[current].download("csv", "tab" + current + ".csv"); }
$scripts
</script>
</body>
</html>"""
  }

  /** Write the report; returns the path (reference save contract). */
  def save(path: String): String = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, render().getBytes("UTF-8"))
    path
  }
}
