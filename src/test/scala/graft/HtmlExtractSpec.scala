package graft

import graft.operators.text.HtmlExtract
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** HTML main-text extraction (SURVEY §2 #35m): each pipeline stage in
  * isolation — script/style/comment removal, block-tag line structure,
  * inline-tag joining, entity decode order, and the short-line rule.
  */
class HtmlExtractSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def extract(html: String, minLineWords: Int = 4): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h"), minLineWords).as("t"))
      .collect().head.getString(0)

  test("script and style content never leaks, including < and & inside it") {
    val html = "<p>keep these four words</p>" +
      "<script>if (1 < 2) { alert(\"x & y\"); }</script>" +
      "<style>body { color: red; }</style>" +
      "<SCRIPT type=\"text/javascript\">more < hidden</SCRIPT>"
    assert(extract(html) === "keep these four words")
  }

  test("comments are removed before tag handling") {
    assert(extract("<p>real text stays here</p><!-- <p>ghost words gone</p> -->")
      === "real text stays here")
  }

  test("block tags make lines; inline tags join words") {
    val html = "<p>first paragraph has words</p><p>second paragraph has words</p>" +
      "<div>a <b>bolded</b> run of words</div>"
    assert(extract(html) ===
      "first paragraph has words\nsecond paragraph has words\na bolded run of words")
    // inline markup must not glue adjacent words together
    assert(extract("<p>alpha<span>beta</span>gamma delta</p>", 2) ===
      "alpha beta gamma delta")
  }

  test("entities decode, &amp; last so double-encoding stays literal") {
    assert(extract("<p>Tom &amp; Jerry &lt;3 forever&#39;s</p>", 2) ===
      "Tom & Jerry <3 forever's")
    assert(extract("<p>literal &amp;lt; stays encoded here</p>", 2) ===
      "literal &lt; stays encoded here")
    assert(extract("<p>literal &amp;#233; stays encoded here</p>", 2) ===
      "literal &#233; stays encoded here")
    assert(extract("<p>a&nbsp;b c d</p>", 2) === "a b c d")
    assert(extract("<p>say &quot;hi&quot; to them</p>", 2) === "say \"hi\" to them")
  }

  test("numeric character references decode in the ASCII/Latin-1 range") {
    // decimal + hex (both cases, 1- and 2-digit); &#x9; is a tab that
    // the whitespace collapse then folds to one space
    assert(extract("<p>caf&#233; r&#xe9;sum&#xE9; A&#x41;B tab&#x9;sep</p>", 2) ===
      "café résumé AAB tab sep")
    // out-of-range (>255), zero, and >3-digit references stay literal
    assert(extract("<p>keep &#999; and &#0; and &#1234; literal</p>", 2) ===
      "keep &#999; and &#0; and &#1234; literal")
    // a decoded &#10; is a REAL newline: it creates line structure
    assert(extract("<p>first half line one&#10;second half line two</p>", 2) ===
      "first half line one\nsecond half line two")
  }

  test("head and title blocks are stripped wholesale") {
    val html = "<html><head><title>Five Word Leaky Page Title</title>" +
      "<meta name=\"x\"></head><body><p>body prose has enough words</p></body></html>"
    assert(extract(html) === "body prose has enough words")
    // a stray title outside <head> is stripped too; <header> (a longer
    // name sharing the prefix) is NOT treated as <head>
    assert(extract("<title>Another Long Page Title Here</title>" +
      "<header><p>kept header prose four words</p></header>") ===
      "kept header prose four words")
  }

  test("anchored block tags: pre/param/progress join inline, p/div still split") {
    // <pre> must not become a line break (the old prefix-match bug)
    assert(extract("<p>a pre <pre>inline</pre> tail words</p>", 2) ===
      "a pre inline tail words")
    assert(extract("<p>opts <param name=\"x\" value=\"y\"> listed <progress>" +
      " run <picture>shown</picture> done</p>", 2) ===
      "opts listed run shown done")
    // the anchored names still split with attributes and self-closing
    assert(extract("<p class=\"x\">first line words here</p><br/>" +
      "<div id=\"y\">second line words here</div>", 2) ===
      "first line words here\nsecond line words here")
  }

  test("literal < and > in body text survive the restricted tag rule") {
    assert(extract("<p>compare x < y > z often</p>", 2) === "compare x < y > z often")
  }

  test("processing instructions strip; raw sentinel bytes pass through unharmed") {
    // <?xml?> / <?php?> fragments are tags, not prose
    assert(extract("<?xml version=\"1.0\" encoding=\"utf-8\"?>" +
      "<p>actual page words here</p>", 2) === "actual page words here")
    // a raw U+0002 in crawl text must not crash the ANSI-mode cast in
    // the numeric decoder — it passes through as text
    assert(extract("<p>junk \u0002 bytes in page text here</p>", 2) ===
      "junk \u0002 bytes in page text here")
    // raw U+0001 is consumed as a decoder segment boundary (the
    // documented sentinel caveat) — the surrounding text survives and
    // nothing crashes
    assert(extract("<p>other \u0001 byte survives fine</p>", 2) ===
      "other byte survives fine")
  }

  test("script bodies containing literal </head> cannot truncate the head strip") {
    val html = "<head><script>document.write('</head>'); " +
      "var t = 'analytics tag manager loader';</script>" +
      "<title>Long Five Word Title Here</title></head>" +
      "<body><p>real prose has enough words</p></body>"
    assert(extract(html) === "real prose has enough words")
  }

  test("short lines (nav, headers, footers) drop under the word rule") {
    val html = "<div>Home About Contact</div><h1>Page Title</h1>" +
      "<p>this sentence is long enough to keep</p>" +
      "<div>Copyright 2026</div>"
    assert(extract(html, 4) === "this sentence is long enough to keep")
    // at minLineWords=2 the nav and footer survive; shows the knob works
    assert(extract(html, 3).linesIterator.size === 2)
  }

  test("whitespace collapses inside lines; empty output is the empty string") {
    assert(extract("<p>spaced   out    words here</p>") === "spaced out words here")
    assert(extract("<div>a b</div>") === "")
    assert(extract("") === "")
  }

  test("run emits line and char counts with layout-independent results") {
    val df = Seq(
      (1L, "<p>first doc with enough words</p><p>and a second good line</p>"),
      (2L, "<h1>Tiny</h1>"),
      (3L, "<p>third doc also has words</p>")
    ).toDF("doc_id", "html").repartition(5)
    val out = HtmlExtract.run(df).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSeq
    assert(out === Seq((1L, 2, 50), (2L, 0, 0), (3L, 1, 24)))
  }
}
