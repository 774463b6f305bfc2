package graft

import graft.operators.text.{HtmlExtract, HtmlKernel}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Exactness contract for [[HtmlKernel]]: kernel output must equal the
  * Catalyst [[HtmlExtract.extract]] expression (the oracle's mirror)
  * on quirk fixtures and randomized tag soup.
  */
class HtmlKernelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Evaluate the Catalyst reference over a batch of strings. */
  private def reference(docs: Seq[String], minLineWords: Int): Seq[String] =
    docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "html")
      .select(col("doc_id"), HtmlExtract.extract(col("html"), minLineWords).as("t"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq

  private def check(docs: Seq[String], minLineWords: Int = 4): Unit = {
    val ref = reference(docs, minLineWords)
    docs.zip(ref).foreach { case (d, want) =>
      val got = HtmlKernel.extract(d, minLineWords)
      assert(got === want, s"on input <$d>")
    }
  }

  test("quirk fixtures match the Catalyst reference exactly") {
    check(Seq(
      // comments: nested-ish, unterminated, adjacent
      "a b c d <!-- x --> e", "a b c d <!-- no end", "<!----><p>w x y z</p>",
      "a <!-- <p> --> b c d", "<!-- a --><!-- b -->w x y z",
      // script/style: prefix-match opens, ci closes, unterminated,
      // bodies containing head/title closers
      "<script>var x = '</head>'</script><p>w x y z</p>",
      "<SCRIPT a=b>x</ScRiPt>w x y z", "<scriptfoo>gone</script>w x y z",
      "<script>no close w x y z", "<style>p{}</style>w x y z",
      // head/title: anchored names, attrs, spaced closers, unterminated
      "<head><title>five words of chrome here</title></head>w x y z",
      "<head profile='x'>m</head >w x y z", "<heading>w x y z</heading>",
      "<title>t</title  >w x y z", "<head>never closes w x y z",
      "<title x>y</title>w x y z",
      // block tags: anchored (<pre> is inline), self-closing, attrs,
      // case, h1-h6
      "<pre>w x y z</pre>", "<p>a b c d</p><br/><div x=1>e f g h</div>",
      "<P CLASS='x'>a b c d</P>", "<h1>a b c d</h1><h6>e f g h</h6>",
      "<param>w x y z", "<table><tr><li>a b c d</li></tr></table>",
      "<br >a b c d", "<div/>a b c d", "<div />a b c d",
      // inline tags, loose angles, processing instructions
      "x < y > z and a b c d", "x <y> z plus a b c d w",
      "<?xml version='1'?>a b c d", "<!doctype html>a b c d",
      "a <em>b</em> c d", "<unclosed a b c d",
      // entities: named, numeric, double-encoded, out of range, raw
      // sentinels
      "a&nbsp;b c d", "x &lt;tag&gt; y z", "say &quot;hi&quot; w x",
      "w x y &#65;", "w x y &#xe9;", "w x y &#X4A;", "w x y &#999;",
      "w x y &#xABC;", "w x y &#0;", "w x y &#007;", "&amp;lt; w x y",
      "&amp;#65; w x y", "&#38;amp; w x y", "w x y \u0001 z q",
      "w x\u000212 y z", "x12\u0002y w q z", "w \u0001x41\u0002 y z",
      // whitespace: vertical tab, tabs, short-line drops
      "one two\tthree four", "a\u000Bb c d e", "short\nw x y z\nalso short",
      "   \n\t\n  ", "", "w x y z",
      // order-of-passes traps
      "<script><!-- </script> --> w x y z",
      "<!-- <script> --> x</script> w x y z",
      "<head><script>'</head>'</script>w1 w2</head>w x y z",
      // ASCII-only case fold (advice-r13): ſ/ı/İ/K (Kelvin) case-pair
      // with s/i/k under Unicode folding but NOT under (?i)'s ASCII
      // fold — these must not read as tags
      "<ſcript>a b c d</script> w x y z", "<script>x</ſcript> w x y z",
      "<tıtle>a b c d</title>", "<TİTLE>a b c d</TİTLE>",
      "<ſtyle>p{} w x y z</style>", "<bŕ>w x y z", "<K>a b c d</K>",
      "<div>a b c d</dİv>", "<ſ>w x y z"))
  }

  test("fuzz: random tag soup matches the Catalyst reference") {
    val rng = new scala.util.Random(1313L)
    val pieces = Array(
      "<p>", "</p>", "<div>", "</div>", "<DIV a='b'>", "<br/>", "<br />",
      "<pre>", "</pre>", "<script>", "</script>", "<SCRIPT x>", "</SCRIPT>",
      "<style>", "</style>", "<head>", "</head>", "</head >", "<head x=1>",
      "<title>", "</title>", "<heading>", "<h1>", "</h3>", "<li>", "<tr>",
      "<table>", "</table>", "<ul>", "<ol>", "<em>", "</em>", "<a href='x'>",
      "<!--", "-->", "<!-- c -->", "<?php ?>", "<!doctype>",
      "&nbsp;", "&lt;", "&gt;", "&quot;", "&amp;", "&#65;", "&#xe9;",
      "&#X4A;", "&#999;", "&#xABC;", "&#0;", "&#38;amp;", "&#", ";",
      "\u0001", "\u0002", "<", ">", "/", "word", "w x y z", "a b", "  ",
      "\n", "\t", "\u000B", "x41", "12",
      "<ſcript>", "</ſcript>", "<tıtle>", "</TİTLE>",
      "ſ", "ı", "İ", "K")
    (1 to 1200).foreach { i =>
      val docs = (0 until 5).map { _ =>
        val sb = new StringBuilder
        (1 to 1 + rng.nextInt(14)).foreach { _ =>
          sb.append(pieces(rng.nextInt(pieces.length)))
          if (rng.nextInt(3) == 0) sb.append(' ')
        }
        sb.toString
      }
      check(docs, minLineWords = 1 + (i % 4))
    }
  }
}
