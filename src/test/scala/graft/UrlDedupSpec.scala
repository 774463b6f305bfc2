package graft

import graft.operators.text.UrlDedup
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** URL normalization + URL-level dedup (SURVEY §2 #35k): each
  * canonicalization rule in isolation, preservation rules, and the
  * group/keep semantics.
  */
class UrlDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlDedup.normalize(col("u")).as("n"))
      .collect().head.getString(0)

  test("scheme, host case, www., and default ports normalize away") {
    val want = "example.com/A/b"
    assert(norm("http://example.com/A/b") === want)
    assert(norm("HTTPS://Example.COM/A/b") === want)
    assert(norm("https://www.example.com/A/b") === want)
    assert(norm("http://example.com:80/A/b") === want)
    assert(norm("https://example.com:443/A/b") === want)
    // non-default port survives
    assert(norm("http://example.com:8080/A/b") === "example.com:8080/A/b")
    // protocol-relative URLs collapse with their absolute twins
    assert(norm("//www.Example.com/A/b") === want)
    // scheme-less input: the whole prefix up to / is already the host
    assert(norm("Example.com/A/b") === want)
  }

  test("path case is preserved; trailing slashes and fragments are not") {
    assert(norm("http://example.com/Doc/5/") === "example.com/Doc/5")
    assert(norm("http://example.com/Doc/5///") === "example.com/Doc/5")
    assert(norm("http://example.com/Doc/5#section-2") === "example.com/Doc/5")
    assert(norm("http://example.com/") === "example.com")
  }

  test("tracking params drop, real params survive, empty query drops its ?") {
    assert(norm("http://example.com/p?utm_source=x&utm_medium=y") === "example.com/p")
    assert(norm("http://example.com/p?id=5&utm_campaign=z&page=2") ===
      "example.com/p?id=5&page=2")
    assert(norm("http://example.com/p?ref=rss") === "example.com/p")
    assert(norm("http://example.com/p?refresh=1") === "example.com/p?refresh=1")
    assert(norm("http://example.com/p?fbclid=abc&gclid=def") === "example.com/p")
    assert(norm("http://example.com/p?") === "example.com/p")
  }

  test("fragment is stripped before the query is parsed") {
    // a '#' ends the significant part even when a '?' follows it
    assert(norm("http://example.com/p#frag?notaquery=1") === "example.com/p")
    assert(norm("http://example.com/p?id=1#frag") === "example.com/p?id=1")
  }

  test("dedup keeps the lowest id per canonical URL and counts the group") {
    val docs = Seq(
      (10L, "https://www.site.com/a/"),
      (11L, "HTTP://site.com/a"),
      (12L, "http://site.com:80/a#x"),
      (13L, "http://site.com/a?id=9"),
      (14L, "http://other.com/a")
    ).toDF("doc_id", "url")
    val out = UrlDedup.run(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(10L) === (("site.com/a", true, 3L)))
    assert(out(11L) === (("site.com/a", false, 3L)))
    assert(out(12L) === (("site.com/a", false, 3L)))
    assert(out(13L) === (("site.com/a?id=9", true, 1L)))
    assert(out(14L) === (("other.com/a", true, 1L)))
  }
}
