package graft

import graft.operators.text.{PiiKernel, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Exactness contract for [[PiiKernel]]: the kernel must produce the
  * SAME spans and classes as java.util.regex scanning
  * [[TextOps.PiiScan.CombinedPattern]] — on hand-picked backtracking
  * edge cases AND on randomized fuzz corpora. The oracle runs the same
  * pattern through RE2.
  *
  * One deliberate rewrite closes the java↔RE2 gap (advice-r13): the
  * contract's `\b` is RE2's ASCII word boundary, but java.util.regex's
  * `\b` is Unicode-aware (Character.isLetterOrDigit — so
  * "é123-45-6789" would NOT contain an id under raw Java `\b`). The
  * reference here compiles the patterns with every `\b` replaced by an
  * explicit ASCII-lookaround boundary, and the fuzz alphabets carry
  * non-ASCII letters/digits (é, ß, ٣, ２) to pin the divergence.
  */
class PiiKernelSpec extends AnyFunSuite {

  /** Position-independent ASCII `\b`: word↔non-word transition over
    * [0-9A-Za-z_] only — RE2's semantics, expressible in Java via
    * lookaround.
    */
  private val AsciiB =
    "(?:(?<![0-9A-Za-z_])(?=[0-9A-Za-z_])|(?<=[0-9A-Za-z_])(?![0-9A-Za-z_]))"
  private def ascii(p: String): String = p.replace("\\b", AsciiB)

  private val arms: Seq[(Int, String)] = {
    import TextOps.PiiScan._
    Seq(
      PiiKernel.Url -> UrlPattern,
      PiiKernel.Email -> EmailPattern,
      PiiKernel.Ipv6 -> s"$Ipv6Pattern|$Ipv6CompressedPattern",
      PiiKernel.Ipv4 -> Ipv4Pattern,
      PiiKernel.Id -> IdPattern,
      PiiKernel.Phone -> PhonePattern)
  }
  private val combined =
    java.util.regex.Pattern.compile(ascii(TextOps.PiiScan.CombinedPattern))
  private val armFull = arms.map { case (cls, p) =>
    cls -> java.util.regex.Pattern.compile(s"^(?:${ascii(p)})$$")
  }

  /** Reference: java.util.regex find-loop + first-full-matching-arm
    * classification (span classes are pairwise disjoint, so the class
    * is unambiguous).
    */
  private def reference(t: String): Seq[(Int, Int, Int)] = {
    val m = combined.matcher(t)
    val out = Seq.newBuilder[(Int, Int, Int)]
    while (m.find()) {
      val s = m.group()
      val cls = armFull.find(_._2.matcher(s).matches()).map(_._1)
        .getOrElse(sys.error(s"unclassifiable span '$s'"))
      out += ((cls, m.start(), m.end()))
    }
    out.result()
  }

  private def kernel(t: String): Seq[(Int, Int, Int)] =
    PiiKernel.scan(t).map(s => (s.cls, s.start, s.end)).toSeq

  private def check(t: String): Unit =
    assert(kernel(t) === reference(t), s"on input: <$t>")

  test("backtracking edge cases match the regex reference exactly") {
    Seq(
      // email domain backtracking: match ends at the rightmost valid tld
      "a@b.co7", "x a@b.org.x1y z", "a@b.c", "a@bb.cc.dd", "a..b@c.dd",
      "a@-.co", "a@@b.cc", "mail user5@example.org or x",
      // email memo: runs with no @, runs whose domain fails
      "aaaa aaaa@b.cc", "wordword word.word%word", "a@b", "a@.cc", "@b.cc",
      // URL mid-word start, URL consuming scheme+userinfo
      "xhttps://a.b c@d.ef", "https://user@host.example.com/path end",
      "https://x.co?a@b.cde", "httpx://nope http:/half https:// empty",
      // IPv6 full and compressed, with the documented backtracks
      "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
      "1:2::3:4", "::1", "fe80::", "fe80::1", "::1:", "1::2g", "::abcde",
      "1::2:34567", "1:2:3:4:5:6:7:8:9", "12:30:45 use :: done",
      "beef:: ::beef x::y 1:2:3", "::1:23456", "a1:b2::c3",
      // ≤7-explicit-groups cap (round-14 tightening): 14-group colon
      // dumps, k+m at/over the cap, 7-group leading/trailing edges
      "1:2:3:4:5:6:7::1:2:3:4:5:6:7", "1:2:3::4:5:6:7:8",
      "1::2:3:4:5:6:7:8", "1:2:3:4:5:6:7::8", "1:2:3:4:5:6:7::",
      "::1:2:3:4:5:6:7", "::1:2:3:4:5:6:7:8", "aa:bb:cc:dd:ee:ff::11:22",
      // non-ASCII adjacency: the contract's \b is ASCII, so these DO
      // bound PII spans (Java's Unicode \b would not — advice-r13)
      "é123-45-6789", "123-45-6789é", "٣10.0.0.1", "ß555-123-4567x",
      "２001:0db8:85a3:0000:0000:8a2e:0370:7334é",
      // IPv4 vs phone vs id digit shapes
      "1.2.3.4.5", "10.0.0.255", "1234.5.6.7", "555.123.4567",
      "123-45-6789", "9123-456-78901", "123-45-6789-123-4567",
      "+1 555-123-4567", "+12 555.123.4567", "+123 555-123-4567",
      "(555) 123-4567", "(555)123-4567", "(555) 123 4567",
      "+1 (555) 123-4567", "+1 555123-4567", "555 123 4567",
      "91234567890", "shipment counts 100 200 3000 units",
      // nesting / adjacency
      "fetch https://example.com/10.1.2.3 then ping 10.1.2.4",
      "a@b.cchttp://x.dd", "123-45-678910.0.0.1",
      "", " ", "h", "http", "https://").foreach(check)
  }

  test("fuzz: random token soup matches the regex reference") {
    val rng = new scala.util.Random(20260815L)
    val pieces = Array(
      "a@b.cc", "user5@example.org", "https://example.org/p5", "http://x.y",
      "10.0.0.1", "255.255.255.255", "1.2.3", "1.2.3.4.5",
      "2001:0db8:85a3:0000:0000:8a2e:0370:7334", "fe80::1", "::1", "fe80::",
      "1:2::3:4", "12:30:45", "::",
      "555-123-4567", "(555) 123-4567", "+1 555-123-4567", "555.123.4567",
      "123-45-6789", "9123-456-78901",
      "1:2:3:4:5:6:7::1:2:3:4:5:6:7", "1:2:3:4:5:6:7::", "::1:2:3:4:5:6:7",
      "word", "x", "h", "http", "https", "://", "@", ".", ":", "-", "(", ")",
      "+", "%", "_", "/", "00", "999", "4567", "abc", "DEF", "g", "7",
      "é", "ß", "٣", "２", "村")
    val glue = Array(" ", "", ".", ":", "-", "@", "  ", "x", "5", "::",
      "é", "٣")
    (1 to 3000).foreach { _ =>
      val sb = new StringBuilder
      (1 to 1 + rng.nextInt(12)).foreach { _ =>
        sb.append(pieces(rng.nextInt(pieces.length)))
        sb.append(glue(rng.nextInt(glue.length)))
      }
      check(sb.toString)
    }
  }

  test("fuzz: random chars from a PII-shaped alphabet") {
    val rng = new scala.util.Random(424242L)
    val alphabet = "abcdefgh059.:-@()+ %/_xyzABFéß٣２"
    (1 to 3000).foreach { _ =>
      val len = rng.nextInt(120)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(alphabet(rng.nextInt(alphabet.length))))
      check(sb.toString)
    }
  }

  test("counts and redact derive from the same spans") {
    val t = "mail a@b.cc see https://x.dd/10.1.2.3 call (555) 123-4567 " +
      "node fe80::1 ssn 123-45-6789 host 10.0.0.1"
    val c = PiiKernel.counts(t)
    assert(c.toSeq === Seq(1, 1, 1, 1, 1, 1)) // url,email,ipv6,ipv4,id,phone
    val toks = Array("<URL>", "<EMAIL>", "<IPV6>", "<IPV4>", "<ID>", "<PHONE>")
    assert(PiiKernel.redact(t, toks) ===
      "mail <EMAIL> see <URL> call <PHONE> node <IPV6> ssn <ID> host <IPV4>")
  }
}
