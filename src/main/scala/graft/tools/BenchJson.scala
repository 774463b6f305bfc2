package graft.tools

/** Renders [[graft.Bench]]'s one-line result JSON under a hard length
  * budget.
  *
  * Why a budget exists (round-18, verdict-r17 #1): the driver that
  * consumes the bench output captures only the LAST 2000 characters of
  * the run's output and tries to JSON-parse lines inside that window.
  * Every `BENCH_r*.json` since round 1 carries `parsed: null` for two
  * distinct reasons, both fixed in round 18:
  *
  *   1. sbt's forked-run logger prefixed every stdout line with
  *      `[info] `, so even a line that fit the window entirely (round 2)
  *      failed `json.loads`. Fixed in build.sbt
  *      (`run / outputStrategy := StdoutOutput`) — the line is now
  *      emitted raw — and `Global / showSuccess := false` so no
  *      `[success] Total time …` line lands after it.
  *   2. The line itself outgrew the window (~3 kB by round 14: 88
  *      queries × full-precision doubles + verbose skip reasons), so the
  *      window saw only its tail. Fixed here: the renderer degrades
  *      per-query precision in tiers and drops optional diagnostic
  *      fields until the line fits `MaxLen`.
  *
  * Precision tiers (applied uniformly; first tier that fits wins):
  *   - tier 0: all values `%.3f` — what an isolated `SPARK_GRAFT_ONLY`
  *     A/B run gets, since few queries always fit;
  *   - tier 1: `%.3f` below 1 s, `%.2f` above;
  *   - tier 2: `%.3f` below 1 s, `%.2f` 1–10 s, `%.1f` above;
  *   - tier 3: `%.2f` below 1 s, `%.1f` 1–10 s, `%.0f` above — the
  *     usual full-suite tier; worst-case quantization ±5% at 1 s, which
  *     is far below the measured round-over-round environment noise
  *     (the round-17 judge bounded it at ~1.5× for byte-identical code);
  *   - tier 4: `%.1f` below 10 s, `%.0f` above — the guaranteed-fit
  *     fallback (≤3 chars per value under 1000 s) for value
  *     distributions tier 3 cannot fit, e.g. a cold contended run where
  *     a third of the suite lands above 1 s.
  *
  * Trailing zeros are stripped ("1.20" → "1.2") — free characters.
  * A nonzero value that would render "0" becomes "0.01" so downstream
  * speedup ratios never divide by zero.
  *
  * Field priority: the driver-contract fields (metric/value/unit/
  * queries/sf) are mandatory. Dynamic diagnostics (`failed`, nonempty
  * `errors` / `pass_asymmetric`) outrank precision digits; static
  * fields (`harness`, `skipped` — both documented in the repo) are
  * re-added greedily afterward. Whatever is dropped from the line is
  * printed to stderr by Bench so a human still sees it in the raw log.
  */
object BenchJson {

  /** Hard budget: driver window is 2000 chars; leave slack for the
    * trailing newline and any final stray byte.
    */
  val MaxLen = 1985

  private[graft] def fmtSec(v: Double, tier: Int): String = {
    val s = tier match {
      case 0 => f"$v%.3f"
      case 1 => if (v >= 1) f"$v%.2f" else f"$v%.3f"
      case 2 => if (v >= 10) f"$v%.1f" else if (v >= 1) f"$v%.2f" else f"$v%.3f"
      case 3 => if (v >= 10) f"$v%.0f" else if (v >= 1) f"$v%.1f" else f"$v%.2f"
      // last resort — ≤3 chars for anything under 1000 s, so the full
      // suite fits the window for ANY value distribution (a cold run
      // with 30+ multi-second queries overflowed the tier-3 line)
      case _ => if (v >= 10) f"$v%.0f" else f"$v%.1f"
    }
    val stripped =
      if (s.contains('.')) {
        val r = s.reverse.dropWhile(_ == '0')
        (if (r.startsWith(".")) r.drop(1) else r).reverse
      } else s
    if (stripped == "0" && v > 0) "0.01" else stripped
  }

  private[tools] def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => " "
      case c            => c.toString
    }

  private def obj(m: Seq[(String, String)]): String =
    m.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")

  /** @param results   query -> (seconds, optional error summary)
    * @param asymmetric query -> (pass1 s, pass2 s) outlier rows
    * @param skipped   query -> reason
    * @return (line, droppedFieldNames) — line is guaranteed ≤ MaxLen
    *         unless even tier-3 contract fields alone exceed it (then
    *         the shortest honest line is returned rather than lying).
    *
    * Selection is two-phase. Phase 1 picks the precision tier together
    * with the DYNAMIC diagnostic fields (failed / errors /
    * pass_asymmetric — they carry per-run signal that exists nowhere
    * else in the driver's record), preferring to keep a dynamic field
    * over a digit of precision. Phase 2 greedily re-adds the STATIC
    * fields (harness, then skipped — both documented in the repo, so
    * losing them from the line loses nothing unrecoverable) when they
    * still fit.
    */
  def render(
      results: Map[String, (Double, Option[String])],
      asymmetric: Map[String, (Double, Double)],
      skipped: Map[String, String],
      sfDir: String,
      harness: String): (String, Seq[String]) = {
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0
    val nFailed = results.count(_._2._2.isDefined)
    val errors = results.collect { case (k, (_, Some(e))) => k -> e }
    val asymStr = asymmetric.toSeq.sortBy(_._1)
      .map { case (k, (a, b)) => "\"" + k + "\":[" + f"$a%.1f" + "," + f"$b%.1f" + "]" }
      .mkString("{", ",", "}")

    def line(tier: Int, withFailed: Boolean, withErr: Boolean,
             withAsym: Boolean, withHarness: Boolean, withSkip: Boolean): String = {
      val qs = results.toSeq
        .map { case (k, (v, _)) => "\"" + k + "\":" + fmtSec(v, tier) }
        .mkString("{", ",", "}")
      val sb = new StringBuilder
      // the suite total is the driver's headline number: always %.3f
      // (8 chars at sf100 scale — never the budget's problem)
      sb ++= "{\"metric\":\"total\",\"value\":" + fmtSec(total, 0)
      sb ++= ",\"unit\":\"sec\""
      if (withHarness) sb ++= ",\"harness\":\"" + harness + "\""
      sb ++= ",\"queries\":" + qs
      if (withFailed) sb ++= ",\"failed\":" + nFailed
      if (withErr && errors.nonEmpty) sb ++= ",\"errors\":" + obj(errors.toSeq.sortBy(_._1))
      if (withAsym && asymmetric.nonEmpty) sb ++= ",\"pass_asymmetric\":" + asymStr
      if (withSkip && skipped.nonEmpty) sb ++= ",\"skipped\":" + obj(skipped.toSeq.sortBy(_._1))
      sb ++= ",\"sf\":\"" + esc(sfDir) + "\"}"
      sb.result()
    }

    // Phase 1: most dynamic fields at the best precision that fits.
    val dynamicSets = Seq(
      (true, true, true),
      (true, true, false),
      (true, false, false),
      (false, false, false))
    val phase1 = (for {
      (f, e, a) <- dynamicSets.iterator
      tier <- (0 to 4).iterator
      l = line(tier, f, e, a, withHarness = false, withSkip = false)
      if l.length <= MaxLen
    } yield (tier, f, e, a)).nextOption()
      .getOrElse((4, false, false, false))
    val (tier, f, e, a) = phase1

    // Phase 2: static fields, greedy, harness before skipped.
    val withH = line(tier, f, e, a, withHarness = true, withSkip = false)
    val h = withH.length <= MaxLen
    val withSk = line(tier, f, e, a, withHarness = h, withSkip = true)
    val sk = withSk.length <= MaxLen

    val chosen = line(tier, f, e, a, h, sk)
    val dropped = Seq(
      if (!f) Some("failed") else None,
      if (!e && errors.nonEmpty) Some("errors") else None,
      if (!a && asymmetric.nonEmpty) Some("pass_asymmetric") else None,
      if (!h) Some("harness") else None,
      if (!sk && skipped.nonEmpty) Some("skipped") else None).flatten
    (chosen, dropped)
  }
}
