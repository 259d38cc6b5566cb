package graft.tools

import java.util.regex.Pattern

/** Profiling harness (not part of the library surface): times every
  * regex the scalar operators run, against adversarial input shapes, in
  * plain java.util.regex — the engine Spark's regexp_* expressions use.
  * Flags super-linear (pattern, shape) cells so ReDoS-class hazards are
  * measured, not guessed. Each cell is bounded by a deadline-checking
  * CharSequence (Java regex has no interruption points; charAt is the
  * only hook).
  */
object RegexAudit {

  private class Deadline(s: String, deadlineNs: Long) extends CharSequence {
    private var checks = 0
    def length: Int = s.length
    def charAt(i: Int): Char = {
      checks += 1
      if ((checks & 0xfff) == 0 && System.nanoTime() > deadlineNs)
        throw new RuntimeException("deadline")
      s.charAt(i)
    }
    def subSequence(a: Int, b: Int): CharSequence =
      new Deadline(s.substring(a, b), deadlineNs)
  }

  /** (millis, timedOut) for one find-all-and-replace pass. */
  private def time(p: Pattern, s: String, budgetMs: Long): (Double, Boolean) = {
    val t0 = System.nanoTime()
    val cs = new Deadline(s, t0 + budgetMs * 1000000L)
    try {
      val m = p.matcher(cs)
      while (m.find()) {}
      (((System.nanoTime() - t0) / 1e6), false)
    } catch {
      case _: RuntimeException => (((System.nanoTime() - t0) / 1e6), true)
    }
  }

  /** Every pattern the scalar operators evaluate through
    * java.util.regex. `EmailRe` is listed for the report but excluded
    * from [[javaEvaluated]]: since round 5 the engine evaluates it via
    * the linear [[graft.plans.EmailScan]] kernel, so its java.util.regex
    * cost is no longer a production path (it stays here so the report
    * keeps showing WHY the kernel exists).
    */
  val patterns: Seq[(String, String)] = {
    import graft.text.Pii
    Seq(
      "EmailRe" -> Pii.EmailRe,
      "PhoneSimpleRe" -> Pii.PhoneSimpleRe,
      "PhoneRe" -> Pii.PhoneRe,
      "CreditCardRe" -> Pii.CreditCardRe,
      "IbanRe" -> Pii.IbanRe,
      "IpRe" -> Pii.IpRe,
      "SsnRe" -> Pii.SsnRe,
      "stripHtml" -> "<[^>]+>",
      "wsCollapse" -> "\\s+",
      "control" -> "[\\x00-\\x1F\\x7F-\\x9F]",
      "punctRepeat" -> "([!?.,])\\1{2,}",
      "charRepeat" -> "(.)\\1{3,}",
      "nonLetter" -> "[^\\p{L}]",
      "letterRuns" -> "\\p{L}+",
      "wordRuns" -> "\\w+",
      "numericLike" -> "^[\\d\\.\\-]+$",
      "boiler" -> graft.text.Normalize.BoilerplatePatterns
        .mkString("(", ")|(", ")"),
      // r11 web-extraction patterns — kernel-evaluated in production
      // (plans/MarkdownScan): the complement-class/lazy-dot scans are
      // quadratic on unclosed-opener floods under this engine
      "anchorText" -> "<a(?:\\s[^>]*)?>(.*?)</a>",
      "mdFence" -> "(?s)```.*?```",
      "mdImage" -> "!\\[([^\\]]*)\\]\\(([^)]*)\\)",
      "mdLink" -> "\\[([^\\]]*)\\]\\(([^)]*)\\)",
      "mdEmphasis" -> "\\*{1,3}([^*]+)\\*{1,3}",
      "mdInlineCode" -> "`([^`]+)`",
      "mdHeader" -> "(?m)^#{1,6}[ \\t]+")
  }

  /** The patterns production code still runs under java.util.regex.
    * Excluded with their kernels:
    *  - EmailRe → plans/EmailScan (round 5);
    *  - the five stage-3 PII patterns + PhoneSimpleRe → plans/PiiScan
    *    (late round 11: not super-linear, but fused two-expressions-
    *    per-row — they stay in [[patterns]] so the report tracks them);
    *  - the markdown/anchor patterns → plans/MarkdownScan (late round
    *    11: quadratic on unclosed-opener floods, see mdImage/mdLink/
    *    mdEmphasis/mdInlineCode/anchorText × openerFlood cells in the
    *    report).
    */
  private val Kerneled = Set("EmailRe", "PhoneRe", "PhoneSimpleRe",
    "CreditCardRe", "IbanRe", "IpRe", "SsnRe", "anchorText", "mdFence",
    "mdImage", "mdLink", "mdEmphasis", "mdInlineCode", "mdHeader")

  val javaEvaluated: Seq[(String, String)] =
    patterns.filterNot(p => Kerneled(p._1))

  /** Adversarial input shapes at total length ~l. */
  def shapes(l: Int): Seq[(String, String)] = Seq(
        "alnumRun" -> "x" * l,
        "digitRun" -> "1" * l,
        "digitSpace" -> ("1 " * (l / 2)),
        "digitDash" -> ("1-" * (l / 2)),
        "dotRun" -> "." * l,
        "emailClassRun" -> ("a.b-c_d%e+" * (l / 10)),
        "localThenBang" -> ("x" * (l - 1) + "!"),
        "atTail" -> ("x" * (l - 6) + "@a.com"),
        "atHead" -> ("a@" + "x" * (l - 2)),
        "wordsFlood" -> ("lorem " * (l / 6)),
        "tagSoup" -> ("<div><p><span>" * (l / 14)),
        "unclosedTag" -> ("<" + "x" * (l - 1)),
        "nlFlood" -> "\n" * l,
        "punctFlood" -> ("... --- ~~~ " * (l / 12)),
        "upperIban" -> ("DE" + "1" * (l - 2)),
        "imgOpenerFlood" -> ("![x" * (l / 3)),
        "linkOpenerFlood" -> ("[x" * (l / 2)),
        "starFlood" -> ("*x" * (l / 2)),
        "backtickFlood" -> ("`x" * (l / 2)),
        "anchorOpenFlood" -> ("<a x>" * (l / 5)))

  /** Public cell timer for the spec: (millis, timedOut). */
  def timeCell(pattern: String, input: String, budgetMs: Long): (Double, Boolean) =
    time(Pattern.compile(pattern), input, budgetMs)

  def main(args: Array[String]): Unit = {
    def run(l: Int): Seq[(String, String)] = {
      for ((pn, ps) <- patterns; (sn, s) <- shapes(l)) yield {
        val (ms, to) = time(Pattern.compile(ps), s, 2000L)
        (s"$pn/$sn", if (to) "TIMEOUT" else f"$ms%.1f")
      }
    }.toSeq

    val l1 = 50000
    val r1 = run(l1).toMap
    val r2 = run(2 * l1).toMap
    println(f"${"pattern/shape"}%-32s ${s"ms@${l1 / 1000}k"}%10s ${s"ms@${l1 / 500}k"}%10s  growth")
    for (k <- r1.keys.toSeq.sorted) {
      val (a, b) = (r1(k), r2(k))
      val growth = (a, b) match {
        case ("TIMEOUT", _) | (_, "TIMEOUT") => "***"
        case _ =>
          val g = b.toDouble / math.max(a.toDouble, 0.01)
          if (b.toDouble > 20 && g > 3.0) f"${g}%.1fx SUPERLINEAR"
          else if (b.toDouble > 100) f"${g}%.1fx slow"
          else ""
      }
      if (growth.nonEmpty || a == "TIMEOUT" || b == "TIMEOUT")
        println(f"$k%-32s $a%10s $b%10s  $growth")
    }
    println("(cells under 20 ms at 100k with sub-3x growth are omitted)")
  }
}
