package graft

import org.apache.spark.sql.functions._

/** The markdown-strip and anchor-text scanners
  * ([[graft.plans.MarkdownScan]]) vs the java-regex forms they replace:
  * seeded differential fuzz over a markdown/HTML-construct-rich
  * alphabet (unpaired openers, nested-ish constructs, star runs of
  * every length, CR/LF variants, header floods), plus hand fixtures
  * for each pass's edge rules, plus a linearity smoke on the
  * unclosed-opener floods that are quadratic under the backtracking
  * engine (the whole reason the kernels exist).
  */
class MarkdownScanSpec extends SparkTestBase {

  import spark.implicits._

  private val Pieces: Vector[String] = Vector(
    "```", "```scala\ncode\n```", "`", "`x`", "``", "x", "yy", " ",
    "\n", "\r\n", "\r", "\t", "*", "**", "***", "****", "*a*", "**b**",
    "[", "]", "(", ")", "[t](u)", "![a](i.png)", "![", "](", "#",
    "##", "####### ", "# H\n", "beta", "<a href=\"u\">t</a>", "<a>",
    "</a>", "<a x>", "<abbr>", "<b>", ">", "<", "0", ".", "é")

  private def gen(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => Pieces(rnd.nextInt(Pieces.size))).mkString
    }
  }

  test("800 fuzzed strings: markdown kernel == regex chain; anchor len " +
    "kernel == regexp_extract_all sum") {
    val rows = gen(0x3D5EED99L, 800) ++
      Seq("", "#", "# ", "```", "``````", "*", "*a", "a*", "<a>x</a>",
        "<a\n>x</a>", "<a >x\n</a>", "![a](b)c[d](e)", "[a]b(c)",
        "**bold** *i* `c` [l](u) ![p](q)\n## H\n```f```")
    val df = rows.toDF("t")
    val got = df.select(col("t"),
        graft.plans.MarkdownStrip(col("t")).as("mk"),
        graft.queries.DocQueries.markdownStripRegex(col("t")).as("mr"),
        graft.plans.AnchorTextLen(col("t")).as("ak"),
        graft.queries.DocQueries.anchorExtractRegexSum(col("t")).as("ar"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"markdown strip diverged on <${r.getString(0)}>")
      assert(r.getInt(3) === r.getInt(4),
        s"anchor len diverged on <${r.getString(0)}>")
    }
  }

  test("unclosed-opener floods stay fast (the quadratic shapes)") {
    // each shape is O(n²) under java.util.regex; the kernels must
    // finish the whole batch in well under a second at this size
    val n = 60000
    val floods = Seq(
      "![x" * (n / 3),
      "[x" * (n / 2),
      "*x" * (n / 2),
      "`x" * (n / 2),
      "<a x>" * (n / 5),
      "#" * n,
      ("# " + "y" * 30 + "\n") * (n / 33))
    val t0 = System.nanoTime()
    floods.foreach { s =>
      graft.plans.MarkdownScan.strip(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      graft.plans.MarkdownScan.anchorTextLen(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000.0, f"kernel flood batch took $ms%.0f ms — lost linearity")
  }
}
