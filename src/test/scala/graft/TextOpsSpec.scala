package graft

import org.apache.spark.sql.functions._

import graft.text.{Normalize, Pii, TextMetrics, Toxicity}

/** Unit coverage for the FIXTURES.md §3 adversarial transform cases. */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm1(s: String): String = {
    val r = Seq(Option(s)).toDF("t")
      .select(Normalize.normalizeText(col("t")).as("n"))
      .collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("P1 normalize: NFKC, control chars, whitespace collapse, null-if-empty") {
    assert(norm1("ﬁle ①") == "file 1") // NFKC: ligature + circled digit
    assert(norm1("ab\tc\n\nd") == "a b c d")
    assert(norm1("  hi   there  ") == "hi there")
    assert(norm1("\t\n   ") == null)
    assert(norm1(null) == null)
  }

  test("P1 idempotent") {
    val cases = Seq("a  b", "ﬁle", " x ", "plain text")
    cases.foreach(c => assert(norm1(norm1(c)) == norm1(c)))
  }

  test("P2 strip_html") {
    val r = Seq("<p>Hi <b>there</b></p>").toDF("t")
      .select(Normalize.stripHtml(col("t"))).as[String].collect()(0)
    assert(r == " Hi  there  ")
  }

  test("P3 boilerplate nuke: single-line doc containing a pattern blanks whole doc") {
    val r = Seq("some text accept all cookies more text").toDF("t")
      .select(Normalize.removeBoilerplateLines(col("t"))).as[String].collect()(0)
    assert(r == "")
    val multi = Seq("keep me\nplease accept cookies now\nkeep too").toDF("t")
      .select(Normalize.removeBoilerplateLines(col("t"))).as[String].collect()(0)
    assert(multi == "keep me\nkeep too")
  }

  test("P4 repeated chars: punct to 2, any char to 3") {
    val r = Seq("wow!!!!! soooooo").toDF("t")
      .select(Normalize.normalizeRepeatedChars(col("t"))).as[String].collect()(0)
    assert(r == "wow!! sooo")
  }

  test("P6/P7 canonicalize: case/whitespace-insensitive; P6 idempotent") {
    val df = Seq("  Hello   WORLD  ").toDF("t")
    val c = df.select(Normalize.canonExact(col("t"))).as[String].collect()(0)
    assert(c == "hello world")
    assert(df.select(Normalize.canonExact(Normalize.canonExact(col("t"))))
      .as[String].collect()(0) == c)
    val near = Seq(("x" * 600)).toDF("t")
      .select(Normalize.canonNear(col("t"))).as[String].collect()(0)
    assert(near.length == 500)
  }

  test("M2/M4: word metrics with empty-string guards") {
    val r = Seq(("a a b", 3, 1.0 - 2.0 / 3.0), ("", 0, 0.0))
      .toDF("t", "wc", "rep")
    val out = r.select(
      TextMetrics.wordCount(col("t")).as("wc2"),
      TextMetrics.repetitionRatio(col("t")).as("rep2"),
      col("wc"), col("rep")).collect()
    out.foreach { row =>
      assert(row.getInt(0) == row.getInt(2))
      assert(math.abs(row.getDouble(1) - row.getDouble(3)) < 1e-12)
    }
  }

  test("M5 token stats: unique case-sensitive, stopwords lowercase-matched") {
    val out = Seq("The the THE quick").toDF("t").select(
      TextMetrics.tokenCount(col("t")),
      TextMetrics.uniqueTokens(col("t")),
      TextMetrics.stopwordRatio(col("t"))).collect()(0)
    assert(out.getInt(0) == 4)
    assert(out.getInt(1) == 4) // The/the/THE/quick all case-sensitively distinct
    assert(math.abs(out.getDouble(2) - 0.75) < 1e-12) // all three match 'the'
  }

  test("M8 PII: counts and ordered mask chain") {
    val out = Seq("mail a.b@x.co ph +1 415-555-0134 cc 4111 1111 1111 1111 ib DE89370400440532013000")
      .toDF("t").select(
        Pii.piiEmailHits(col("t")),
        Pii.piiCcHits(col("t")),
        Pii.piiIbanHits(col("t")),
        Pii.maskPii(col("t"))).collect()(0)
    assert(out.getInt(0) == 1)
    assert(out.getInt(1) >= 1)
    assert(out.getInt(2) == 1)
    val masked = out.getString(3)
    assert(masked.contains("<EMAIL>") && masked.contains("<IBAN>"))
    assert(!masked.contains("a.b@x.co"))
  }

  test("extended PII: ip and ssn masked after the reference chain") {
    def ext(s: String): (Int, Int, String) = {
      val r = Seq(s).toDF("t").select(
        Pii.piiIpHits(col("t")), Pii.piiSsnHits(col("t")),
        Pii.maskPiiExtended(col("t"))).collect()(0)
      (r.getInt(0), r.getInt(1), r.getString(2))
    }
    val (ip, ssn, m) = ext("host 10.0.255.1 owner 123-45-6789 end")
    assert(ip === 1 && ssn === 1)
    assert(m === "host <IP> owner <SSN> end")
    assert(ext("123-45-6789")._3 === "<SSN>")
    // dotted quads inside version strings still need all four octets
    assert(ext("v1.2.3 release")._1 === 0)
    // specific-before-general: PhoneRe accepts '.' separators, so run
    // first it would turn this into "<PHONE>.0.1" — the ip mask must win
    assert(ext("ping 192.168.0.1 now")._3 === "ping <IP> now")
    // the general types still mask after the specific ones
    assert(ext("mail a@b.co ip 10.0.0.1")._3 === "mail <EMAIL> ip <IP>")
  }

  private def ccHits(s: String): Int =
    Seq(s).toDF("t").select(Pii.piiCcHits(col("t")).as("n"))
      .collect()(0).getInt(0)

  private def masked(s: String): String =
    Seq(s).toDF("t").select(Pii.maskPii(col("t")).as("m"))
      .collect()(0).getString(0)

  test("regex golden: CreditCardRe lazy quantifier matches Python re exactly") {
    // Golden values from Python 3.11 re over the reference's pattern
    // (deep_clean_and_pii.py:266-334). The leading \b is what stops a
    // 17+-digit run from matching at offset 1 — every interior start
    // position sits between two digits, so the boundary never holds.
    assert(ccHits("4111 1111 1111 1111") === 1)
    assert(ccHits("4222222222222") === 1)   // 13 digits: lower bound
    assert(ccHits("123456789012") === 0)    // 12 digits: under bound
    assert(ccHits("12345678901234567") === 0) // 17 digits: leading \b blocks
    assert(ccHits("4111-1111-1111-1111 and 5500 0000 0000 0004") === 2)
    assert(ccHits("id 1234567890123456x") === 0) // trailing \b blocks
    // Mask-CHAIN order is part of the semantics: phone runs before cc
    // (deep_clean_and_pii.py order), and PhoneRe happily eats the first
    // 3-4/3-4 digit groups of a spaced card number. Python's chain does
    // exactly the same — golden outputs match byte for byte.
    assert(masked("pad 4111 1111 1111 1111 pad") === "pad <PHONE> 1111 pad")
    assert(masked("4111-1111-1111-1111 and x") === "<PHONE>-1111 and x")
  }

  test("regex golden: \\b at non-ASCII — Spark matches Python; RE2 oracle diverges") {
    // Word-boundary dialects at non-ASCII letters, measured empirically:
    // Java (Spark) and Python3 re both treat é as a word character, so
    // PhoneRe's trailing \b fails after "...4567é", backtracks, and masks
    // only "555-123" — the engine reproduces the pandas reference
    // EXACTLY. DuckDB's RE2 \b is ASCII-only and masks the full run
    // ("call <PHONE>é now"), so oracle SQL on non-ASCII-adjacent digits
    // would hash-mismatch — irrelevant for the ASCII test corpus, pinned
    // here so nobody "fixes" the engine toward the oracle (SURVEY §7
    // hard-parts list).
    assert(masked("call 555-123-4567 now") === "call <PHONE> now")
    assert(masked("call 555-123-4567é now") === "call <PHONE>-4567é now")
    assert(masked("число 555-123-4567") === "число <PHONE>")

    // \w+ tokenization (Toxicity.tokens) is the opposite story: Java \w
    // is ASCII-only like RE2 (engine == oracle), Python's is Unicode.
    // Wordlists are plain ASCII so hit counts are unaffected; only the
    // token-count denominator drifts on accented text.
    val toks = Seq("merde café naïve").toDF("t")
      .select(expr("regexp_extract_all(lower(t), '\\\\w+', 0)").as("w"))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("merde", "caf", "na", "ve")) // Python: merde, café, naïve
  }

  test("M9 toxicity: scaled fractions, severe at >= 0.9") {
    val out = Seq("damn damn clean words here and there")
      .toDF("t").select(Toxicity.scores(col("t"))("toxicity")).collect()(0)
    // 2 hits / 7 tokens * 5 = 1.428 -> clamped 1.0? no: 2/7*5 = 1.43 -> 1.0
    assert(out.getDouble(0) == 1.0)
    val mild = Seq("damn one two three four five six seven eight nine")
      .toDF("t").select(Toxicity.scores(col("t"))("toxicity")).collect()(0)
    assert(math.abs(mild.getDouble(0) - 0.5) < 1e-12) // 1/10*5
  }

  test("A4 max token freq ratio") {
    val out = Seq("yes yes yes yes no").toDF("t")
      .select(TextMetrics.maxTokenFreqRatio(col("t"))).collect()(0)
    assert(math.abs(out.getDouble(0) - 0.8) < 1e-12)
  }

  test("token entropy: 0 for constant docs, ln(n) for all-distinct, exact for mixed") {
    def h(s: String): Double =
      Seq(s).toDF("t")
        .select(TextMetrics.tokenEntropyFromTokens(TextMetrics.tokens(col("t"))))
        .collect()(0).getDouble(0)
    assert(h("spam spam spam spam") === 0.0)
    assert(math.abs(h("a b c d e") - math.log(5)) < 1e-12)
    // counts 2,1,1: H = ln(4) - (2 ln 2)/4
    assert(math.abs(h("a a b c") - (math.log(4) - 2 * math.log(2) / 4)) < 1e-12)
    assert(h("") === 0.0)
  }

  test("url canonicalization: tracking params, ports, www, fragments, case") {
    def canon(s: String): String =
      Seq(s).toDF("u").select(graft.ops.Domains.canonicalizeUrl(col("u")))
        .collect()(0).getString(0)
    assert(canon("https://WWW.Example.COM:443/A/B/?utm_source=x&id=7&fbclid=z#top")
      === "https://example.com/a/b/?id=7")
    assert(canon("http://example.com:80/path/") === "http://example.com/path")
    // all params are tracking -> the query goes entirely
    assert(canon("https://example.com/?utm_a=1&utm_b=2&gclid=3")
      === "https://example.com")
    // non-tracking params survive in order
    assert(canon("https://example.com/p?a=1&utm_x=9&b=2")
      === "https://example.com/p?a=1&b=2")
    // consecutive tracking params in the middle
    assert(canon("https://example.com/p?a=1&utm_x=9&gclid=2&b=2")
      === "https://example.com/p?a=1&b=2")
    // idempotent on an already-canonical url
    assert(canon("https://example.com/p?a=1") === "https://example.com/p?a=1")
  }

  test("url canonicalization anchoring: lookalike names, values, non-default ports untouched") {
    def canon(s: String): String =
      Seq(s).toDF("u").select(graft.ops.Domains.canonicalizeUrl(col("u")))
        .collect()(0).getString(0)
    // a param whose NAME merely ends in a tracking name is not tracking
    assert(canon("https://example.com/p?my_gclid=1") === "https://example.com/p?my_gclid=1")
    // a tracking-lookalike inside a VALUE is data
    assert(canon("https://example.com/p?to=utm_x=9") === "https://example.com/p?to=utm_x=9")
    // default-port strip is scheme-matched and authority-only
    assert(canon("http://example.com:443/p") === "http://example.com:443/p")
    assert(canon("https://example.com:80/p") === "https://example.com:80/p")
    assert(canon("https://example.com:8443/p") === "https://example.com:8443/p")
    assert(canon("http://example.com/redir?to=host:80/p")
      === "http://example.com/redir?to=host:80/p")
    assert(canon("http://user:p@example.com:80/q") === "http://user:p@example.com/q")
    // port with empty path / query directly after
    assert(canon("http://example.com:80") === "http://example.com")
    assert(canon("https://example.com:443?a=1") === "https://example.com?a=1")
    // www only strips at the host front, not inside a value
    assert(canon("https://example.com/r?u=https://www.x.com")
      === "https://example.com/r?u=https://www.x.com")
  }

  test("stripInvisible deletes format chars without creating token breaks") {
    import spark.implicits._
    val cases = Seq(
      "he​llo" -> "hello", // ZWSP inside a word: deletion, not space
      "﻿bom first" -> "bom first",
      "a­b‎‏c⁠d" -> "abcd",
      "plain text" -> "plain text",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(graft.text.Normalize.stripInvisible(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
    // the hygiene payoff: two visually-identical strings hash equal again
    val a = "same text"
    val b = "same‌ text"
    assert(a != b)
    val scrubbed = Seq(a, b).toDF("t")
      .select(graft.text.Normalize.stripInvisible(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(scrubbed(0) === scrubbed(1))
  }

  test("foldConfusables maps homoglyphs to Latin, idempotent, ASCII-safe") {
    import spark.implicits._
    val N = graft.text.Normalize
    // from/to maps must stay aligned codepoint-for-codepoint
    assert(N.ConfusablesFrom.length === N.ConfusablesTo.length)
    val cases = Seq(
      "раураl" -> "paypal",     // Cyrillic р/а/у homoglyph attack
      "sеcurе.com" -> "secure.com",
      "ΑΒΓ" -> "ABΓ",           // Greek Α/Β fold; Γ has no Latin twin
      "plain ascii" -> "plain ascii",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(N.foldConfusables(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
    // idempotence: folding folded text is a no-op
    val twice = cases.map(_._2).toDF("t")
      .select(N.foldConfusables(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(twice.toSeq === cases.map(_._2))
    // the dedup payoff: homoglyph variant hashes equal after folding
    val folded = Seq("соde", "code").toDF("t")
      .select(N.foldConfusables(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    assert(folded(0) === folded(1))
  }

  test("interaction goldens: hygiene passes × PII masks (mixed-script evasion)") {
    // The dedup-evasion channels are ALSO PII-mask-evasion channels:
    // every fixture here defeats the reference regexes until the
    // matching hygiene pass runs first. Order is load-bearing —
    // hygiene BEFORE masking — and each golden pins both the evaded
    // and the repaired output so neither side drifts.
    val N = Normalize
    def strip(s: String): String = Seq(s).toDF("t")
      .select(N.stripInvisible(col("t"))).collect()(0).getString(0)
    def fold(s: String): String = Seq(s).toDF("t")
      .select(N.foldConfusables(col("t"))).collect()(0).getString(0)
    def emailHits(s: String): Int = Seq(s).toDF("t")
      .select(Pii.piiEmailHits(col("t"))).collect()(0).getInt(0)
    def ibanHits(s: String): Int = Seq(s).toDF("t")
      .select(Pii.piiIbanHits(col("t"))).collect()(0).getInt(0)

    // ZWSP inside the email local part: EmailRe still fires on the
    // "hn@example.com" suffix, so mask-without-strip LEAKS the first
    // two local-part chars plus the invisible itself. Strip first →
    // the whole address masks.
    val zwspMail = "jo​hn@example.com"
    assert(masked(zwspMail) === "jo​<EMAIL>")
    assert(masked(strip(zwspMail)) === "<EMAIL>")

    // ZWSP inside a card number splits the digit run under 13, so
    // NOTHING matches it as a card; the raw chain leaks the leading
    // digits ("4111" + invisible survive next to a <PHONE> that ate
    // the rest). Strip first → the chain behaves exactly like the
    // pinned spaced-card golden (phone-before-cc eats the first
    // groups — same bytes Python produces).
    val zwspCard = "4111​1111 1111 1111"
    assert(ccHits(zwspCard) === 0)
    assert(masked(zwspCard) === "4111​<PHONE>")
    assert(ccHits(strip(zwspCard)) === 1)
    assert(masked(strip(zwspCard)) === "<PHONE> 1111")

    // Cyrillic а in the domain kills the match entirely (domain class
    // is [A-Za-z0-9.-], and no dot+TLD remains to backtrack to): a
    // FULL address leaks with zero hits. Fold first → full mask.
    val cyrMail = "contact john@exаmple.com now"
    assert(emailHits(cyrMail) === 0)
    assert(masked(cyrMail) === cyrMail)
    assert(emailHits(fold(cyrMail)) === 1)
    assert(masked(fold(cyrMail)) === "contact <EMAIL> now")

    // Cyrillic Е in the IBAN country code: [A-Z]{2} never matches, the
    // account number leaks wholesale. Fold first → masked.
    val cyrIban = "acct DЕ95370400440532013000 end"
    assert(ibanHits(cyrIban) === 0)
    assert(ibanHits(fold(cyrIban)) === 1)
    assert(masked(fold(cyrIban)) === "acct <IBAN> end")

    // NFKC repairs NEITHER channel — ZWSP/soft-hyphen are format
    // chars, Cyrillic letters are not compatibility forms. This is
    // the reason stripInvisible/foldConfusables exist as separate
    // passes and must be sequenced before the masks.
    val nfkc = Seq("a​b", "а", "a­b").toDF("t")
      .select(graft.plans.NfkcNormalize(col("t"))).collect().map(_.getString(0))
    assert(nfkc(0) === "a​b")
    assert(nfkc(1) === "а")
    assert(nfkc(2) === "a­b")
  }

  test("interaction goldens: hygiene passes × canon keys (dedup identity)") {
    // A doc laundered with BOTH channels (homoglyph о + ZWSP) has a
    // different exact hash, near key, AND sha1 doc id than its clean
    // twin — identical pixels, four distinct identities. The fused
    // hygiene prefix (fold ∘ strip, in either order: the char sets
    // are disjoint, so the passes commute) restores every identity.
    val N = Normalize
    val clean = "The Quick Brown Fox Jumps"
    val dirty = "The Quick Brоwn F​ox Jumps"
    def canonOf(prep: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Seq(clean, dirty).toDF("t").select(
        N.sha256Hex(N.canonExact(prep(col("t")))).as("eh"),
        N.canonNear(prep(col("t")), 500).as("nk"),
        N.sha1DocId(lit("u"), prep(col("t"))).as("did"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val bare = canonOf(identity)
    assert(bare(0)._1 !== bare(1)._1) // exact-dup identity broken
    assert(bare(0)._2 !== bare(1)._2) // near-dup key broken
    assert(bare(0)._3 !== bare(1)._3) // doc id broken
    val hygienic = canonOf(c => N.foldConfusables(N.stripInvisible(c)))
    assert(hygienic(0) === hygienic(1)) // all three identities restored
    // commutativity: strip∘fold ≡ fold∘strip, so pipeline authors may
    // order the two hygiene passes freely
    val both = Seq(dirty).toDF("t").select(
      N.stripInvisible(N.foldConfusables(col("t"))).as("a"),
      N.foldConfusables(N.stripInvisible(col("t"))).as("b"))
      .collect()(0)
    assert(both.getString(0) === both.getString(1))
    assert(both.getString(0) === clean)
  }

  test("domain quality blocklist: rates and threshold on a hand fixture") {
    import spark.implicits._
    // good.com: 2/2 keep; mixed.com: 1/2; spam.com: 0/3
    val df = Seq(
      ("https://good.com/a", true), ("https://good.com/b", true),
      ("https://mixed.com/a", true), ("https://mixed.com/b", false),
      ("https://spam.com/a", false), ("https://spam.com/b", false),
      ("https://spam.com/c", false)).toDF("url", "keep")
    val rows = graft.ops.Domains
      .domainQualityBlocklist(df, "url", "keep", minKeepRateQ = 5000L)
      .collect().map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"),
          r.getAs[Long]("keep_rate_q"), r.getAs[Boolean]("blocked")))).toMap
    assert(rows("good.com") === ((2L, 2L, 10000L, false)))
    assert(rows("mixed.com") === ((2L, 1L, 5000L, false))) // boundary keeps
    assert(rows("spam.com") === ((3L, 0L, 0L, true)))
  }
}
