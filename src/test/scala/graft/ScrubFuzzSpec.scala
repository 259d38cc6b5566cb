package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Seeded adversarial-Unicode fuzz of the dual-engine twin scrub — the
  * non-BMP removal + whitespace-family collapse that underpins every
  * hash-exact graded twin (`q_token_ids`, `q_token_fertility`,
  * `q_pipeline_graded_full`). The Spark side applies the literal Java
  * regexes; the oracle side is DuckDB RE2. This spec pins the Spark
  * result against an executable codepoint-level model of what RE2 does
  * with the same two patterns: drop codepoints ≥ U+10000, then collapse
  * runs of the class members to one space. The model's member set was
  * validated against a real DuckDB over every boundary codepoint
  * (0x00–0xFF, 0x167F–0x1681, 0x180E, 0x1FFF–0x206F, 0x2FFF–0x3001,
  * 0xFEFF, 0xFFFD): zero mismatches.
  *
  * The fuzz found a REAL divergence when first written: Java `\s`
  * includes vertical tab 0x0B, RE2's does not — fixed by adding
  * `\x{0B}` explicitly to both engines' class (r9). 0x0B is now a
  * permanent fixture below.
  *
  * Domain note: the input space is valid-UTF-8 strings (all codepoints
  * except surrogates) because both engines read the same parquet — a
  * lone surrogate cannot survive UTF-8 encoding, so Java-only surrogate
  * semantics are out of scope by construction.
  */
class ScrubFuzzSpec extends SparkTestBase {

  import spark.implicits._

  /** RE2's `\s` = [\t\n\f\r ] (NO \x0B — that is the Java divergence
    * the explicit \x{0B} member papers over) plus the literal class.
    */
  private val WsSet: Set[Int] =
    Set(0x09, 0x0A, 0x0C, 0x0D, 0x20, 0x0B) ++ (0x1C to 0x1F) ++
      Set(0x85, 0xA0, 0x1680) ++ (0x2000 to 0x200A) ++
      Set(0x2028, 0x2029, 0x202F, 0x205F, 0x3000)

  /** The RE2 replay: codepoint filter, then run-collapse. Removing a
    * non-BMP char BETWEEN two ws runs merges them — order matters and
    * matches the two sequential regexp_replace calls.
    */
  private def modelScrub(s: String): String = {
    val cps = s.codePoints.toArray.filter(_ < 0x10000)
    val sb = new StringBuilder
    var i = 0
    while (i < cps.length) {
      if (WsSet(cps(i))) {
        sb += ' '
        while (i < cps.length && WsSet(cps(i))) i += 1
      } else { sb.appendAll(Character.toChars(cps(i))); i += 1 }
    }
    sb.result()
  }

  private def sparkScrub(rows: Seq[String]): Seq[String] =
    rows.toDF("text").select(
      regexp_replace(
        regexp_replace(coalesce(col("text"), lit("")),
          lit("[\\x{10000}-\\x{10FFFF}]"), lit("")),
        lit(PipelineQueries.TokenScrubWs), lit(" ")).as("t"))
      .collect().map(_.getString(0)).toSeq

  // every class member, its neighbors, combining marks, ZWJ/ZWNJ
  // sequences, bidi controls, format chars, non-BMP, and ordinary text
  private val alphabet: Vector[String] = {
    val members = WsSet.toVector.sorted.map(cp => new String(Character.toChars(cp)))
    val boundary = Vector(0x08, 0x0E, 0x1B, 0x21, 0x7F, 0x84, 0x86, 0x9F,
      0xA1, 0x167F, 0x1681, 0x180E, 0x1FFF, 0x200B, 0x200C, 0x200D,
      0x200E, 0x200F, 0x2027, 0x202A, 0x202E, 0x2030, 0x205E, 0x2060,
      0x2066, 0x2069, 0x2FFF, 0x3001, 0xFE0F, 0xFEFF, 0xFFFD, 0xFFFF,
      0x0300, 0x0301, 0x20D0, 0x0645, 0x4E2D, 0x1F600, 0x1F3FD, 0x10000,
      0x10FFFF, 0xE0001).map(cp => new String(Character.toChars(cp)))
    val text = Vector("a", "Z", "9", "'s", "don't", "​", "é",
      "👩‍💻", " ", "\t\t", "  ")
    members ++ boundary ++ text
  }

  test("seeded fuzz: Spark scrub equals the RE2 model on 500 adversarial strings") {
    val rnd = new scala.util.Random(20260814L)
    val cases = Vector.fill(500) {
      val n = 1 + rnd.nextInt(40)
      Vector.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    val got = sparkScrub(cases)
    cases.zip(got).foreach { case (in, out) =>
      val want = modelScrub(in)
      assert(out === want,
        s"scrub divergence on ${in.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  /** The BPE/langid twins' class `[\x00-\x1F ... \s]`: its \x00-\x1F
    * range covers 0x0B on BOTH engines, so the Java-vs-RE2 \s delta is
    * absorbed — this fuzz pins that argument stays true.
    */
  private val BpeWsSet: Set[Int] =
    (0x00 to 0x1F).toSet ++ Set(0x20, 0x85, 0xA0, 0x1680) ++
      (0x2000 to 0x200A) ++ Set(0x2028, 0x2029, 0x202F, 0x205F, 0x3000)

  private def modelBpeScrub(s: String): String = {
    val cps = s.codePoints.toArray.filter(_ < 0x10000)
    val sb = new StringBuilder
    var i = 0
    while (i < cps.length) {
      if (BpeWsSet(cps(i))) {
        sb += ' '
        while (i < cps.length && BpeWsSet(cps(i))) i += 1
      } else { sb.appendAll(Character.toChars(cps(i))); i += 1 }
    }
    sb.result()
  }

  test("seeded fuzz: BPE-twin scrub equals its RE2 model") {
    val rnd = new scala.util.Random(4142136L)
    val cases = Vector.fill(300) {
      val n = 1 + rnd.nextInt(40)
      Vector.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    val got = cases.toDF("text").select(
      regexp_replace(
        regexp_replace(coalesce(col("text"), lit("")),
          lit("[\\x{10000}-\\x{10FFFF}]"), lit("")),
        lit(graft.queries.DocQueries.BpeScrubWs), lit(" ")).as("t"))
      .collect().map(_.getString(0)).toSeq
    cases.zip(got).foreach { case (in, out) =>
      assert(out === modelBpeScrub(in),
        s"BPE scrub divergence on ${in.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("permanent fixtures: the 0x0B find and the run-merge-across-nonBMP case") {
    val vt = "a\u000bb"                       // the Java-\s-only member
    val emoji = new String(Character.toChars(0x1F600))
    val acrossNonBmp = "a " + emoji + "\u2028 b" // ws, non-BMP, ws -> ONE space
    val mixedRun = "x\u00a0\u1680\u3000\ty"    // one collapsed run
    val formatChars = "\u200b\u200d\ufeff"      // NOT whitespace: survive
    val fixtures = Seq(vt, acrossNonBmp, mixedRun, formatChars)
    assert(sparkScrub(fixtures) === fixtures.map(modelScrub))
    assert(modelScrub(vt) === "a b")
    assert(modelScrub(acrossNonBmp) === "a b")
    assert(modelScrub(mixedRun) === "x y")
    assert(modelScrub(formatChars) === formatChars)
  }
}
