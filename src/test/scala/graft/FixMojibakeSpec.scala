package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.plans.FixMojibake

/** Kernel pins for the ftfy-style encoding repair: exact inversion of
  * UTF-8-read-as-Latin-1 and UTF-8-read-as-cp1252 damage (single and
  * nested), and — just as load-bearing — the DO-NO-HARM side: clean
  * text of every script must pass through untouched, because the
  * kernel runs unconditionally over the corpus.
  */
class FixMojibakeSpec extends AnyFunSuite {

  private def fix(s: String): String =
    FixMojibake.fix(UTF8String.fromString(s)).toString

  private def corrupt(s: String, charset: String): String =
    new String(s.getBytes("UTF-8"), charset)

  test("single latin-1 mojibake inverts exactly") {
    val clean = "café naïve Müller – déjà vu"
    assert(fix(corrupt(clean, "ISO-8859-1")) === clean)
  }

  test("single cp1252 mojibake inverts exactly (remap table rows)") {
    // €, ™, “, …, œ, Š exercise the 0x80–0x9F remap entries that
    // latin-1 would render as C1 controls. (Chars whose UTF-8 bytes
    // include 0x81/8D/8F/90/9D — e.g. the RIGHT double quote ” =
    // E2 80 9D — are excluded BY THE DAMAGE MODEL, not by us: a
    // cp1252 reader replaces those five undefined bytes with U+FFFD,
    // destroying the information. See the lossy-byte test below.)
    val clean = "price €99 — “smart… quotes™ œuvre Škoda"
    assert(fix(corrupt(clean, "windows-1252")) === clean)
  }

  test("cp1252-undefined bytes are lossy: kernel does no harm") {
    // ” encodes to E2 80 9D; byte 0x9D is undefined in cp1252, so the
    // upstream mis-read already replaced it with U+FFFD — inversion is
    // impossible and the kernel must leave the wreck untouched rather
    // than guess
    val wreck = corrupt("a ”quote", "windows-1252")
    assert(wreck.contains('�'))
    assert(fix(wreck) === wreck)
  }

  test("double and triple encoding unwind across rounds") {
    val clean = "résumé §5 ±3°"
    val twice = corrupt(corrupt(clean, "windows-1252"), "windows-1252")
    assert(fix(twice) === clean)
    val thrice = corrupt(twice, "ISO-8859-1")
    assert(fix(thrice) === clean)
  }

  test("clean text is untouched, including non-Latin scripts") {
    val cleans = Seq("plain ascii", "café au lait", "日本語のテキスト",
      "текст на русском", "mixed 中文 & English", "emoji 🎉 stays",
      "€ already fine — honest", "naïve café déjà vu")
    cleans.foreach { s =>
      assert(fix(s) === s, s"must not mangle: $s")
    }
  }

  test("ascii fast path returns the input object unallocated") {
    val in = UTF8String.fromString("pure ascii, no work to do")
    assert(FixMojibake.fix(in) eq in)
  }

  test("mojibake embedded in ascii context repairs in place") {
    val clean = "Die Größe von München ist 310 km²"
    val dirty = corrupt(clean, "ISO-8859-1")
    assert(dirty.contains("GrÃ¶Ãe")) // the familiar wreck
    assert(fix(dirty) === clean)
  }

  test("lone high bytes that are not valid UTF-8 stay put") {
    // a real Latin-1 document (NOT mojibake): é is one char, and the
    // byte string c-a-f-0xE9 is malformed UTF-8 -> must not change
    assert(fix("café") === "café")
    assert(fix("é") === "é")
    assert(fix("100° + ±5") === "100° + ±5")
  }

  test("sql surface: registered function repairs and is null-safe") {
    val spark = TestSpark.spark
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val clean = "smart “quotes… cost €5"
    val df = Seq((1L, corrupt(clean, "windows-1252")), (2L, null))
      .toDF("id", "t")
    df.createOrReplaceTempView("moji_t")
    val rows = spark.sql(
      "SELECT id, fix_mojibake(t) AS f FROM moji_t ORDER BY id").collect()
    assert(rows(0).getString(1) === clean)
    assert(rows(1).isNullAt(1))
  }
}
