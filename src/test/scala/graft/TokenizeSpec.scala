package graft

import org.apache.spark.sql.functions._

import graft.text.Tokenize

/** The native tokenizer kernel against the regex grammar spec: the udf
  * form IS the spec (GPT-2-style pre-tokenizer pattern), the kernel must
  * be id-identical on every input — edge fixtures and seeded fuzz.
  */
class TokenizeSpec extends SparkTestBase {
  import spark.implicits._

  private def both(texts: Seq[String]): Unit = {
    val df = texts.toDF("t")
    val udfIds = df.select(Tokenize.tokenize(col("t")).getField("_1")).collect()
      .map(_.getSeq[Int](0).toList)
    val natIds = df.select(Tokenize.native(col("t")).getField("input_ids")).collect()
      .map(_.getSeq[Int](0).toList)
    texts.indices.foreach { i =>
      assert(natIds(i) === udfIds(i), s"input ${texts(i).take(80).replace("\n", "\\n")}")
    }
  }

  test("kernel matches the regex form on adversarial fixtures") {
    both(Seq(
      "", " ", "   ", "\t", " \t ", "a", " a", "a ", "  a  b  ",
      "don't you'll we're I've he'd she's 'tis 'Sup can'T",
      "'", "''", "'l", "'ls", " 's", "' s", "don''t",
      "abc123def", "3.14 isn't -42", "a-b_c d!e?f",
      "tabs\tbetween\twords", "mixed \t \n ws\f\r runs",
      "trailing space ", " leading", "multi  spaces   here",
      "ünïcödé wörds", "日本語テキスト with ascii", "Ⅷ ① ² digits?",
      "emoji 🎉 inside", "a🎉b", "🎉🎉",
      "price: $1,234.56 (10%)", "a'b'c's", "x''y",
      "new\nline\nand more", "\na", "a\n", " \n a"))
  }

  test("kernel matches the regex form on seeded fuzz over a nasty alphabet") {
    val alphabet = "ab 'stredvmy01九Ⅷ²  \t\n.,!-🎉ü"
    val rnd = new scala.util.Random(1234)
    val inputs = (1 to 300).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    both(inputs.distinct)
  }

  test("native output contract: mask all ones, n_tokens = |ids|, ids in vocab range") {
    val rows = Seq("don't stop me now 123 !!", "").toDF("t")
      .select(Tokenize.native(col("t")).as("tok")).select("tok.*").collect()
    rows.foreach { r =>
      val ids = r.getSeq[Int](0)
      val mask = r.getSeq[Int](1)
      assert(r.getInt(2) === ids.length)
      assert(mask === Seq.fill(ids.length)(1))
      assert(ids.forall(id => id >= Tokenize.IdOffset &&
        id < Tokenize.IdOffset + Tokenize.VocabSize))
    }
  }
}
