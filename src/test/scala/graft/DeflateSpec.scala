package graft

import org.apache.spark.sql.functions._

import graft.plans.{DeflateLength, GraftFunctions}

/** The DEFLATE compressibility kernel: reference parity, signal
  * direction, SQL surface, and null handling.
  */
class DeflateSpec extends SparkTestBase {
  import spark.implicits._

  private def referenceLen(s: String): Int = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.finish()
    val buf = new Array[Byte](1 << 16)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("kernel matches a reference java.util.zip computation byte-for-byte") {
    val texts = Seq("", "a", "hello world", "spam " * 200,
      "Ünïcödé — 中文 text with varied content 12345",
      (1 to 100).map(i => s"word$i").mkString(" "))
    val got = texts.toDF("t")
      .select(DeflateLength(col("t")).as("n")).collect().map(_.getInt(0))
    assert(got.toSeq === texts.map(referenceLen))
  }

  test("repetitive text compresses far below varied text") {
    val rep = "buy now click here " * 50
    val varied = (1 to 50).map(i => s"sentence$i about topic$i today${i * 7}")
      .mkString(" ")
    val rows = Seq(("rep", rep), ("varied", varied)).toDF("k", "t")
      .select(col("k"),
        (DeflateLength(col("t")).cast("double") /
          expr("octet_length(t)")).as("ratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("rep") < 0.10, s"repetitive ratio ${rows("rep")}")
    assert(rows("varied") > 2 * rows("rep"),
      s"no separation: $rows")
  }

  test("SQL surface and null propagation") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT deflate_len('hello world hello world')")
      .collect().head.getInt(0)
    assert(viaSql === referenceLen("hello world hello world"))
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(DeflateLength(col("t"))).collect().head
    assert(nullRow.isNullAt(0))
  }
}
