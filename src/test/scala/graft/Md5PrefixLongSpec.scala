package graft

import org.apache.spark.sql.functions._

/** Parity anchor for the fused md5-prefix hash kernel
  * ([[graft.plans.Md5PrefixLong]]): bit-equality against the
  * declarative `conv(substring(md5(concat(prefix, s)), 1, n), 16, 10)`
  * composition it replaced — the exact fragment the DuckDB oracle
  * replays as `CAST('0x' || substr(md5(x), 1, n) AS BIGINT)` — across
  * every hexLen the engine uses (1 AMS, 2 DSIR, 4 Count-Min, 13 KMV,
  * 15 HLL/SimHash), with and without the "j:" seed prefix, over
  * unicode/empty/long strings and a seeded fuzz sweep.
  */
class Md5PrefixLongSpec extends SparkTestBase {

  private val fixtures: Seq[String] = Seq(
    "", " ", "a", "the quick brown fox", "日本語テキスト",
    "🎉 astral", "z̀aĺgo", "line\nbreak\ttab",
    "x" * 10000, "nan", "0", "deadbeef",
    "\u202ertl\u202c", "&amp;&lt;", "multi word token stream")

  private def fuzz(n: Int): Seq[String] = {
    val r = new scala.util.Random(1405)
    (0 until n).map { _ =>
      val len = r.nextInt(40)
      (0 until len).map(_ => (32 + r.nextInt(90)).toChar).mkString
    }
  }

  test("kernel == conv(substring(md5)) for every engine hexLen, all prefixes") {
    import spark.implicits._
    val df = (fixtures ++ fuzz(500)).toDF("s")
    for (hexLen <- Seq(1, 2, 4, 8, 13, 15); prefix <- Seq("", "0:", "3:", "15:")) {
      val reference =
        conv(substring(md5(concat(lit(prefix), col("s"))), 1, hexLen), 16, 10)
          .cast("long")
      val bad = df
        .select(col("s"), reference.as("want"),
          graft.plans.Md5PrefixLong(col("s"), prefix, hexLen).as("got"))
        .filter(col("want") =!= col("got"))
        .count()
      assert(bad === 0L, s"hexLen=$hexLen prefix='$prefix'")
    }
  }

  test("null in, null out; range stays within hexLen nibbles") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "x"))
      .toDF("id", "s")
    val out = df.select(col("id"),
        graft.plans.Md5PrefixLong(col("s"), 4).as("h"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(out(1L) == null)
    assert(out(2L) != null)
    val max16 = (fixtures ++ fuzz(200)).toDF("s")
      .select(max(graft.plans.Md5PrefixLong(col("s"), 4)).as("m"))
      .head().getLong(0)
    assert(max16 <= 0xffffL && max16 >= 0L)
  }

  test("SQL registration round-trips through the function registry") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    Seq("abc").toDF("s").createOrReplaceTempView("t_md5pfx")
    val got = spark.sql(
      "SELECT md5_prefix_long(s, '3:', 4) AS h FROM t_md5pfx").head().getLong(0)
    val want = Seq("abc").toDF("s")
      .select(conv(substring(md5(concat(lit("3:"), col("s"))), 1, 4), 16, 10)
        .cast("long").as("h")).head().getLong(0)
    assert(got === want)
  }
}
