package graft

import org.apache.spark.sql.functions._

import graft.ops.Ams

/** AMS tug-of-war F2: JVM replay of the md5 sign arithmetic,
  * mergeability by addition, and the estimator's concentration on a
  * deterministic corpus (the guarantee the sketch is FOR).
  */
class AmsSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    String.format("%032x", new java.math.BigInteger(1, md.digest(s.getBytes("UTF-8"))))
  }
  private def signRef(j: Int, tok: String): Long =
    (java.lang.Long.parseLong(md5hex(s"$j:$tok").substring(0, 1), 16) % 2) * 2 - 1

  private val corpus: Seq[(String, String)] =
    (0 until 400).map(i => ("g", s"tok${i % 50}")) ++
      (0 until 100).map(i => ("h", s"tok${i % 5}"))

  test("sums replay exactly from the JVM md5 reference, per group") {
    val got = Ams.sketch(corpus.toDF("source", "tok"), "source", "tok")
      .collect().map(r => r.getString(0) -> (0 until Ams.K).map(j => r.getLong(j + 1)))
      .toMap
    Seq("g", "h").foreach { grp =>
      val toks = corpus.filter(_._1 == grp).map(_._2)
      (0 until Ams.K).foreach { j =>
        assert(got(grp)(j) == toks.map(signRef(j, _)).sum, s"$grp s$j")
      }
    }
  }

  test("lower-median estimate concentrates around exact F2") {
    val est = Ams.estimateF2(Ams.sketch(corpus.toDF("source", "tok"), "source", "tok"))
      .select("source", "est_f2").as[(String, Long)].collect().toMap
    Seq("g", "h").foreach { grp =>
      val counts = corpus.filter(_._1 == grp).groupBy(_._2).map(_._2.size.toLong)
      val f2 = counts.map(c => c * c).sum
      assert(est(grp) >= f2 / 5 && est(grp) <= f2 * 5,
        s"$grp: est ${est(grp)} vs exact $f2")
    }
  }

  test("sketches merge by addition across splits") {
    val (a, b) = corpus.splitAt(250)
    val whole = Ams.sketch(corpus.toDF("source", "tok"), "source", "tok")
      .collect().map(r => r.getString(0) -> (1 to Ams.K).map(r.getLong)).toMap
    val merged = Ams.sketch(a.toDF("source", "tok"), "source", "tok")
      .unionByName(Ams.sketch(b.toDF("source", "tok"), "source", "tok"))
      .groupBy("source")
      .agg(sum("s0").as("s0"), (1 until Ams.K).map(j => sum(s"s$j").as(s"s$j")): _*)
      .collect().map(r => r.getString(0) -> (1 to Ams.K).map(r.getLong)).toMap
    assert(merged == whole)
  }
}
