package graft

import org.apache.spark.sql.functions._

import graft.plans.{GraftFunctions, PhraseHits}

/** The Aho-Corasick phrase-counting kernel: brute-force parity on
  * adversarial strings, the border-free oracle precondition, the SQL
  * surface, and null handling.
  */
class PhraseHitsSpec extends SparkTestBase {
  import spark.implicits._

  /** All occurrences of each phrase (every match position — what AC
    * match-end counting sees), per list.
    */
  private def bruteCounts(text: String, lists: Seq[Seq[String]]): Seq[Int] =
    lists.map(_.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }.sum)

  test("every profile phrase is border-free (the oracle-parity precondition)") {
    for {
      lists <- PhraseHits.Profiles.values
      p <- lists.flatten
    } {
      val borders = (1 until p.length)
        .filter(k => p.take(k) == p.takeRight(k))
      assert(borders.isEmpty,
        s"phrase '$p' has border(s) $borders: match-end counting would " +
          "diverge from the oracle's non-overlapping replace arithmetic")
    }
  }

  test("kernel matches brute-force counting on adversarial inputs") {
    val lists = PhraseHits.Profiles("boilerplate")
    val texts = Seq(
      "",
      "click here to sign up and click here again",
      "privacy policy privacy policy privacy policy",
      "all rights reserved. terms of service. cookie policy!",
      "copyright © 2026 copyright ©",
      "clickhere learn morelearn more", // joined/broken boundaries
      "ünïcode follow us on the fediverse 中文 privacy policy",
      "x" * 5000 + "subscribe to our newsletter")
    val got = texts.toDF("t")
      .select(PhraseHits(col("t"), "boilerplate").as("h"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(got.toSeq === texts.map(t => bruteCounts(t, lists)))
  }

  test("seeded fuzz: kernel matches brute force on phrase-fragment soup") {
    val lists = PhraseHits.Profiles("boilerplate")
    val phrases = lists.flatten
    // pieces chosen to stress fail links: full phrases, proper prefixes
    // (walk deep then fail), suffixes, overlapping glue, unicode noise
    val pieces: Vector[String] =
      (phrases ++ phrases.map(p => p.take(p.length / 2)) ++
        phrases.map(p => p.drop(p.length / 2)) ++
        Seq(" ", "", "x", "click", "policy", "©", "中", "\n")).toVector
    val rnd = new scala.util.Random(42)
    val texts = (1 to 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString
    }
    val got = texts.toDF("t")
      .select(PhraseHits(col("t"), "boilerplate").as("h"))
      .collect().map(_.getSeq[Int](0).toSeq)
    texts.zip(got).foreach { case (t, counts) =>
      assert(counts === bruteCounts(t, lists), s"mismatch on: $t")
    }
  }

  test("SQL surface, null propagation, and non-literal profile rejection") {
    GraftFunctions.register(spark)
    val viaSql = spark
      .sql("SELECT phrase_hits('click here or click here', 'boilerplate')")
      .collect().head.getSeq[Int](0)
    assert(viaSql === Seq(2, 0))
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(PhraseHits(col("t"), "boilerplate")).collect().head
    assert(nullRow.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT phrase_hits('x', concat('boiler', 'plate'))").collect()
    }
  }
}
