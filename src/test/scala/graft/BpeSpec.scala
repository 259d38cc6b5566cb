package graft

import graft.text.Bpe

/** BPE vocabulary induction: merge rule, determinism, lossless
  * segmentation, compression.
  */
class BpeSpec extends SparkTestBase {

  private val counts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("first merge is the most frequent weighted pair; greedy left-to-right") {
    // "aaab" x10: (a,a) weight 20 beats (a,b) weight 10
    val m = Bpe.trainFromCounts(Seq(("aaab", 10L)), numMerges = 1)
    assert(m.merges === Seq(("a", "a")))
    // greedy scan after the merge: aa | a | b (no overlapping re-merge)
    val m2 = Bpe.trainFromCounts(Seq(("aaab", 10L)), numMerges = 2)
    assert(m2.encodeWord("aaab").mkString("|") === "aa|ab" ||
      m2.encodeWord("aaab").length <= 3)
  }

  test("training is deterministic and independent of input order") {
    val a = Bpe.trainFromCounts(counts, numMerges = 20)
    val b = Bpe.trainFromCounts(counts.reverse, numMerges = 20)
    assert(a.merges === b.merges)
    // ("e","s") dominates: weight 6 (newest) + 3 (widest) = 9
    assert(a.merges.head === (("e", "s")))
  }

  test("segmentation is lossless and compresses the corpus") {
    val model = Bpe.trainFromCounts(counts, numMerges = 10)
    counts.foreach { case (w, _) =>
      assert(model.encodeWord(w).mkString === w, w)
    }
    val before = counts.map { case (w, n) => w.length * n }.sum
    val after = counts.map { case (w, n) => model.encodeWord(w).length * n }.sum
    assert(after < before)
    // vocab contains every merge output exactly once
    assert(model.vocab.distinct === model.vocab)
    assert(model.merges.map { case (x, y) => x + y }.forall(model.vocab.contains))
  }

  test("end-to-end on the documents table: stable model, lossless doc encoding") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.train(docs, "text", numMerges = 50)
    val m2 = Bpe.train(docs.repartition(7), "text", numMerges = 50)
    assert(m1.merges === m2.merges, "model must not depend on partitioning")
    assert(m1.merges.size === 50)
    // encoding a sample doc loses nothing
    import org.apache.spark.sql.functions._
    val sample = docs.filter(col("text").isNotNull).select("text")
      .limit(5).collect().map(_.getString(0))
    sample.foreach { t =>
      val words = t.split("\\s+").filter(_.nonEmpty)
      val enc = words.flatMap(m1.encodeWord)
      assert(enc.mkString === words.mkString, "lossless concat")
    }
  }
}
