package graft

import org.apache.spark.sql.functions._

import graft.ops.Shard

/** Deterministic epoch shuffle: per-epoch permutations, reproducibility
  * across physical layouts, and the curriculum-bucket ordering contract.
  */
class EpochShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 500L).toDF("doc_id")

  test("each epoch is a full permutation with positions 0..n-1") {
    val out = Shard.epochShuffle(docs, "doc_id", epochs = 3)
      .select("epoch", "doc_id", "position")
      .as[(Int, Long, Long)].collect()
    assert(out.length === 1500)
    (1 to 3).foreach { e =>
      val ep = out.filter(_._1 == e)
      assert(ep.map(_._2).sorted.toSeq === (0L until 500L))
      assert(ep.map(_._3).sorted.toSeq === (0L until 500L))
    }
  }

  test("epochs are DIFFERENT permutations; layout does not matter") {
    val a = Shard.epochShuffle(docs, "doc_id", epochs = 2)
      .select("epoch", "doc_id", "position")
      .as[(Int, Long, Long)].collect().toSet
    // a hash-derived shuffle must actually shuffle: epoch 1 and 2 agree
    // on almost no positions, and neither matches the identity order
    val e1 = a.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    val e2 = a.filter(_._1 == 2).map(t => t._2 -> t._3).toMap
    val agree = (0L until 500L).count(id => e1(id) == e2(id))
    assert(agree < 25, s"epochs nearly identical: $agree/500 fixed points")
    assert((0L until 500L).count(id => e1(id) == id) < 25)
    // physical layout invariance: 7-partition input, same permutations
    val b = Shard.epochShuffle(docs.repartition(7), "doc_id", epochs = 2)
      .select("epoch", "doc_id", "position")
      .as[(Int, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("curriculum column orders buckets first, shuffles within each") {
    val staged = docs.withColumn("stage",
      when(col("doc_id") < 250L, "a_easy").otherwise("b_hard"))
    val out = Shard.epochShuffle(staged, "doc_id", epochs = 1,
      curriculumCol = Some("stage"))
      .select("doc_id", "stage", "position")
      .as[(Long, String, Long)].collect()
    val easy = out.filter(_._2 == "a_easy").map(_._3)
    val hard = out.filter(_._2 == "b_hard").map(_._3)
    // every easy doc trains before every hard doc...
    assert(easy.max < hard.min)
    // ...but within a bucket the order is shuffled, not by id
    val easyByPos = out.filter(_._2 == "a_easy").sortBy(_._3).map(_._1)
    assert(easyByPos.toSeq !== easyByPos.sorted.toSeq)
  }
}
