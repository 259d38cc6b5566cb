package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Invariants of the stage-2→7 graded chain (`q_pipeline_graded_full` /
  * `q_pipeline_graded_shards`) on a corpus where the late stages really
  * fire: the sf* fixtures keep almost nothing past the language gate, so
  * this spec drives a crafted corpus with ~241 surviving docs, both
  * token-length gates firing, an exact-duplicate pair, and three shards
  * of sequence-assigned output.
  */
class PipelineGradedFullSpec extends SparkTestBase {

  import spark.implicits._

  private val En = graft.text.LangId.En

  /** Injective digits→letters spelling of an index ("123" -> "bcd"). */
  private def letters(i: Int): String =
    i.toString.map(c => ('a' + (c - '0')).toChar)

  private val content = Vector("river", "mountain", "library", "garden",
    "window", "evening", "teacher", "journey", "harbor", "winter",
    "meadow", "lantern", "orchard", "violin", "compass", "granite",
    "thimble", "walnut", "saffron", "ember", "willow", "quarry",
    "parcel", "summit", "harvest", "timber", "canvas", "marble",
    "anchor", "beacon")

  /** 25 words, ~1/3 English stopwords (lang_score saturates at 1.0),
    * unique leading word so near-dup keys never collide across docs.
    */
  private def keptText(i: Int): String = {
    val sb = new StringBuilder(s"doc${letters(i)}")
    (0 until 24).foreach { j =>
      sb += ' '
      if (j % 3 == 0) sb ++= En((i + j) % En.size)
      else sb ++= content((i * 7 + j * 5) % content.size)
    }
    sb.result()
  }

  /** 8 words: passes every stage-2..5 gate (3/8 stopwords, alpha-heavy)
    * but tokenizes to 8 < 10 tokens → F27 too_few_tokens.
    */
  private def tooFewText(i: Int): String =
    s"doc${letters(i)} the river is deep and cold"

  /** ~3001 words alternating stopword / per-position-unique word:
    * clears word_count≤5000, repetition≈0.5, char_len≪100k — but
    * tokenizes past 2048 → F28 too_many_tokens.
    */
  private def tooManyText(i: Int): String = {
    val sb = new StringBuilder(s"doc${letters(i)}")
    (0 until 3000).foreach { j =>
      sb += ' '
      if (j % 2 == 0) sb ++= En((i + j) % En.size)
      else { sb += 'w'; sb ++= letters(j) }
    }
    sb.result()
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-graded-full").toString
    val dup = keptText(7777)
    val rows =
      (0 until 240).map(i => (i.toLong, keptText(i))) ++
        Seq((240L, dup), (241L, dup)) ++
        (242 until 245).map(i => (i.toLong, tooFewText(i))) ++
        Seq((245L, tooManyText(245)))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val full =
    PipelineQueries.pipelineGradedFull(spark, dir).collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)),
        r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .sortBy(_._1)

  test("stage interactions: dup + both token-length gates fire, rest kept") {
    val reasons = full.groupBy(_._2).view.mapValues(_.length).toMap
    assert(reasons(None) === 241)
    assert(reasons(Some("exact_duplicate")) === 1)
    assert(reasons(Some("too_few_tokens")) === 3)
    assert(reasons(Some("too_many_tokens")) === 1)
    // keep-first: the FIRST copy of the dup pair survives
    assert(full.find(_._1 === 240L).get._2 === None)
    assert(full.find(_._1 === 241L).get._2 === Some("exact_duplicate"))
  }

  test("stage-7 sequence: contiguous over kept rows in doc_id order, 3 shards") {
    val kept = full.filter(_._2.isEmpty)
    assert(kept.map(_._4.get).toSeq === (0L until 241L))
    kept.foreach { case (_, _, _, Some(seq), Some(shard)) =>
      assert(shard === seq / 100)
    }
    assert(kept.map(_._5.get).distinct.toSeq.sorted === Seq(0L, 1L, 2L))
    // dropped rows never reach stage 7
    full.filter(_._2.nonEmpty).foreach { r =>
      assert(r._4.isEmpty && r._5.isEmpty, s"dropped row sharded: $r")
    }
  }

  test("stage-6 reasons land only on rows stages 2-5 kept") {
    val graded25 = PipelineQueries.pipelineGraded(spark, dir)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    full.filter(r => r._2.exists(_.endsWith("_tokens"))).foreach { r =>
      assert(graded25(r._1) === None,
        s"stage-6 reason ${r._2} overwrote a stage-2..5 drop on doc ${r._1}")
    }
  }

  test("shard manifest matches the per-doc assignment exactly") {
    val manifest = PipelineQueries.pipelineGradedShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    assert(manifest.map(m => (m._1, m._2)).toSeq ===
      Seq((0L, 100L), (1L, 100L), (2L, 41L)))
    val kept = full.filter(_._2.isEmpty)
    manifest.foreach { case (shard, _, totalTokens, name) =>
      assert(name === f"train_shard_$shard%05d.jsonl")
      assert(totalTokens ===
        kept.filter(_._5.contains(shard)).map(_._3).sum)
    }
  }
}
