package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Filters, Score}
import graft.text.{Normalize, TextMetrics}

/** FIXTURES.md §3 drop-reason, dedup, and scoring cases. */
class FiltersDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def prefilterReason(text: String): Option[String] = {
    val df = Seq(Option(text)).toDF("text")
      .withColumn("text_norm", Normalize.normalizeText(col("text")))
      .withColumn("char_len", TextMetrics.charLen(col("text_norm")))
      .withColumn("word_count", TextMetrics.wordCount(col("text_norm")))
    val out = Filters.applyRules(df, Filters.prefilterRules(
      col("text"), col("text_norm"), col("char_len"), col("word_count")))
    Option(out.select("drop_reason").collect()(0).getString(0))
  }

  test("F1-F8 prefilter reasons (first-match-wins order)") {
    assert(prefilterReason(null).contains("missing"))
    assert(prefilterReason("\t\n   ").contains("empty_after_clean"))
    assert(prefilterReason("N/A").contains("null_like"))
    assert(prefilterReason("123.45-678").contains("numeric_like"))
    assert(prefilterReason("hello there").contains("too_short_chars"))
    assert(prefilterReason("antidisestablishmentarianism").contains("too_short_words"))
    assert(prefilterReason("x y " * 50001).contains("too_long"))
    assert(prefilterReason("this is a perfectly fine document with words").isEmpty)
    // numeric_like beats too_short_chars (earlier rule wins)
    assert(prefilterReason("123").contains("numeric_like"))
  }

  test("kept/dropped partition the input disjointly") {
    val df = Seq(Some("good document with enough words to pass all the filters easily"),
      None, Some("123")).toDF("text")
      .withColumn("text_norm", Normalize.normalizeText(col("text")))
      .withColumn("char_len", TextMetrics.charLen(col("text_norm")))
      .withColumn("word_count", TextMetrics.wordCount(col("text_norm")))
    val out = Filters.applyRules(df, Filters.prefilterRules(
      col("text"), col("text_norm"), col("char_len"), col("word_count"))).cache()
    assert(Filters.kept(out).count() + Filters.dropped(out).count() == df.count())
  }

  test("D1 exact dedup: keep first by ingest_seq, later rows point at it") {
    val df = Seq(
      (1L, "  Hello   WORLD  "),
      (2L, "hello world"),
      (3L, "different doc"),
      (4L, "HELLO WORLD")
    ).toDF("doc_id", "text").withColumn("ingest_seq", col("doc_id"))
    val out = Dedup.exactDedup(df, textCol = "text")
      .select("doc_id", "is_dup_exact", "dup_of", "drop_reason")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(1))
    assert(out(2L).getBoolean(1) && out(2L).getString(2) == "1")
    assert(out(4L).getBoolean(1) && out(4L).getString(2) == "1")
    assert(!out(3L).getBoolean(1))
    assert(out(2L).getString(3) == "exact_duplicate")
  }

  test("D2 near dedup: 200+ char docs sharing 500-char prefix; short docs exempt") {
    val longPrefix = "a b c d e f g h i j " * 30 // 600 chars canon
    val df = Seq(
      (1L, longPrefix + "tail one"),
      (2L, longPrefix + "tail two"),
      (3L, "short short short"), // <200 canon: exempt
      (4L, "short short short x") // <200: exempt even though similar
    ).toDF("doc_id", "text").withColumn("ingest_seq", col("doc_id"))
    val out = Dedup.dedupStage(df, textCol = "text")
      .select("doc_id", "is_dup_exact", "is_dup_near", "drop_reason")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(2))
    assert(out(2L).getBoolean(2) && out(2L).getString(3) == "near_duplicate")
    assert(!out(3L).getBoolean(2) && !out(4L).getBoolean(2))
  }

  test("D2 precedence: exact duplicates keep their exact reason") {
    val body = "w x y z " * 80 // 640 chars: shares the full 500-char near key
    val df = Seq((1L, body), (2L, body), (3L, body + "tail"))
      .toDF("doc_id", "text").withColumn("ingest_seq", col("doc_id"))
    val out = Dedup.dedupStage(df, textCol = "text")
      .select("doc_id", "drop_reason", "dup_of")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getString(1) == "exact_duplicate")
    assert(out(3L).getString(1) == "near_duplicate")
    assert(out(3L).getString(2) == "1")
  }

  test("dedupStage narrow-shuffle form is value-identical to the composed form") {
    // real corpus + a doomed row + exact/near planted dups; doomed rows
    // exercise the doomed-sorts-last rule in BOTH windows
    val longPrefix = "p q r s t u v w x y " * 30
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(200)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, longPrefix + "tail a"),
        (100002L, longPrefix + "tail b"),
        (100003L, longPrefix + "tail a")
      ).toDF("doc_id", "text"))
      .withColumn("ingest_seq", col("doc_id"))
      // doom one of the planted dups pre-dedup (first-occurrence row!)
      .withColumn("drop_reason",
        when(col("doc_id") === 100001L, lit("too_short")))
    val cols = Seq("doc_id", "dedup_id", "exact_hash", "is_dup_exact",
      "is_dup_near", "dup_of", "drop_reason", "near_key", "exact_canon_text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fused = canon(Dedup.dedupStage(docs, textCol = "text"))
    val composed = canon(Dedup.nearDedup(
      Dedup.exactDedup(docs, textCol = "text"), textCol = "text"))
    assert(fused.keySet === composed.keySet)
    fused.keySet.foreach { id =>
      assert(fused(id) === composed(id), s"doc $id")
    }
    // the doomed first-occurrence must not have shadowed the kept row
    assert(fused(100002L)(3) === false, "kept row wrongly flagged")
    // schema parity is positional, not just by-name: positional
    // consumers (parquet schema diffs, select-by-index) see one order
    assert(Dedup.dedupStage(docs, textCol = "text").columns.toSeq ===
      Dedup.nearDedup(Dedup.exactDedup(docs, textCol = "text"),
        textCol = "text").columns.toSeq)
  }

  test("Q1 quality score: pinned arithmetic from FIXTURES.md") {
    val df = Seq(
      (1.0, 500L, 1.0, false, 1.0),
      (1.0, 10L, 1.0, false, 0.85), // 0.4 + 0.3*0.5 + 0.2 + 0.1
      (0.0, 0L, 0.0, true, 0.0)
    ).toDF("lang_score", "token_count", "unique_token_ratio", "has_pii", "expected")
    val out = df.withColumn("q", Score.qualityScore(
      col("lang_score"), col("token_count"), col("unique_token_ratio"), col("has_pii")))
      .select("q", "expected").collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("Q2 subset boundary: exactly 0.8 is high_quality") {
    val out = Seq(0.8, 0.7999999).toDF("q")
      .select(Score.subset(col("q"))).as[String].collect()
    assert(out(0) == "high_quality" && out(1) == "rest")
  }

  test("incremental exact dedup: cross-batch dups flagged, history never re-windowed") {
    import spark.implicits._
    val batch1 = Seq((1L, "day one document alpha"), (2L, "day one document beta"))
      .toDF("ingest_seq", "text_pii_masked")
    val day1 = Dedup.exactDedup(batch1)
    val seen = day1.filter(!col("is_dup_exact")).select("exact_hash")

    val batch2 = Seq(
      (10L, "day one document alpha"),   // dup of history
      (11L, "fresh document gamma"),     // new
      (12L, "fresh document gamma"),     // within-batch dup
      (13L, "day one DOCUMENT   beta")   // dup of history via canon (case/ws)
    ).toDF("ingest_seq", "text_pii_masked")

    val flagged = Dedup.incrementalExactDedup(batch2, seen)
      .select("ingest_seq", "is_dup_exact", "drop_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap

    assert(flagged(10L) == (true, Some("exact_duplicate")))
    assert(flagged(11L) == (false, None))
    assert(flagged(12L) == (true, Some("exact_duplicate")))
    assert(flagged(13L) == (true, Some("exact_duplicate")))
    // appending the new survivors grows the state by exactly one hash
    val day2Seen = Dedup.incrementalExactDedup(batch2, seen)
      .filter(!col("is_dup_exact")).select("exact_hash")
    assert(seen.union(day2Seen).distinct().count() == seen.count() + 1)
  }
}
