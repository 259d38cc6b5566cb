package graft

import org.apache.spark.sql.functions._

import graft.ops.{SketchDedup, SnapshotDiff, Vocab}

/** Snapshot diffing, vocabulary coverage, collocation lift, and
  * containment pairs — hand-computed fixtures.
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshot diff classifies all four statuses") {
    val prev = Seq(("a", "h1"), ("b", "h2"), ("c", "h3"))
      .toDF("doc_id", "fingerprint")
    val cur = Seq(("b", "h2"), ("c", "h3x"), ("d", "h4"))
      .toDF("doc_id", "fingerprint")
    val got = SnapshotDiff.diff(prev, cur)
      .select("doc_id", "status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "removed", "b" -> "unchanged",
      "c" -> "changed", "d" -> "added"))
  }

  test("topVocab ranks by count then word; oovRate counts misses per doc") {
    val docs = Seq(
      ("d1", "x x x y y z"),
      ("d2", "x y q"),
      ("d3", "")).toDF("doc_id", "text")
    // counts: x=4, y=3, z=1, q=1 — v=3 keeps x, y and the tie-break
    // winner q (alphabetical before z)
    val vocab = Vocab.topVocab(docs, "text", v = 3)
      .collect().map(_.getString(0))
    assert(vocab.toSeq === Seq("x", "y", "q"))
    val rates = Vocab.oovRate(docs, "doc_id", "text", v = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rates("d1") === ((6L, 1L, 1.0 / 6.0))) // z is OOV
    assert(rates("d2") === ((3L, 0L, 0.0)))
    assert(!rates.contains("d3")) // zero-token docs have no rate
  }

  test("bigramLift surfaces the planted collocation above frequent-but-independent pairs") {
    // "aa bb" always co-occur; per-doc-unique filler keeps every other
    // bigram under minCount
    val docs = (1 to 5).map(i => (s"d$i", s"aa bb x$i y$i aa bb"))
      .toDF("doc_id", "text")
    val top = Vocab.bigramLift(docs, "text", minCount = 5, topN = 5)
      .collect()
    assert(top.length === 1)
    val first = top.head
    assert((first.getString(0), first.getString(1)) === (("aa", "bb")))
    // lift sanity: c(aa bb)=10, Nb=25, c(aa)=c(bb)=10, Nu=30 →
    // (10/25) / ((10/30)·(10/30)) = 3.6
    assert(math.abs(first.getDouble(3) - 3.6) < 1e-12)
  }

  test("containment catches a short doc embedded in a long one that Jaccard misses") {
    val short = "p1 p2 p3 p4 p5"
    val long = (short +: (1 to 40).map(i => s"f$i")).mkString(" ")
    val docs = Seq(("S", short), ("L", long)).toDF("doc_id", "text")
    val pairs = SketchDedup.containmentPairs(docs, "doc_id", "text",
      shingleSize = 3, maxDf = 20, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    // S has 3 shingles, all inside L → containment(S→L) = 1.0
    assert(pairs.exists { case (a, b, c) => a == "S" && b == "L" && c == 1.0 })
    // the reverse direction is far below threshold (L has 43 shingles)
    assert(!pairs.exists { case (a, b, _) => a == "L" && b == "S" })
    // and symmetric Jaccard on the same pair would never flag it
    val jac = SketchDedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, blockTokens = 8, threshold = 0.25)
    assert(jac.count() === 0)
  }

  test("sourceOverlap: mirror sources share everything, disjoint sources nothing") {
    val docs = Seq(
      ("1", "srcA", "t1 t2 t3 t4 t5"),
      ("2", "srcB", "t1 t2 t3 t4 t5"), // exact mirror of srcA
      ("3", "srcC", "u1 u2 u3 u4 u5")) // disjoint vocabulary
      .toDF("doc_id", "source", "text")
    val got = graft.ops.Curation.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // 5 tokens → 3 distinct shingles per doc
    assert(got === Map(("srcA", "srcB") -> ((3L, 1.0))))
  }

  test("passages: stride windows plus the end-snapped tail, short docs whole") {
    val docs = Seq(
      ("10", (1 to 70).map(i => s"w$i").mkString(" ")), // 70 tokens
      ("11", "a b c")) // shorter than the window
      .toDF("doc_id", "text")
    val got = graft.ops.Retrieval.passages(docs, window = 32, stride = 16)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    val longDoc = got.filter(_._1 == "10").sortBy(_._2)
    // starts 1,17,33 from the stride walk + 39 snapped to the end
    assert(longDoc.map(_._2) === Seq(1L, 17L, 33L, 39L))
    assert(longDoc.forall(_._3 == 32L))
    assert(longDoc.last._4.endsWith("w70"))
    val short = got.filter(_._1 == "11")
    assert(short === Seq(("11", 1L, 3L, "a b c")))
  }

  test("langSegments flags the code-switched doc, not the monolingual one") {
    val en = ("the quick brown fox and the lazy dog that was not there " * 4).trim
    val de = ("der schnelle braune fuchs und der faule hund der nicht da war " * 4).trim
    val docs = Seq(
      ("1", s"$en $de"), // ~48 EN tokens then ~48 DE tokens -> mixed
      ("2", s"$en $en")) // monolingual, same length
      .toDF("doc_id", "text")
    val segs = graft.ops.Retrieval.passages(docs, window = 32, stride = 32)
    val out = graft.text.LangId.withLangColumns(segs, col("passage"))
      .groupBy("doc_id")
      .agg(countDistinct(col("lang_pred")).as("n_langs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("1") > 1L, s"code-switched doc not flagged: $out")
    assert(out("2") === 1L, s"monolingual doc flagged: $out")
  }

  test("toxicSegments localizes one bad span inside a long clean doc") {
    val bad = graft.text.Toxicity.BadWords.take(8).mkString(" ")
    val cleanSeg = (1 to 32).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // 4+ clean segments then one toxic one: redactable
      ("1", s"$cleanSeg $cleanSeg $cleanSeg $cleanSeg $bad $bad $bad $bad"),
      ("2", cleanSeg)) // fully clean
      .toDF("doc_id", "text")
    val segs = graft.ops.Retrieval.passages(docs, window = 32, stride = 32)
    val out = graft.text.Toxicity.withToxicityColumns(segs, col("passage"))
      .groupBy("doc_id")
      .agg(sum(when(col("toxicity") >= 0.5, 1L).otherwise(0L)).as("n_toxic"),
        count(lit(1)).as("n_segments"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nToxic1, nSeg1) = out("1")
    assert(nToxic1 >= 1L && nToxic1 * 4 <= nSeg1,
      s"bad span not localized/redactable: $out")
    assert(out("2")._1 === 0L)
  }

  test("dataCard: one-row intake summary with exact dup and empty accounting") {
    val docs = Seq(
      ("1", "a b c", "s1", "en"),
      ("2", "a b c", "s1", "en"), // exact dup of 1
      ("3", "d e", "s2", "de"),
      ("4", "  ", "s2", null)) // blank text, null lang
      .toDF("doc_id", "text", "source", "lang")
    val r = graft.ops.Report.dataCard(docs).collect().head
    assert(r.getLong(0) === 4L) // n_docs
    assert(r.getLong(1) === 2L) // n_sources
    assert(r.getLong(2) === 2L) // n_langs (null ignored)
    assert(r.getLong(3) === 8L) // total_tokens 3+3+2+0
    assert(r.getLong(5) === 1L) // n_empty
    assert(r.getLong(6) === 3L) // distinct texts: "a b c", "d e", "  "
    assert(r.getDouble(7) === 2.0) // mean_tokens
    assert(r.getDouble(8) === 0.25) // dup_rate
  }

  test("containment df band suppresses boilerplate shingles") {
    // the same 3 tokens open 30 docs: that shingle's df=30 > maxDf=20,
    // so it can't generate candidates on its own
    val docs = (1 to 30).map(i => (s"d$i", s"same old intro unique$i body$i tail$i"))
      .toDF("doc_id", "text")
    val pairs = SketchDedup.containmentPairs(docs, "doc_id", "text",
      shingleSize = 3, maxDf = 20, threshold = 0.5)
    assert(pairs.count() === 0)
    // the band report makes that suppression VISIBLE: per doc the
    // shingles are "same old intro" (df=30, above band) plus three
    // unique$i-keyed singletons -> 91 groups, 90 singletons, 0 in
    // band, 1 dropped group carrying all 30 of its postings
    val rep = SketchDedup.containmentBandReport(docs, "doc_id", "text",
      shingleSize = 3, maxDf = 20).collect()(0)
    assert(rep.getLong(0) === 91L, "n_groups")
    assert(rep.getLong(1) === 90L, "n_singleton")
    assert(rep.getLong(2) === 0L, "n_in_band")
    assert(rep.getLong(3) === 1L, "n_above_band")
    assert(rep.getLong(4) === 30L, "n_postings_dropped")
  }

  test("pluggable lang model: same column contract, one init per task, not per row") {
    import graft.text.LangId
    CorpusOpsSpec.modelInits.set(0)
    val docs = (1 to 40)
      .map(i => (i.toLong, if (i % 2 == 0) s"zzz zebra $i" else s"plain text $i"))
      .toDF("doc_id", "text").repartition(4)
    val out = LangId.withLangColumnsModel(docs, col("text"),
      () => { CorpusOpsSpec.modelInits.incrementAndGet(); CorpusOpsSpec.zModel })
    // the model path appends the SAME columns the expression scorer
    // does, so downstream consumers interchange freely
    val ref = LangId.withLangColumns(docs, col("text"))
    assert(out.columns.toSeq === ref.columns.toSeq)
    assert(out.schema("lang_pred").dataType === ref.schema("lang_pred").dataType)
    assert(out.schema("lang_score").dataType === ref.schema("lang_score").dataType)
    val got = out.select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1 to 40).forall(i => got(i.toLong) === (if (i % 2 == 0) "zz" else "en")))
    // profile loading amortizes: the factory ran at most once per task,
    // never once per row (the reason a real langdetect needs this slot)
    val inits = CorpusOpsSpec.modelInits.get()
    assert(inits >= 1 && inits <= 8, s"model inits = $inits for 40 rows")
  }
}

object CorpusOpsSpec {
  /** Cross-JVM-safe only because tests run local-mode: executor and
    * driver share this static, so the spec can observe init counts.
    */
  val modelInits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Deterministic fake standing in for a loaded model: 'zz' iff the
    * text has a z, else 'en' — trivially different from the expression
    * scorer so a wiring bug cannot fake parity.
    */
  val zModel: graft.text.LangId.LangModel = new graft.text.LangId.LangModel {
    def predict(text: String): (String, Double) =
      if (text != null && text.contains('z')) ("zz", 0.9) else ("en", 0.5)
  }
}
