package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** BM25 ranking, TF-IDF keyterms, and the content-addressed split —
  * hand-computed fixtures + ranking/determinism properties.
  */
class RetrievalSpec extends SparkTestBase {

  private def docsDf(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("bm25: rarer term dominates, tf breaks ties, ranks are dense") {
    val df = docsDf(
      (1L, "rare common common filler filler filler"),
      (2L, "common common common filler filler filler"),
      (3L, "rare rare common filler filler filler"),
      (4L, "filler filler filler filler filler filler"))
    val out = Retrieval.bm25TopK(df, Seq(0L -> Seq("rare", "common")), k = 3)
      .orderBy("rank").collect()
    assert(out.length === 3) // doc 4 matches nothing
    // docs with 'rare' (idf ln(1+(4-2+.5)/2.5)=ln 2) outrank the
    // common-only doc; doc 3 has tf(rare)=2 > doc 1's 1
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(3L, 1L, 2L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    val scores = out.map(_.getAs[Long]("score_q"))
    assert(scores(0) > scores(1) && scores(1) > scores(2))
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val df = docsDf(
      (1L, "term " + ("pad " * 4).trim),
      (2L, "term " + ("pad " * 40).trim))
    val out = Retrieval.bm25TopK(df, Seq(0L -> Seq("term")), k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(out(1L) === 1L && out(2L) === 2L)
  }

  test("tfidf: corpus-wide terms get zero weight, doc-specific terms rank") {
    val df = docsDf(
      (1L, "shared shared unique1 unique1 unique1"),
      (2L, "shared unique2"),
      (3L, "shared shared shared"))
    val out = Retrieval.tfidfTopTerms(df, topN = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("term"),
        r.getAs[Long]("tfidf_q"))).toMap
    // 'shared' df=3/3 -> idf 0; the unique terms (idf ln 3) win
    assert(out(1L)._1 === "unique1" && out(1L)._2 > 0)
    assert(out(2L)._1 === "unique2")
    // doc 3 has only zero-weight terms; tie-break by term name still emits
    assert(out(3L)._1 === "shared" && out(3L)._2 === 0L)
  }

  test("inverted index: df/cf and order-pinned postings digest") {
    val df = docsDf(
      (3L, "x y x"),
      (1L, "x z"),
      (2L, "z z z"))
    val out = Retrieval.invertedIndex(df).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df_t"), r.getAs[Long]("cf_t"),
          r.getAs[String]("postings_md5"))).toMap
    assert(out("x") === ((2L, 3L, md5Hex("1,3"))))
    assert(out("y") === ((1L, 1L, md5Hex("3"))))
    assert(out("z") === ((2L, 4L, md5Hex("1,2"))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("split assign: deterministic, partition-independent, ~90/5/5") {
    val df = docsDf((0L until 1000L).map(i => (i, s"doc $i")): _*)
    val a = Retrieval.splitAssign(df)
    val b = Retrieval.splitAssign(df.repartition(13))
    assert(a.select("doc_id", "bucket", "split").collect().map(_.toSeq).toSet ===
      b.select("doc_id", "bucket", "split").collect().map(_.toSeq).toSet)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 850 && counts("train") < 950)
    assert(counts("val") + counts("test") === 1000 - counts("train"))
    val buckets = a.agg(min("bucket"), max("bucket")).collect().head
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) <= 99L)
  }

  test("tokens_in_set kernel: exact parity with the filter+isin HOF it replaced") {
    import spark.implicits._
    val words = Seq("the", "fox", "über", "日本", "", "a-b")
    val rnd = new scala.util.Random(29)
    val vocab = words ++ Seq("dog", "cat", "x", "THE", "ü", "nope")
    val arrays = Seq(Seq.empty[String], Seq("the", "the", "the")) ++
      (1 to 200).map(_ => (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length))))
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "toks")
    val rows = df.select(col("id"),
      graft.plans.TokensInSet(col("toks"), words).as("kernel"),
      filter(col("toks"), t => t.isin(words: _*)).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
  }

  test("rrf fusion: hand-computed scores, absent side contributes zero") {
    import spark.implicits._
    // floor(1e6/61)=16393, /62=16129, /63=15873
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "id", "rank")
    val vec = Seq((1L, 20L, 1L), (1L, 40L, 2L))
      .toDF("query_id", "id", "rank")
    val rows = Retrieval.rrfFuse(lex, vec, k = 4)
      .collect().map(r => r.getAs[Long]("rank") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_q"),
          r.getAs[Long]("lex_rank"), r.getAs[Long]("vec_rank")))).toMap
    assert(rows(1L) === ((20L, 16129L + 16393L, 2L, 1L))) // both rankings
    assert(rows(2L) === ((10L, 16393L, 1L, 0L)))          // lex only
    assert(rows(3L) === ((40L, 16129L, 0L, 2L)))
    assert(rows(4L) === ((30L, 15873L, 3L, 0L)))
  }

  test("rrf fusion: score ties break on doc_id, k truncates per query") {
    import spark.implicits._
    // q2: two singletons at identical rank-1 scores -> id order decides
    val lex = Seq((2L, 7L, 1L)).toDF("query_id", "id", "rank")
    val vec = Seq((2L, 3L, 1L)).toDF("query_id", "id", "rank")
    val fused = Retrieval.rrfFuse(lex, vec, k = 1).collect()
    assert(fused.length === 1)
    assert(fused.head.getAs[Long]("doc_id") === 3L)
    assert(fused.head.getAs[Long]("rank") === 1L)
  }

  test("phrase search: positions, overlaps, and cross-boundary rejects") {
    val df = docsDf(
      (1L, "big data spark merge fast"),        // "spark merge" at 2
      (2L, "merge spark merge spark merge"),    // matches at 1 and 3
      (3L, "spark fast merge"),                 // terms present, NOT adjacent
      (4L, "table table table"),                // overlapping self-phrase: 0,1
      (5L, "scan scan scan slow"),              // trigram "scan scan slow" at 1
      (6L, "slow scan scan"),                   // trigram prefix at end: no match
      (7L, ""))
    val out = Retrieval.phraseSearch(df, Seq(
      0L -> Seq("spark", "merge"),
      1L -> Seq("table", "table"),
      2L -> Seq("scan", "scan", "slow")))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))).toMap
    assert(out((0L, 1L)) === ((1L, 2L)))
    assert(out((0L, 2L)) === ((2L, 1L)))
    assert(!out.contains((0L, 3L)), "adjacency is required")
    assert(out((1L, 4L)) === ((2L, 0L)), "overlapping matches both count")
    assert(out((2L, 5L)) === ((1L, 1L)))
    assert(!out.contains((2L, 6L)), "prefix at doc end must not match")
    assert(out.keys.forall(_._2 != 7L), "empty doc matches nothing")
  }
}
