package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Retrieval

/** Lexical retrieval + deterministic split assignment as oracle-checked
  * queries (graft.ops.Retrieval): BM25 ranked search, per-doc TF-IDF
  * keyterms, and the content-addressed train/val/test split.
  */
object RetrievalQueries {

  // same whitespace tokenization contract as DocQueries.toksSql
  private def toksSql(t: String) = OracleSql.toks(t)

  // ---- q_bm25_topk: BM25 ranked retrieval -------------------------------

  /** Fixed query set spanning common terms (df ≈ 0.77·N) and the one
    * rare term in the corpus ('dup', df ≈ 0.05·N, idf ≈ 3.0) so idf
    * actually orders results.
    */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "merge"),
    1L -> Seq("dup", "key"),
    2L -> Seq("window", "sort", "vector"))

  val Bm25K = 5

  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(s, dir), Bm25Queries, k = Bm25K)

  /** The BM25 scoring CTE chain (ends at `r`: query_id, doc_id, score_q,
    * rank) — shared verbatim between q_bm25_topk and q_hybrid_rrf so the
    * two oracles cannot drift.
    */
  private val bm25CtesSql: String = {
    val terms = Bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val qtRows = Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    // expression shapes mirror ops.Retrieval exactly (literal-for-literal:
    // (1.2 + 1.0), not 2.2 — fp constant folding must match Spark's)
    s"""t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |d AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
       |qt(query_id, term) AS (VALUES $qtRows),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM d
       |       WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |st AS (SELECT count(*) AS n_docs,
       |         CAST(floor(CAST(sum(len(toks)) AS DOUBLE) * 10000.0 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avgdl_q
       |       FROM t),
       |dfq AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY term),
       |idf AS (SELECT term, CAST(floor(ln(1.0 +
       |          (CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5) /
       |          (CAST(df_t AS DOUBLE) + 0.5)) * 10000.0) AS BIGINT) AS idf_q
       |        FROM dfq CROSS JOIN st),
       |sc AS (SELECT qt.query_id, tf.doc_id,
       |         sum(idf.idf_q * CAST(floor(
       |           CAST(tf.tf AS DOUBLE) * (1.2 + 1.0) /
       |           (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
       |             CAST(tf.dl AS DOUBLE) / (CAST(st.avgdl_q AS DOUBLE) / 10000.0)))
       |           * 10000.0) AS BIGINT)) AS score_q
       |       FROM tf JOIN qt USING (term) JOIN idf USING (term) CROSS JOIN st
       |       GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score_q,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY score_q DESC, doc_id) AS rank
       |      FROM sc)""".stripMargin
  }

  val bm25TopKSql: String =
    s"""WITH $bm25CtesSql
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       |  doc_id, CAST(score_q AS BIGINT) AS score_q
       |FROM r WHERE rank <= $Bm25K""".stripMargin

  // ---- q_hybrid_rrf: lexical ⊕ vector reciprocal-rank fusion ------------

  /** Query ids 0..2 exist in BOTH modalities: BM25 over the term lists,
    * exact cosine over the query doc's embedding (vec_id = doc_id in the
    * fixture). Each side contributes its top-`HybridPoolK`; RRF fuses to
    * the final `HybridK`.
    */
  val HybridK = 5
  val HybridPoolK = 10
  val HybridNQ = 3

  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = Retrieval.bm25TopK(Tables.documents(s, dir), Bm25Queries,
        k = HybridPoolK)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val vec = graft.ops.Similarity.annTopK(Tables.embeddings(s, dir),
        nQueries = HybridNQ, k = HybridPoolK)
      .select(col("query_id"), col("vec_id").as("id"), col("rank"))
    Retrieval.rrfFuse(lex, vec, k = HybridK)
  }

  val hybridRrfSql: String =
    s"""WITH $bm25CtesSql,
       |lx AS (SELECT query_id, doc_id, CAST(rank AS BIGINT) AS lex_rank
       |       FROM r WHERE rank <= $HybridPoolK),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qe AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $HybridNQ),
       |vs AS (SELECT query_id, vec_id, list_cosine_similarity(qv, v) AS cosine
       |       FROM qe JOIN e ON vec_id <> query_id),
       |vrr AS (SELECT query_id, vec_id AS doc_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, vec_id) AS BIGINT) AS vec_rank FROM vs),
       |vr AS (SELECT * FROM vrr WHERE vec_rank <= $HybridPoolK),
       |f AS (SELECT coalesce(lx.query_id, vr.query_id) AS query_id,
       |        coalesce(lx.doc_id, vr.doc_id) AS doc_id,
       |        coalesce(lx.lex_rank, 0) AS lex_rank,
       |        coalesce(vr.vec_rank, 0) AS vec_rank
       |      FROM lx FULL OUTER JOIN vr
       |        ON lx.query_id = vr.query_id AND lx.doc_id = vr.doc_id),
       |g AS (SELECT *,
       |        (CASE WHEN lex_rank > 0
       |           THEN CAST(floor(1000000.0 / (${Retrieval.RrfK} + lex_rank)) AS BIGINT)
       |           ELSE 0 END
       |       + CASE WHEN vec_rank > 0
       |           THEN CAST(floor(1000000.0 / (${Retrieval.RrfK} + vec_rank)) AS BIGINT)
       |           ELSE 0 END) AS rrf_q FROM f),
       |res AS (SELECT query_id,
       |          CAST(row_number() OVER (PARTITION BY query_id
       |            ORDER BY rrf_q DESC, doc_id) AS BIGINT) AS rank,
       |          doc_id, rrf_q, lex_rank, vec_rank FROM g)
       |SELECT query_id, rank, doc_id, rrf_q, lex_rank, vec_rank
       |FROM res WHERE rank <= $HybridK""".stripMargin

  // ---- q_tfidf_terms: per-doc top TF-IDF keyterms -----------------------

  def tfidfTerms(s: SparkSession, dir: String): DataFrame =
    Retrieval.tfidfTopTerms(Tables.documents(s, dir))

  val tfidfTermsSql: String =
    s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |d AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM d GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |idf AS (SELECT term, CAST(floor(ln(CAST(n_docs AS DOUBLE) /
       |          CAST(count(DISTINCT doc_id) AS DOUBLE)) * 10000.0) AS BIGINT) AS idf_q
       |        FROM tf CROSS JOIN nd GROUP BY term, n_docs),
       |j AS (SELECT tf.doc_id, tf.term, tf.tf, tf.tf * idf.idf_q AS tfidf_q
       |      FROM tf JOIN idf USING (term)),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY tfidf_q DESC, term) AS term_rank FROM j)
       |SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, term,
       |  CAST(tf AS BIGINT) AS tf, CAST(tfidf_q AS BIGINT) AS tfidf_q
       |FROM r WHERE term_rank <= ${Retrieval.TfidfTopN}""".stripMargin

  // ---- q_inverted_index: postings materialization -----------------------

  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Retrieval.invertedIndex(Tables.documents(s, dir))

  val invertedIndexSql: String =
    s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |d AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |pd AS (SELECT term, doc_id, count(*) AS cf FROM d GROUP BY 1, 2)
       |SELECT term, CAST(count(*) AS BIGINT) AS df_t,
       |  CAST(sum(cf) AS BIGINT) AS cf_t,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
       |FROM pd GROUP BY term""".stripMargin

  // ---- q_split_assign: content-addressed train/val/test split -----------

  def splitAssign(s: SparkSession, dir: String): DataFrame =
    Retrieval.splitAssign(Tables.documents(s, dir))
      .select("doc_id", "bucket", "split")

  val splitAssignSql: String =
    """SELECT doc_id,
      |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS BIGINT) AS bucket,
      |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 THEN 'train'
      |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  // ---- q_passages: overlapping passage extraction -----------------------

  val PassageWindow = 32
  val PassageStride = 16

  def passages(s: SparkSession, dir: String): DataFrame =
    Retrieval.passages(Tables.documents(s, dir), idCol = "doc_id",
      textCol = "text", window = PassageWindow, stride = PassageStride)

  val passagesSql: String = {
    val w = PassageWindow
    val st = PassageStride
    s"""WITH c AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents
       |           WHERE trim(coalesce(text, '')) <> ''),
       |sp AS (SELECT doc_id, toks, unnest(list_distinct(
       |    (CASE WHEN len(toks) - $w >= 1
       |          THEN generate_series(1, len(toks) - $w, $st)
       |          ELSE CAST([] AS BIGINT[]) END)
       |    || [greatest(1, len(toks) - $w + 1)])) AS start FROM c)
       |SELECT doc_id,
       |  CAST(doc_id AS VARCHAR) || ':' || start AS passage_id,
       |  CAST(start AS BIGINT) AS start,
       |  CAST(least($w, len(toks) - start + 1) AS BIGINT) AS n_tok,
       |  array_to_string(toks[start : start + ${w - 1}], ' ') AS passage
       |FROM sp""".stripMargin
  }

  // ---- q_phrase_search: positional-postings exact phrase match ----------

  /** Fixed phrase set, chosen to exercise the edge shapes: a plain
    * bigram, a repeated-word bigram ("table table" — overlapping
    * matches), and a trigram with an internal repeat.
    */
  val PhraseQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "merge"),
    1L -> Seq("slow", "small"),
    2L -> Seq("table", "table"),
    3L -> Seq("scan", "scan", "slow"))

  def phraseSearch(s: SparkSession, dir: String): DataFrame =
    Retrieval.phraseSearch(Tables.documents(s, dir), PhraseQueries)

  val phraseSearchSql: String = {
    val qRows = PhraseQueries.flatMap { case (qid, ws) =>
      ws.zipWithIndex.map { case (w, j) => s"($qid, '$w', $j, ${ws.length})" }
    }.mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |p AS (SELECT doc_id, unnest(toks) AS term,
       |             unnest(generate_series(0, len(toks) - 1)) AS pos
       |      FROM t WHERE len(toks) > 0),
       |q(query_id, term, off, plen) AS (VALUES $qRows),
       |c AS (SELECT q.query_id, p.doc_id, p.pos - q.off AS start, q.plen
       |      FROM p JOIN q USING (term) WHERE p.pos - q.off >= 0),
       |m AS (SELECT query_id, doc_id, start FROM c
       |      GROUP BY query_id, doc_id, start, plen HAVING count(*) = plen)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  CAST(count(*) AS BIGINT) AS n_matches,
       |  CAST(min(start) AS BIGINT) AS first_pos
       |FROM m GROUP BY query_id, doc_id""".stripMargin
  }
}
