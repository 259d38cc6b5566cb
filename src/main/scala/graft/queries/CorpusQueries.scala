package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Retrieval, SnapshotDiff, Vocab}
import graft.text.LangId

/** Corpus lifecycle + vocabulary-statistics queries: snapshot diffing
  * for incremental builds, tokenizer-vocabulary coverage, and
  * collocation mining.
  */
object CorpusQueries {

  // ---- q_snapshot_diff: added/removed/changed between two snapshots ----

  /** Two deterministic snapshots derived from the documents table via
    * the content-addressed md5 bucket (the splitAssign convention):
    * prev = buckets 0-89, cur = buckets 10-99 with a simulated edit in
    * buckets 80-89 — so the diff exercises all four statuses.
    */
  private def bucketOf(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % 100

  // ---- q_apply_delta: copy-on-write snapshot MERGE ----------------------

  /** Snapshot MERGE (graft.ops.Incremental.applyDelta): a synthesized
    * change set — 10% of docs updated in place, 10% deleted, 10%
    * spawning new ids — applied to the documents snapshot; the oracle
    * rebuilds the merged table relationally, so every carried-forward,
    * replaced, and inserted row (id, status, content md5) is
    * hash-checked.
    */
  def applyDelta(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(s, dir).select("doc_id", "text")
    val ups = snap.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" [rev2]")).as("text"))
      .unionByName(snap.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
    val dels = snap.filter(col("doc_id") % 10 === 2).select("doc_id")
    // status derives from MEMBERSHIP (in the original snapshot / in the
    // change set), not from an absolute id threshold: the gen_scale.py
    // sweep fixtures replicate doc_ids into arbitrary higher ranges, so
    // any constant cut-off would silently mislabel carried-forward rows
    val merged = graft.ops.Incremental.applyDelta(snap, ups, dels)
    merged
      .join(snap.select(col("doc_id"), lit(1).as("__in_snap")),
        Seq("doc_id"), "left")
      .join(ups.select(col("doc_id"), lit(1).as("__in_ups")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__in_snap").isNull, "inserted")
          .when(col("__in_ups").isNotNull, "updated")
          .otherwise("kept").as("status"),
        md5(coalesce(col("text"), lit("")).cast("binary")).as("text_md5"))
  }

  val applyDeltaSql: String =
    """WITH snap AS (SELECT doc_id, text FROM documents),
      |ups AS (
      |  SELECT doc_id, coalesce(text, '') || ' [rev2]' AS text
      |  FROM snap WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR)
      |  FROM snap WHERE doc_id % 10 = 1),
      |kept AS (SELECT s.doc_id, s.text FROM snap s
      |  WHERE s.doc_id % 10 <> 2
      |    AND NOT EXISTS (SELECT 1 FROM ups u WHERE u.doc_id = s.doc_id)),
      |merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ups)
      |SELECT m.doc_id,
      |  CASE WHEN s.doc_id IS NULL THEN 'inserted'
      |       WHEN u.doc_id IS NOT NULL THEN 'updated'
      |       ELSE 'kept' END AS status,
      |  md5(coalesce(m.text, '')) AS text_md5
      |FROM merged m
      |LEFT JOIN snap s ON m.doc_id = s.doc_id
      |LEFT JOIN ups u ON m.doc_id = u.doc_id""".stripMargin

  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), bucketOf(col("doc_id")).as("bucket"),
        coalesce(col("text"), lit("")).as("txt"))
    val prev = d.filter(col("bucket") < 90)
      .select(col("doc_id"), md5(col("txt")).as("fingerprint"))
    val cur = d.filter(col("bucket") >= 10)
      .select(col("doc_id"),
        md5(when(col("bucket") >= 80, concat(col("txt"), lit(" [rev2]")))
          .otherwise(col("txt"))).as("fingerprint"))
    SnapshotDiff.diff(prev, cur)
  }

  val snapshotDiffSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket,
      |    coalesce(text, '') AS txt FROM documents),
      |prev AS (SELECT doc_id, md5(txt) AS fp_prev FROM d WHERE bucket < 90),
      |cur AS (SELECT doc_id,
      |    md5(CASE WHEN bucket >= 80 THEN txt || ' [rev2]' ELSE txt END) AS fp_cur
      |  FROM d WHERE bucket >= 10)
      |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id, p.fp_prev, c.fp_cur,
      |  CASE WHEN p.fp_prev IS NULL THEN 'added'
      |       WHEN c.fp_cur IS NULL THEN 'removed'
      |       WHEN p.fp_prev <> c.fp_cur THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id""".stripMargin

  // ---- q_epoch_shuffle: deterministic per-epoch training order ---------

  /** Three-epoch deterministic corpus shuffle
    * (graft.ops.Shard.epochShuffle): every epoch is a different
    * hash-derived permutation of the whole corpus, positions assigned
    * by the two-pass partition-offset scheme — the oracle's per-epoch
    * row_number() over the same md5-prefix key checks every position
    * of every permutation exactly.
    */
  def epochShuffle(s: SparkSession, dir: String): DataFrame =
    graft.ops.Shard.epochShuffle(
      Tables.documents(s, dir).select("doc_id"), "doc_id", epochs = 3)

  val epochShuffleSql: String =
    """WITH e AS (SELECT unnest([1, 2, 3]) AS epoch),
      |k AS (SELECT d.doc_id, e.epoch,
      |        CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
      |          || CAST(e.epoch AS VARCHAR)), 1, 13) AS BIGINT) AS skey
      |      FROM documents d CROSS JOIN e)
      |SELECT epoch, doc_id, skey,
      |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY skey, doc_id)
      |    - 1 AS BIGINT) AS position
      |FROM k""".stripMargin

  // ---- q_curriculum_order: staged curriculum + in-stage shuffle --------

  /** The curriculum variant of the epoch shuffle: three length-derived
    * difficulty stages train in order, with the deterministic hash
    * shuffle WITHIN each stage — every position of both epochs
    * hash-checked like q_epoch_shuffle.
    */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val staged = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(coalesce(col("n_chars"), lit(0L)) < 500L, "a_short")
          .when(coalesce(col("n_chars"), lit(0L)) < 2000L, "b_mid")
          .otherwise("c_long").as("stage"))
    graft.ops.Shard.epochShuffle(staged, "doc_id", epochs = 2,
      curriculumCol = Some("stage"))
  }

  val curriculumOrderSql: String =
    """WITH st AS (SELECT doc_id,
      |    CASE WHEN coalesce(n_chars, 0) < 500 THEN 'a_short'
      |         WHEN coalesce(n_chars, 0) < 2000 THEN 'b_mid'
      |         ELSE 'c_long' END AS stage
      |  FROM documents),
      |e AS (SELECT unnest([1, 2]) AS epoch),
      |k AS (SELECT st.doc_id, st.stage, e.epoch,
      |        CAST('0x' || substr(md5(CAST(st.doc_id AS VARCHAR) || ':'
      |          || CAST(e.epoch AS VARCHAR)), 1, 13) AS BIGINT) AS skey
      |      FROM st CROSS JOIN e)
      |SELECT epoch, doc_id, stage, skey,
      |  CAST(row_number() OVER (PARTITION BY epoch
      |    ORDER BY stage, skey, doc_id) - 1 AS BIGINT) AS position
      |FROM k""".stripMargin

  // ---- q_kmv_vocab: cross-source vocabulary overlap via KMV sketches ---

  private val KmvK = 64

  /** Pairwise source vocabulary overlap (graft.ops.Kmv): per-source
    * bottom-k sketches over distinct word-BIGRAM 52-bit hashes, then
    * the KMV set algebra — distinct / union / Jaccard / intersection
    * estimates. Bigrams (not unigrams) because the phrase universe is
    * what separates sources — and, on the fixture, it is the universe
    * large enough (≈700/source) to exercise the ≥k estimator branch.
    * The md5-prefix hash makes every estimate deterministic, so unlike
    * the seeded HLL blobs the ESTIMATES are hash-checked against
    * DuckDB computing the identical bottom-k lists and IEEE
    * arithmetic.
    */
  def kmvVocab(s: SparkSession, dir: String): DataFrame = {
    // the compiled WordShinglesK kernel, not the interpreted HOF: the
    // bigram explode is this query's corpus-linear leg (SCALING.md).
    // size>=2 pre-filter preserves oracle semantics (the kernel emits a
    // whole-doc shingle for 1-token docs; the oracle emits nothing) and
    // the kernel's per-doc distinct is absorbed by sketchDistinct's
    // global (group, hash) distinct.
    val bi = Tables.documents(s, dir)
      .select(col("source"),
        graft.text.TextMetrics.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("source"), explode(
        graft.ops.SketchDedup.shinglesFromTokens(col("__toks"), 2)).as("tok"))
    val sk = graft.ops.Kmv.sketchDistinct(bi, keyCol = "tok",
      groupCol = "source", k = KmvK)
    graft.ops.Kmv.overlapReport(sk, KmvK)
  }

  val kmvVocabSql: String = {
    val toks = OracleSql.toks("text")
    val m = "CAST(4503599627370496 AS DOUBLE)" // 2^52, Kmv.HashRange
    val k = KmvK
    s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
       |tk AS (SELECT source, w1 || ' ' || w2 AS tok FROM (
       |  SELECT source, unnest(toks[1 : len(toks) - 1]) AS w1,
       |         unnest(toks[2 : len(toks)]) AS w2
       |  FROM t WHERE len(toks) >= 2)),
       |h AS (SELECT DISTINCT CAST(source AS VARCHAR) AS grp,
       |    greatest(CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT), 1) AS h FROM tk),
       |n AS (SELECT grp, count(*) AS n_exact FROM h GROUP BY grp),
       |r AS (SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
       |sk AS (SELECT grp, list(h ORDER BY h) AS sk FROM r
       |       WHERE rn <= $k GROUP BY grp),
       |s AS (SELECT sk.grp, n.n_exact, sk.sk
       |      FROM sk JOIN n ON sk.grp = n.grp),
       |p AS (SELECT a.grp AS group_a, b.grp AS group_b,
       |        a.n_exact AS n_a, b.n_exact AS n_b, a.sk AS ska, b.sk AS skb,
       |        list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:$k] AS x
       |      FROM s a JOIN s b ON a.grp < b.grp),
       |q AS (SELECT *,
       |        len(list_intersect(list_intersect(x, ska), skb)) AS nb2,
       |        CASE WHEN len(x) < $k THEN CAST(len(x) AS DOUBLE)
       |             ELSE CAST(${k - 1} AS DOUBLE) * $m / CAST(x[least($k, len(x))] AS DOUBLE)
       |        END AS uest
       |      FROM p)
       |SELECT group_a, group_b,
       |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CASE WHEN len(ska) < $k THEN CAST(len(ska) AS BIGINT)
       |       ELSE CAST(floor(CAST(${k - 1} AS DOUBLE) * $m
       |         / CAST(ska[least($k, len(ska))] AS DOUBLE)) AS BIGINT)
       |  END AS est_a_q,
       |  CASE WHEN len(skb) < $k THEN CAST(len(skb) AS BIGINT)
       |       ELSE CAST(floor(CAST(${k - 1} AS DOUBLE) * $m
       |         / CAST(skb[least($k, len(skb))] AS DOUBLE)) AS BIGINT)
       |  END AS est_b_q,
       |  CAST(floor(uest) AS BIGINT) AS union_est_q,
       |  CAST(floor(CAST(nb2 AS DOUBLE) * 10000.0
       |    / CAST(len(x) AS DOUBLE)) AS BIGINT) AS jaccard_q,
       |  CAST(floor(CAST(nb2 AS DOUBLE) / CAST(len(x) AS DOUBLE) * uest)
       |    AS BIGINT) AS inter_est_q
       |FROM q""".stripMargin
  }

  // ---- q_oov_rate: per-doc coverage of the top-V corpus vocabulary -----

  private val VocabSize = 500

  def oovRate(s: SparkSession, dir: String): DataFrame =
    Vocab.oovRate(Tables.documents(s, dir), idCol = "doc_id",
      textCol = "text", v = VocabSize)

  val oovRateSql: String = {
    val toks = OracleSql.toks("text")
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |tk AS (SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tok
       |       FROM t WHERE len(toks) > 0),
       |v AS (SELECT tok, 1 AS in_vocab FROM (
       |  SELECT tok, count(*) AS c FROM tk GROUP BY tok
       |  ORDER BY c DESC, tok LIMIT $VocabSize))
       |SELECT tk.doc_id, CAST(tk.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(tk.n_tokens AS DOUBLE) AS oov_rate
       |FROM tk LEFT JOIN v ON tk.tok = v.tok
       |GROUP BY tk.doc_id, tk.n_tokens""".stripMargin
  }

  // ---- q_lang_segments: code-switching detection -----------------------

  /** Segment-level language mix: language-ID over the q_passages
    * chunking (32-token windows, stride 16 — the oracle reuses that
    * query's SQL verbatim, so window geometry is shared by
    * construction), aggregated per document. Doc-level lang-ID
    * averages a mixed document into one label, while monolingual
    * training data needs the mix FLAGGED. Composes two oracle-checked
    * operators (passages × langid); the only corpus shuffle is the
    * per-doc aggregate.
    */
  def langSegments(s: SparkSession, dir: String): DataFrame = {
    val segs = Retrieval.passages(Tables.documents(s, dir),
      window = RetrievalQueries.PassageWindow,
      stride = RetrievalQueries.PassageStride)
    LangId.withLangColumns(segs, col("passage"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("n_english"),
        countDistinct(col("lang_pred")).as("n_langs"))
      .withColumn("mixed", col("n_langs") > 1)
  }

  val langSegmentsSql: String = {
    val (pred, _) = LangId.duckdbExprs("passage")
    // passagesSql interpolates AFTER stripMargin: its `|| [...]` line
    // would otherwise lose a pipe to the outer margin stripper
    val tail =
      s"""l AS (SELECT doc_id, $pred AS lang_pred FROM p)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_english,
         |  CAST(count(DISTINCT lang_pred) AS BIGINT) AS n_langs,
         |  count(DISTINCT lang_pred) > 1 AS mixed
         |FROM l GROUP BY doc_id""".stripMargin
    s"WITH p AS (\n${RetrievalQueries.passagesSql}\n),\n$tail"
  }

  // ---- q_toxic_segments: span-level toxicity localization --------------

  /** Toxicity per q_passages segment, aggregated per document: where a
    * doc-level score can only DROP a long document over one bad
    * paragraph, segment scores localize it — keep the doc, excise the
    * span (the redaction-not-rejection curation move). Shares the
    * passages geometry with the oracle verbatim, like langSegments.
    */
  def toxicSegments(s: SparkSession, dir: String): DataFrame = {
    val segs = Retrieval.passages(Tables.documents(s, dir),
      window = RetrievalQueries.PassageWindow,
      stride = RetrievalQueries.PassageStride)
    graft.text.Toxicity.withToxicityColumns(segs, col("passage"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("toxicity") >= 0.5, 1L).otherwise(0L)).as("n_toxic"),
        max(col("toxicity")).as("max_toxicity"))
      .withColumn("redactable",
        col("n_toxic") > 0 && col("n_toxic") * 4 <= col("n_segments"))
  }

  val toxicSegmentsSql: String = {
    def strList(ws: Seq[String]) = ws.mkString("['", "', '", "']")
    val toks = "regexp_extract_all(lower(coalesce(passage, '')), '\\w+')"
    def hits(ws: Seq[String]) =
      s"CAST(len(list_filter($toks, x -> list_contains(${strList(ws)}, x))) AS DOUBLE)"
    val n = s"CAST(greatest(1, len($toks)) AS DOUBLE)"
    val tox = s"""least(1.0, (${hits(graft.text.Toxicity.BadWords)}
      | + ${hits(graft.text.Toxicity.InsultWords)}
      | + ${hits(graft.text.Toxicity.ThreatWords)}
      | + ${hits(graft.text.Toxicity.SexualWords)}
      | + ${hits(graft.text.Toxicity.SlurWords)}) / $n * 5.0)"""
      .stripMargin.replace("\n", " ")
    val tail =
      s"""l AS (SELECT doc_id, $tox AS toxicity FROM p)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(sum(CASE WHEN toxicity >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_toxic,
         |  max(toxicity) AS max_toxicity,
         |  sum(CASE WHEN toxicity >= 0.5 THEN 1 ELSE 0 END) > 0 AND
         |    sum(CASE WHEN toxicity >= 0.5 THEN 1 ELSE 0 END) * 4 <= count(*) AS redactable
         |FROM l GROUP BY doc_id""".stripMargin
    s"WITH p AS (\n${RetrievalQueries.passagesSql}\n),\n$tail"
  }

  // ---- q_bigram_lift: top collocations by lift -------------------------

  private val LiftMinCount = 5L
  private val LiftTopN = 20

  def bigramLift(s: SparkSession, dir: String): DataFrame =
    Vocab.bigramLift(Tables.documents(s, dir), textCol = "text",
      minCount = LiftMinCount, topN = LiftTopN)

  /** The oracle derives unigram counts and totals from the same
    * (w, next-w-or-null) pair relation the engine aggregates, so both
    * sides share one counting semantics; lift's division order is
    * mirrored exactly (the pure ratio is IEEE-identical cross-engine,
    * unlike ln-based PMI).
    */
  val bigramLiftSql: String = {
    val toks = OracleSql.toks("text")
    s"""WITH t AS (SELECT $toks AS toks FROM documents),
       |t2 AS (SELECT toks FROM t WHERE len(toks) > 0),
       |pe AS (SELECT unnest(toks) AS w1, unnest(toks[2:] || [NULL]) AS w2 FROM t2),
       |b AS (SELECT w1, w2, count(*) AS cnt FROM pe GROUP BY 1, 2),
       |u AS (SELECT w1 AS w, CAST(sum(cnt) AS BIGINT) AS cw FROM b GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nu,
       |  CAST(sum(CASE WHEN w2 IS NOT NULL THEN cnt ELSE 0 END) AS DOUBLE) AS nb
       |  FROM b)
       |SELECT b.w1, b.w2, CAST(b.cnt AS BIGINT) AS pair_count,
       |  (CAST(b.cnt AS DOUBLE) / tot.nb) /
       |    ((CAST(ua.cw AS DOUBLE) / tot.nu) * (CAST(ub.cw AS DOUBLE) / tot.nu)) AS lift
       |FROM b CROSS JOIN tot
       |JOIN u ua ON ua.w = b.w1
       |JOIN u ub ON ub.w = b.w2
       |WHERE b.w2 IS NOT NULL AND b.cnt >= $LiftMinCount
       |ORDER BY lift DESC, b.w1, b.w2 LIMIT $LiftTopN""".stripMargin
  }
}
