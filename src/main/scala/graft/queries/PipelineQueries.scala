package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Pipeline, Tables}
import graft.ops.{Report, Shard}
import graft.text.Normalize

/** Reporting, sharding, export and end-to-end pipeline queries
  * (SURVEY.md §2.6/2.8/2.12 + §3 E1/E3).
  */
object PipelineQueries {

  // ---- q_drop_reason_counts: A1 over the stage-2a chain ----------------

  def dropReasonCounts(s: SparkSession, dir: String): DataFrame =
    Report.dropReasonCounts(
      DocQueries.docPrefilter(s, dir).select("doc_id", "drop_reason"))

  val dropReasonCountsSql: String =
    s"""WITH pre AS (${DocQueries.docPrefilterSql})
       |SELECT drop_reason, count(*) AS n FROM pre GROUP BY drop_reason
       |ORDER BY n DESC, drop_reason ASC NULLS FIRST""".stripMargin

  // ---- q_describe_chars: A2 numeric describe ---------------------------

  def describeChars(s: SparkSession, dir: String): DataFrame =
    Report.describeCol(Tables.documents(s, dir), "n_chars")

  val describeCharsSql: String =
    """SELECT count(n_chars) AS n, min(n_chars) AS min, max(n_chars) AS max,
      | avg(n_chars) AS mean,
      | quantile_cont(n_chars, 0.25) AS p25,
      | quantile_cont(n_chars, 0.5) AS median,
      | quantile_cont(n_chars, 0.75) AS p75,
      | sqrt((sum(CAST(n_chars AS DOUBLE) * n_chars)
      |       - sum(CAST(n_chars AS DOUBLE)) * sum(CAST(n_chars AS DOUBLE)) / count(n_chars))
      |      / (count(n_chars) - 1)) AS std
      |FROM documents""".stripMargin

  // ---- q_describe_metrics: A2 over many metrics, one scan --------------

  /** The reference's `df[metric_cols].describe()` — several metric
    * columns summarized in a single aggregation pass (Report.describeCols),
    * one output row per metric.
    */
  def describeMetrics(s: SparkSession, dir: String): DataFrame =
    Report.describeCols(
      Tables.documents(s, dir)
        .withColumn("token_count",
          size(graft.text.TextMetrics.tokens(col("text"))).cast("long")),
      Seq("n_chars", "token_count"))

  val describeMetricsSql: String = {
    val toks = "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\\s+') END"
    def one(c: String) =
      s"""SELECT '$c' AS metric, count($c) AS n,
         | CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
         | avg($c) AS mean,
         | sqrt((sum(CAST($c AS DOUBLE) * $c)
         |       - sum(CAST($c AS DOUBLE)) * sum(CAST($c AS DOUBLE)) / count($c))
         |      / (count($c) - 1)) AS std,
         | quantile_cont($c, 0.25) AS p25,
         | quantile_cont($c, 0.5) AS median,
         | quantile_cont($c, 0.75) AS p75
         |FROM t""".stripMargin
    s"""WITH t AS (SELECT n_chars,
       |  CAST(len($toks) AS BIGINT) AS token_count FROM documents)
       |${one("n_chars")}
       |UNION ALL
       |${one("token_count")}""".stripMargin
  }

  // ---- q_histogram_chars: H1 fixed-width histogram ---------------------

  def histogramChars(s: SparkSession, dir: String): DataFrame =
    Report.histogram(Tables.documents(s, dir), "n_chars", 50.0)

  val histogramCharsSql: String =
    """SELECT CAST(floor(n_chars / 50.0) AS BIGINT) AS bucket, count(*) AS n
      |FROM documents WHERE n_chars IS NOT NULL GROUP BY 1""".stripMargin

  // ---- q_top_sources: H2 top-N value counts ----------------------------

  def topSources(s: SparkSession, dir: String): DataFrame =
    Report.topValues(Tables.documents(s, dir), "source", 10)

  val topSourcesSql: String =
    """SELECT source, count(*) AS n FROM documents
      |GROUP BY source ORDER BY n DESC, source ASC LIMIT 10""".stripMargin

  // ---- q_export_coalesce: P12 best-available text ----------------------

  def exportCoalesce(s: SparkSession, dir: String): DataFrame = {
    val deep = Normalize.structuralCleanupNoRepeats(col("text"))
    val masked = graft.text.Pii.maskPii(deep)
    Tables.documents(s, dir).select(col("doc_id"),
      Normalize.bestText(masked, deep, col("text")).as("export_text"))
  }

  val exportCoalesceSql: String = {
    import graft.text.Pii
    val boiler = Normalize.BoilerplatePatterns.mkString("(", ")|(", ")")
    val deep =
      s"""trim(list_aggregate(list_filter(string_split(regexp_replace(text, '<[^>]+>', ' ', 'g'), chr(10)),
         | l -> NOT regexp_matches(lower(l), '$boiler')), 'string_agg', chr(10)))""".stripMargin.replace("\n", "")
    val masked =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($deep,
         | '${Pii.EmailRe}', '<EMAIL>', 'g'), '${Pii.PhoneRe}', '<PHONE>', 'g'),
         | '${Pii.CreditCardRe}', '<CREDIT_CARD>', 'g'), '${Pii.IbanRe}', '<IBAN>', 'g')""".stripMargin.replace("\n", "")
    s"""SELECT doc_id,
       | coalesce(nullif(trim($masked), ''), nullif(trim($deep), ''), nullif(trim(text), ''), '') AS export_text
       |FROM documents""".stripMargin
  }

  // ---- q_fingerprint: document fingerprint (md5 of canon text) ----------

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      md5(Normalize.canonExact(col("text"))).as("fingerprint"),
      Normalize.sha256Hex(Normalize.canonExact(col("text"))).as("fingerprint_sha256"))

  val fingerprintSql: String =
    """SELECT doc_id,
      | md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))) AS fingerprint,
      | sha256(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))) AS fingerprint_sha256
      |FROM documents""".stripMargin

  // ---- q_shard_assign + q_shard_manifest: W2/X1/X2 ---------------------

  private val QueryDocsPerShard = 100

  def shardAssign(s: SparkSession, dir: String): DataFrame =
    Shard.assignShards(Tables.documents(s, dir), docsPerShard = QueryDocsPerShard)
      .select("doc_id", "global_seq", "shard_id")

  val shardAssignSql: String =
    s"""SELECT doc_id,
       | row_number() OVER (ORDER BY doc_id) - 1 AS global_seq,
       | CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / $QueryDocsPerShard.0) AS BIGINT) AS shard_id
       |FROM documents""".stripMargin

  def shardManifest(s: SparkSession, dir: String): DataFrame =
    Shard.assignShards(Tables.documents(s, dir), docsPerShard = QueryDocsPerShard)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("num_docs"), sum("n_chars").as("total_chars"))
      .withColumn("filename",
        format_string("train_shard_%05d.jsonl", col("shard_id")))

  val shardManifestSql: String =
    s"""WITH sh AS (
       | SELECT n_chars,
       |  CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / $QueryDocsPerShard.0) AS BIGINT) AS shard_id
       | FROM documents)
       |SELECT shard_id, count(*) AS num_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       | printf('train_shard_%05d.jsonl', shard_id) AS filename
       |FROM sh GROUP BY shard_id""".stripMargin

  // ---- q_manifest_totals: X2 global manifest section --------------------

  def manifestTotals(s: SparkSession, dir: String): DataFrame =
    Shard.manifestTotals(
      Shard.assignShards(
        Tables.documents(s, dir).withColumn("token_count",
          graft.text.TextMetrics.tokenCount(col("text")).cast("long")),
        docsPerShard = QueryDocsPerShard),
      tokensCol = "token_count")

  val manifestTotalsSql: String =
    s"""WITH sh AS (
       | SELECT len(CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[])
       |             ELSE string_split_regex(trim(text), '\\s+') END) AS token_count,
       |  CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / $QueryDocsPerShard.0) AS BIGINT) AS shard_id
       | FROM documents)
       |SELECT count(DISTINCT shard_id) AS num_shards, count(*) AS total_docs,
       | CAST(sum(token_count) AS BIGINT) AS total_tokens
       |FROM sh""".stripMargin

  // ---- q_pii_totals: A3 corpus-level PII aggregates ---------------------

  def piiTotals(s: SparkSession, dir: String): DataFrame =
    Report.piiTotals(DocQueries.piiMask(s, dir)).select(
      col("email_hits").cast("long"), col("phone_hits").cast("long"),
      col("cc_hits").cast("long"), col("iban_hits").cast("long"),
      col("docs_with_pii").cast("long"))

  val piiTotalsSql: String =
    s"""WITH p AS (${DocQueries.piiMaskSql})
       |SELECT CAST(sum(pii_email_hits) AS BIGINT) AS email_hits,
       | CAST(sum(pii_phone_hits) AS BIGINT) AS phone_hits,
       | CAST(sum(pii_cc_hits) AS BIGINT) AS cc_hits,
       | CAST(sum(pii_iban_hits) AS BIGINT) AS iban_hits,
       | CAST(count(*) FILTER (WHERE has_pii) AS BIGINT) AS docs_with_pii
       |FROM p""".stripMargin

  // ---- q_subset_counts: A5 subset distribution --------------------------

  // min(quality_score) is not decorative: a second reference to the
  // scoring chain stops CollapseProject from inlining it into the
  // Aggregate's grouping expression, where it would lose Project-level
  // subexpression elimination (measured 5x slower at sf0.1).
  def subsetCounts(s: SparkSession, dir: String): DataFrame =
    DocQueries.qualityScore(s, dir)
      .groupBy("subset")
      .agg(count(lit(1)).as("n"), min("quality_score").as("min_score"))

  val subsetCountsSql: String =
    s"""WITH q AS (${DocQueries.qualityScoreSql})
       |SELECT subset, count(*) AS n, min(quality_score) AS min_score
       |FROM q GROUP BY subset""".stripMargin

  // ---- q_tokenize: T1 (engine-defined tokenizer; rows-only check) -------

  // The driver's pandas compare cannot sort array-typed cells, so the
  // query surface exposes only harness-sortable scalars: token count plus
  // an order-sensitive hash of each array. The raw input_ids /
  // attention_mask arrays remain available via Pipeline.tokenise (the
  // training-export path, Tokenisation_JSONL_export.py:97-119).
  def tokenize(s: SparkSession, dir: String): DataFrame = {
    val t = graft.text.Tokenize.native(col("text"))
    Tables.documents(s, dir).select(col("doc_id"),
      t.getField("n_tokens").cast("long").as("n_tokens"),
      xxhash64(to_json(t.getField("input_ids"))).as("ids_hash"),
      xxhash64(to_json(t.getField("attention_mask"))).as("mask_hash"))
  }

  // ---- q_pipeline_full: stages 2-6 fused, end to end (rows-only) --------

  def pipelineFull(s: SparkSession, dir: String): DataFrame = {
    val raw = Pipeline.fromDocuments(Tables.documents(s, dir))
    Pipeline.run(raw).select(
      "doc_id", "ingest_seq", "drop_reason", "lang_pred", "lang_score",
      "token_count", "unique_token_ratio", "has_pii", "is_dup_exact",
      "is_dup_near", "quality_score", "subset", "n_tokens")
  }

  // ---- q_data_card: one-row corpus intake summary ------------------------

  def dataCard(s: SparkSession, dir: String): DataFrame =
    Report.dataCard(Tables.documents(s, dir))

  val dataCardSql: String =
    """WITH b AS (SELECT source, lang,
      |  CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
      |  length(coalesce(text, '')) AS n_chars,
      |  trim(coalesce(text, '')) = '' AS is_empty,
      |  md5(coalesce(text, '')) AS h
      | FROM documents)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(CASE WHEN is_empty THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
      |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts,
      |  CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens,
      |  1.0 - CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
      |FROM b""".stripMargin
}
