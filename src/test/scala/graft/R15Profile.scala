package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-15 A/B decomposition — VERDICT r14 "Next round" items 1/3/4:
  * re-measure the driver-flat persists under driver-like conditions
  * (cold JVM, interleaved min-of-N, noop sink), prototype the KN
  * marginal-window collapse, isolate-retime q_containment.
  *
  *   sbt 'Test/runMain graft.R15Profile /root/testdata/sf0.1 <group>'
  */
object R15Variants {
  import graft.ops.{Curation, SketchDedup, Skew}
  import graft.text.TextMetrics
  import org.apache.spark.sql.SparkSession

  final class Builders(spark: SparkSession) {

    // ---- prefix-jaccard: full pipeline minus the `ordered` persist ----
    def pjNoPersist(d: String): DataFrame = {
      val shingleSize = 3
      val threshold = 0.8
      val base = Skew.ensureParallelism(Tables.documents(spark, d)
        .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        .select(col("doc_id").as("id"), col("text").as("__t")))
        .select(col("id"),
          SketchDedup.shinglesFromTokens(
            TextMetrics.tokens(col("__t")), shingleSize).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ex = base.select(col("id"), explode(col("sh")).as("s"))
      val rep = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
        .filter(col("df_s") > 1)
      val ordered = ex.join(broadcast(rep), Seq("s"), "left")
        .select(col("id"), struct(
          coalesce(col("df_s"), lit(1L)).as("df_s"), col("s")).as("__ds"))
        .groupBy("id")
        .agg(array_sort(collect_list(col("__ds"))).as("ord"))
      // NO persist here — the revert candidate
      val n = size(col("ord"))
      val p = (n - ceil(n.cast("double") * lit(threshold)) + 1).cast("int")
      val prefix = slice(transform(col("ord"), x => x.getField("s")), lit(1), p)
      val cands = ordered.select(col("id"), explode(prefix).as("s"))
      val pairs = cands.select(col("s"), col("id").as("id_a"))
        .join(cands.select(col("s"), col("id").as("id_b")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      pairs
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(size(col("sh_a")).cast("double") >= lit(threshold) * size(col("sh_b")) &&
          size(col("sh_b")).cast("double") >= lit(threshold) * size(col("sh_a")))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }

    // ---- prefix-jaccard: shingle fingerprinted to xxhash64 at the
    // explode (codegen'd column hash, NOT a transform() lambda — the
    // cont_hashed lesson). The prefix-filter guarantee holds for ANY
    // consistent total order, so ordering by (df, hash) instead of
    // (df, text) keeps the candidate set a superset of true pairs and
    // exact verification makes the OUTPUT identical; every exchange
    // (df agg, regroup, cand self-join) and the ordered cache carry
    // 8-byte longs instead of ~25-byte strings.
    def pjHashed(d: String): DataFrame = {
      val shingleSize = 3
      val threshold = 0.8
      val base = Skew.ensureParallelism(Tables.documents(spark, d)
        .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        .select(col("doc_id").as("id"), col("text").as("__t")))
        .select(col("id"),
          SketchDedup.shinglesFromTokens(
            TextMetrics.tokens(col("__t")), shingleSize).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ex = base.select(col("id"), explode(col("sh")).as("__s0"))
        .select(col("id"), xxhash64(col("__s0")).as("s"))
      val rep = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
        .filter(col("df_s") > 1)
      val ordered = ex.join(broadcast(rep), Seq("s"), "left")
        .select(col("id"), struct(
          coalesce(col("df_s"), lit(1L)).as("df_s"), col("s")).as("__ds"))
        .groupBy("id")
        .agg(array_sort(collect_list(col("__ds"))).as("ord"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = size(col("ord"))
      val p = (n - ceil(n.cast("double") * lit(threshold)) + 1).cast("int")
      val prefix = slice(transform(col("ord"), x => x.getField("s")), lit(1), p)
      val cands = ordered.select(col("id"), explode(prefix).as("s"))
      val pairs = cands.select(col("s"), col("id").as("id_a"))
        .join(cands.select(col("s"), col("id").as("id_b")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      pairs
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .filter(size(col("sh_a")).cast("double") >= lit(threshold) * size(col("sh_b")) &&
          size(col("sh_b")).cast("double") >= lit(threshold) * size(col("sh_a")))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }

    // ---- span removal: gram/base persist on-off matrix ----
    def spanVariant(d: String, persistBase: Boolean,
                    persistGrams: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val n = Curation.DupSpanN
      val minDocs = Curation.DupSpanMinDocs
      val df = Tables.documents(spark, d)
      val idCol = "doc_id"
      val base0 = df
        .select(col(idCol), TextMetrics.tokens(col("text")).as("__toks"))
      val base = if (persistBase) base0.persist(StorageLevel.MEMORY_AND_DISK) else base0
      val toks = base
        .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
      val grams0 = base
        .select(col(idCol), posexplode(
          when(size(col("__toks")) >= n,
            transform(sequence(lit(0), size(col("__toks")) - n),
              i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as(Seq("gpos", "gram")))
      val grams = if (persistGrams) grams0.persist(StorageLevel.MEMORY_AND_DISK) else grams0
      val dup = grams.groupBy("gram")
        .agg(countDistinct(col(idCol)).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select(col("gram"))
      val marked = grams.join(dup, Seq("gram"))
        .select(col(idCol), col("gpos")).distinct()
      val byPos = Window.partitionBy(idCol).orderBy("pos")
      val trail = byPos.rowsBetween(-(n - 1), 0)
      val covered = toks
        .join(marked.withColumnRenamed("gpos", "pos")
          .withColumn("__start", lit(1)), Seq(idCol, "pos"), "left")
        .withColumn("__cov", max(coalesce(col("__start"), lit(0))).over(trail))
        .withColumn("__cut_start",
          (col("__cov") === 1 &&
            coalesce(lag(col("__cov"), 1).over(byPos), lit(0)) === 0)
            .cast("int"))
      val perDoc = covered.groupBy(idCol)
        .agg(count(lit(1)).as("n_tokens"),
          sum("__cov").as("n_removed"),
          sum("__cut_start").as("n_cut_spans"),
          array_sort(collect_list(
            when(col("__cov") === 0, struct(col("pos"), col("tok")))))
            .as("__kept"))
        .withColumn("clean_md5",
          md5(array_join(transform(col("__kept"), s => s.getField("tok")), " ")
            .cast("binary")))
        .drop("__kept")
      df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          coalesce(col("n_cut_spans"), lit(0L)).as("n_cut_spans"),
          coalesce(col("clean_md5"), md5(lit("").cast("binary"))).as("clean_md5"))
    }

    // ---- span removal: gram stream fingerprinted to xxhash64 before
    // the cache/shuffle (VERDICT r14 item 1's footprint option): the
    // dup-frequency agg and the marked-position join only need gram
    // EQUALITY, never the string — hash the 8-token string once at
    // build, cache/shuffle 8 bytes instead of ~60. Results identical
    // modulo xxhash64 collision (~1e-5 at 15M grams; oracle-checked).
    def spanHashed(d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val n = Curation.DupSpanN
      val minDocs = Curation.DupSpanMinDocs
      val df = Tables.documents(spark, d)
      val idCol = "doc_id"
      val base = df
        .select(col(idCol), TextMetrics.tokens(col("text")).as("__toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val toks = base
        .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
      val grams = base
        .select(col(idCol), posexplode(
          when(size(col("__toks")) >= n,
            transform(sequence(lit(0), size(col("__toks")) - n),
              i => xxhash64(array_join(slice(col("__toks"), i + 1, lit(n)), " "))))
            .otherwise(array().cast("array<long>"))).as(Seq("gpos", "gh")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dup = grams.groupBy("gh")
        .agg(countDistinct(col(idCol)).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select(col("gh"))
      val marked = grams.join(dup, Seq("gh"))
        .select(col(idCol), col("gpos")).distinct()
      val byPos = Window.partitionBy(idCol).orderBy("pos")
      val trail = byPos.rowsBetween(-(n - 1), 0)
      val covered = toks
        .join(marked.withColumnRenamed("gpos", "pos")
          .withColumn("__start", lit(1)), Seq(idCol, "pos"), "left")
        .withColumn("__cov", max(coalesce(col("__start"), lit(0))).over(trail))
        .withColumn("__cut_start",
          (col("__cov") === 1 &&
            coalesce(lag(col("__cov"), 1).over(byPos), lit(0)) === 0)
            .cast("int"))
      val perDoc = covered.groupBy(idCol)
        .agg(count(lit(1)).as("n_tokens"),
          sum("__cov").as("n_removed"),
          sum("__cut_start").as("n_cut_spans"),
          array_sort(collect_list(
            when(col("__cov") === 0, struct(col("pos"), col("tok")))))
            .as("__kept"))
        .withColumn("clean_md5",
          md5(array_join(transform(col("__kept"), s => s.getField("tok")), " ")
            .cast("binary")))
        .drop("__kept")
      df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          coalesce(col("n_cut_spans"), lit(0L)).as("n_cut_spans"),
          coalesce(col("clean_md5"), md5(lit("").cast("binary"))).as("clean_md5"))
    }

    // dupSpans with the same hashed-span treatment
    def dupSpansHashed(d: String): DataFrame = {
      val n = Curation.DupSpanN
      val minDocs = Curation.DupSpanMinDocs
      val df = Tables.documents(spark, d)
      val spans = df
        .withColumn("__toks", TextMetrics.tokens(col("text")))
        .select(col("doc_id"), explode(
          when(size(col("__toks")) >= n,
            transform(sequence(lit(0), size(col("__toks")) - n),
              i => xxhash64(array_join(slice(col("__toks"), i + 1, lit(n)), " "))))
            .otherwise(array().cast("array<long>"))).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dup = spans.groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select(col("sh"), lit(1).as("__dup"))
      val perDoc = spans
        .join(dup, Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), count(col("__dup")).as("dup_spans"))
      df.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
        .withColumn("dup_frac_q",
          when(col("n_spans") > 0,
            floor(col("dup_spans").cast("double") * 10000.0d /
              col("n_spans").cast("double")))
            .otherwise(lit(0L)).cast("long"))
    }

    // ---- containment: posting shuffle keyed on xxhash64(shingle) ----
    // same legality as the span fix: the posting groupBy only tests
    // shingle EQUALITY; neither the shingle nor its group survives to
    // the output (pairs + counts only).
    def contHashed(d: String): DataFrame = {
      import graft.ops.BoundedCollect
      val maxDf = 20
      val threshold = 0.9
      val df = Tables.documents(spark, d)
      val (idCast, collector) =
        BoundedCollect.forIdType(df.schema("doc_id").dataType, maxDf)
      val base = Skew.ensureParallelism(df
        .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        .select(idCast(col("doc_id")).as("id"), col("text").as("__t")))
        .select(col("id"),
          SketchDedup.shinglesFromTokens(TextMetrics.tokens(col("__t")), 3).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bySh = base.select(col("id"),
          explode(transform(col("sh"), s => xxhash64(s))).as("g"))
        .groupBy("g")
        .agg(collector(col("id")).as("c"))
        .select(col("c.ids").as("ids"))
        .filter(size(col("ids")).between(2, maxDf))
      val pairs = bySh.select(explode(expr(
        """flatten(transform(ids, a ->
          |  transform(filter(ids, b -> b != a), b -> struct(a AS id_a, b AS id_b))))
          |""".stripMargin)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      val sizes = base.select(col("id").as("id_a"),
        size(col("sh")).cast("long").as("n_sh"))
      val idType = df.schema("doc_id").dataType
      pairs
        .join(sizes, Seq("id_a"))
        .withColumn("containment",
          col("n_shared").cast("double") / col("n_sh").cast("double"))
        .filter(col("containment") >= threshold)
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"),
          col("n_shared"), col("containment"))
    }

    // ---- source overlap: one vocab exchange (groupBy hashed shingle →
    // source set → in-row pairs) instead of distinct + self-join. The
    // distinct form pays three vocab-sized exchanges ((src,sh) distinct,
    // then sh twice for the self-join) all carrying shingle strings; here
    // the exploded stream exchanges ONCE keyed on xxhash64(sh) (map-side
    // collect_set partials dedup in place) and the pair count is
    // map-side-crushable (≤ |src|² distinct keys). Shingle is an
    // equality-only key that never reaches the output — same legality as
    // the committed dup-span fingerprinting.
    def ovlGrouped(d: String): DataFrame = {
      val df = Tables.documents(spark, d)
      val grouped = df
        .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        .select(col("source").as("src"),
          explode(SketchDedup.shinglesFromTokens(
            TextMetrics.tokens(col("text")), 3)).as("sh"))
        .groupBy(xxhash64(col("sh")).as("gh"))
        .agg(sort_array(collect_set(col("src"))).as("srcs"))
        .select(col("srcs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sizes = grouped.select(explode(col("srcs")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("n_sh"))
      val pairs = grouped.filter(size(col("srcs")) >= 2)
        .select(explode(expr(
          """flatten(transform(srcs, a ->
            |  transform(filter(srcs, b -> b > a),
            |            b -> struct(a AS src_a, b AS src_b))))
            |""".stripMargin)).as("p"))
        .select(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      pairs
        .join(broadcast(sizes.select(col("src").as("src_a"),
          col("n_sh").as("n_a"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("src").as("src_b"),
          col("n_sh").as("n_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double")).as("overlap"))
    }

    // ---- winnow overlap: OLD string-fp form (A/B reference for the
    // xxhash64 fingerprint key now in winnowOverlapPairs) ----
    def wnString(d: String): DataFrame = {
      import graft.ops.BoundedCollect
      val (kk, ww, maxDf, minShared) = (8, 4, 20, 8)
      val df = Tables.documents(spark, d)
      val (idCast, collector) =
        BoundedCollect.forIdType(df.schema("doc_id").dataType, maxDf)
      val fps = SketchDedup.winnowFingerprints(df, "doc_id", "text", kk, ww)
        .select(idCast(col("id")).as("id"), col("fp"))
      val byFp = fps.groupBy("fp")
        .agg(collector(col("id")).as("c"))
        .select(col("c.ids").as("ids"))
        .filter(size(col("ids")).between(2, maxDf))
        .withColumn("ids", array_sort(col("ids")))
      val pairs = byFp.select(explode(flatten(expr(
        """transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b)))
          |""".stripMargin))).as("p"))
      val idType = df.schema("doc_id").dataType
      pairs.select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"), col("n_shared"))
    }

    // ---- containment: hash AFTER the explode (codegen'd column hash;
    // the rejected cont_hashed put xxhash64 inside a transform() lambda,
    // which is interpreted per element — the pj/span lesson) ----
    def contHashed2(d: String): DataFrame = {
      import graft.ops.BoundedCollect
      val maxDf = 20
      val threshold = 0.9
      val df = Tables.documents(spark, d)
      val (idCast, collector) =
        BoundedCollect.forIdType(df.schema("doc_id").dataType, maxDf)
      val base = Skew.ensureParallelism(df
        .filter(trim(coalesce(col("text"), lit(""))) =!= "")
        .select(idCast(col("doc_id")).as("id"), col("text").as("__t")))
        .select(col("id"),
          SketchDedup.shinglesFromTokens(TextMetrics.tokens(col("__t")), 3).as("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bySh = base.select(col("id"), explode(col("sh")).as("__g0"))
        .select(col("id"), xxhash64(col("__g0")).as("g"))
        .groupBy("g")
        .agg(collector(col("id")).as("c"))
        .select(col("c.ids").as("ids"))
        .filter(size(col("ids")).between(2, maxDf))
      val pairs = bySh.select(explode(expr(
        """flatten(transform(ids, a ->
          |  transform(filter(ids, b -> b != a), b -> struct(a AS id_a, b AS id_b))))
          |""".stripMargin)).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      val sizes = base.select(col("id").as("id_a"),
        size(col("sh")).cast("long").as("n_sh"))
      val idType = df.schema("doc_id").dataType
      pairs
        .join(sizes, Seq("id_a"))
        .withColumn("containment",
          col("n_shared").cast("double") / col("n_sh").cast("double"))
        .filter(col("containment") >= threshold)
        .select(col("id_a").cast(idType).as("id_a"),
          col("id_b").cast(idType).as("id_b"),
          col("n_shared"), col("containment"))
    }

    // ---- heavy hitters: gram persist on/off ----
    def hhVariant(d: String, persistGrams: Boolean): DataFrame = {
      import graft.ops.HeavyHitters
      val k = 128
      val docs = Tables.documents(spark, d)
        .filter(col("text").isNotNull && length(col("text")) >= 3)
      val grams0 = docs
        .select(col("text"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
        .select(col("text").substr(col("i"), lit(3)).as("tg"))
      val grams = if (persistGrams) grams0.persist(StorageLevel.MEMORY_AND_DISK) else grams0
      val retained = grams.agg(HeavyHitters.mgTopK(k)(col("tg")).as("hh"))
        .select(explode(col("hh.items")).as("it"))
        .select(col("it.tok").as("tg"), col("it.est").as("est"))
      val nDf = docs.agg(
        sum((length(col("text")) - 2).cast("long")).as("n_grams"))
      grams.join(broadcast(retained), Seq("tg"))
        .groupBy(col("tg"), col("est"))
        .agg(count(lit(1)).as("exact_cnt"))
        .crossJoin(broadcast(nDf))
        .filter(col("exact_cnt") * (k + 1) > col("n_grams"))
        .select(col("tg"), col("exact_cnt"), col("n_grams"),
          when(col("est") <= col("exact_cnt"), 1L).otherwise(0L)
            .as("no_overcount"),
          when((col("exact_cnt") - col("est")) * (k + 1) <= col("n_grams"),
            1L).otherwise(0L).as("undercount_bounded"))
    }

    def incrVariant(d: String, persistGrams: Boolean): DataFrame = {
      import graft.ops.HeavyHitters
      val k = 128
      val docs = Tables.documents(spark, d)
        .filter(col("text").isNotNull && length(col("text")) >= 3)
      val grams0 = docs
        .select(pmod(col("doc_id"), lit(3)).as("batch"), col("text"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
        .select(col("batch"), col("text").substr(col("i"), lit(3)).as("tg"))
      val grams = if (persistGrams) grams0.persist(StorageLevel.MEMORY_AND_DISK) else grams0
      val perBatch = grams.groupBy("batch")
        .agg(HeavyHitters.mgTopK(k)(col("tg")).as("hh"))
        .select(col("batch"), explode(col("hh.items")).as("it"))
        .select(col("batch"), col("it.tok").as("tok"), col("it.est").as("est"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      perBatch.count()
      def batchSummary(b: Int) =
        perBatch.filter(col("batch") === b).select(col("tok"), col("est"))
      val state = HeavyHitters.mergeSummaries(
        HeavyHitters.mergeSummaries(batchSummary(0), batchSummary(1), k),
        batchSummary(2), k)
      val retained = state.select(col("tok").as("tg"), col("est"))
      val nDf = docs.agg(
        sum((length(col("text")) - 2).cast("long")).as("n_grams"))
      grams.join(broadcast(retained), Seq("tg"))
        .groupBy(col("tg"), col("est"))
        .agg(count(lit(1)).as("exact_cnt"))
        .crossJoin(broadcast(nDf))
        .filter(col("exact_cnt") * (k + 1) > col("n_grams"))
        .select(col("tg"), col("exact_cnt"), col("n_grams"),
          when(col("est") <= col("exact_cnt"), 1L).otherwise(0L)
            .as("no_overcount"),
          when((col("exact_cnt") - col("est")) * (k + 1) <= col("n_grams"),
            1L).otherwise(0L).as("undercount_bounded"))
    }

    // ---- KN marginal-window collapse prototypes ----
    // Identical arithmetic: every marginal value (cs/n1f/n1r/...) is the
    // same long the agg+join form computes; windows only change how the
    // value is ATTACHED to the type row (guide §2.4: two operations
    // keyed the same way share one exchange).
    def kn2Win(d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val df = Tables.documents(spark, d)
      val discount = graft.ops.Score.KnDiscount
      val bi = df
        .withColumn("__toks", TextMetrics.tokens(col("text")))
        .select(col("doc_id").as("id"),
          explode(graft.ops.Score.ngramStructs(col("__toks"), 2)).as("bg"))
        .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val types = cb.count().toDouble
      val w1w = Window.partitionBy("w1")
      val w2w = Window.partitionBy("w2")
      val p = (greatest(col("cb").cast("double") - discount, lit(0.0))
        + ((lit(discount) * col("n1f")) * col("n1r")) / lit(types)) / col("cs")
      val lpByType = cb
        .withColumn("n1r", count(lit(1)).over(w2w))
        .withColumn("cs", sum("cb").over(w1w))
        .withColumn("n1f", count(lit(1)).over(w1w))
        .withColumn("klp_q", floor(log(p) * 10000).cast("long"))
        .select("w1", "w2", "klp_q")
      val scored = bi
        .join(lpByType, Seq("w1", "w2"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_bigrams"), sum("klp_q").as("kn_lp_sum_q"))
      df.select(col("doc_id").as("id"))
        .join(scored, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("kn_lp_sum_q"), lit(0L)).as("kn_lp_sum_q"))
    }

    // kn3 with the scored join keyed on xxhash64(w1,w2,w3): the type
    // table's words feed the marginal windows, but the JOIN back to the
    // corpus occurrences only tests trigram equality and the words never
    // reach the output — both SMJ sides (≈ corpus-sized each) sort and
    // shuffle one long instead of three strings.
    def kn3Hashed(d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val df = Tables.documents(spark, d)
      val discount = graft.ops.Score.KnDiscount
      val toks = df.withColumn("__toks", TextMetrics.tokens(col("text")))
      val tri = toks
        .select(col("doc_id").as("id"),
          explode(graft.ops.Score.ngramStructs(col("__toks"), 3)).as("tg"))
        .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
          col("tg.w3").as("w3"))
      val bi = toks
        .select(explode(graft.ops.Score.ngramStructs(col("__toks"), 2)).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      val n1r = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .groupBy(col("w2").as("w3")).agg(count(lit(1)).as("n1r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val t2 = n1r.agg(sum("n1r")).collect()(0).getLong(0).toDouble
      val p2 = (greatest(col("n1p23").cast("double") - discount, lit(0.0))
        + ((lit(discount) * col("n1fc2")) * col("n1r")) / lit(t2)) /
        col("denom2")
      val p3 = (greatest(col("c3").cast("double") - discount, lit(0.0))
        + (lit(discount) * col("n1f3")) * col("__p2")) / col("cs3")
      val w2w = Window.partitionBy("w2")
      val w23 = Window.partitionBy("w2", "w3")
      val w12 = Window.partitionBy("w1", "w2")
      val lpByType = c3
        .withColumn("denom2", count(lit(1)).over(w2w))
        .withColumn("n1p23", count(lit(1)).over(w23))
        .withColumn("__f", when(row_number().over(
          Window.partitionBy("w2", "w3").orderBy("w1")) === 1, 1L)
          .otherwise(0L))
        .withColumn("n1fc2", sum("__f").over(w2w))
        .withColumn("cs3", sum("c3").over(w12))
        .withColumn("n1f3", count(lit(1)).over(w12))
        .join(n1r, Seq("w3"))
        .withColumn("__p2", p2)
        .withColumn("k3lp_q", floor(log(p3) * 10000).cast("long"))
        .select(xxhash64(col("w1"), col("w2"), col("w3")).as("k"),
          col("k3lp_q"))
      val scored = tri
        .select(col("id"), xxhash64(col("w1"), col("w2"), col("w3")).as("k"))
        .join(lpByType, Seq("k"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_trigrams"), sum("k3lp_q").as("kn3_lp_sum_q"))
      df.select(col("doc_id").as("id"))
        .join(scored, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
          coalesce(col("kn3_lp_sum_q"), lit(0L)).as("kn3_lp_sum_q"))
        .withColumn("ppl3_q",
          when(col("n_trigrams") > 0,
            floor((-col("kn3_lp_sum_q")).cast("double")
              / col("n_trigrams").cast("double")))
            .otherwise(lit(0L)).cast("long"))
    }

    def kn3Win(d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val df = Tables.documents(spark, d)
      val discount = graft.ops.Score.KnDiscount
      val toks = df.withColumn("__toks", TextMetrics.tokens(col("text")))
      val tri = toks
        .select(col("doc_id").as("id"),
          explode(graft.ops.Score.ngramStructs(col("__toks"), 3)).as("tg"))
        .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
          col("tg.w3").as("w3"))
      val bi = toks
        .select(explode(graft.ops.Score.ngramStructs(col("__toks"), 2)).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      // n1r / t2 from the bigram TYPE table: t2 = Σ n1r (one tiny agg
      // over the n1r sliver instead of a second pass over cb2)
      val n1r = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .groupBy(col("w2").as("w3")).agg(count(lit(1)).as("n1r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val t2 = n1r.agg(sum("n1r")).collect()(0).getLong(0).toDouble
      // window order: (w2) first ⇒ one exchange hash(w2) serves the
      // (w2), (w2,w3) and (w1,w2) clusterings (subset rule)
      val w2w = Window.partitionBy("w2")
      val w23 = Window.partitionBy("w2", "w3")
      val w12 = Window.partitionBy("w1", "w2")
      val p2 = (greatest(col("n1p23").cast("double") - discount, lit(0.0))
        + ((lit(discount) * col("n1fc2")) * col("n1r")) / lit(t2)) /
        col("denom2")
      val p3 = (greatest(col("c3").cast("double") - discount, lit(0.0))
        + (lit(discount) * col("n1f3")) * col("__p2")) / col("cs3")
      val lpByType = c3
        // denom2 = Σ_{w3} n1p23 per w2 = number of c3 TYPE rows per w2
        .withColumn("denom2", count(lit(1)).over(w2w))
        .withColumn("n1p23", count(lit(1)).over(w23))
        .withColumn("__f", when(row_number().over(
          Window.partitionBy("w2", "w3").orderBy("w1")) === 1, 1L).otherwise(0L))
        .withColumn("n1fc2", sum("__f").over(w2w))
        .withColumn("cs3", sum("c3").over(w12))
        .withColumn("n1f3", count(lit(1)).over(w12))
        .join(n1r, Seq("w3"))
        .withColumn("__p2", p2)
        .withColumn("k3lp_q", floor(log(p3) * 10000).cast("long"))
        .select("w1", "w2", "w3", "k3lp_q")
      val scored = tri
        .join(lpByType, Seq("w1", "w2", "w3"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_trigrams"), sum("k3lp_q").as("kn3_lp_sum_q"))
      df.select(col("doc_id").as("id"))
        .join(scored, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
          coalesce(col("kn3_lp_sum_q"), lit(0L)).as("kn3_lp_sum_q"))
        .withColumn("ppl3_q",
          when(col("n_trigrams") > 0,
            floor((-col("kn3_lp_sum_q")).cast("double")
              / col("n_trigrams").cast("double")))
            .otherwise(lit(0L)).cast("long"))
    }

  }

  /** (name, current-query, candidate) triples for the equivalence gate. */
  def all(spark: SparkSession, dir: String)
      : Seq[(String, String => DataFrame, String => DataFrame)] = {
    val b = new Builders(spark)
    Seq(
      ("kn2_score", d => graft.ops.Score.knBigramLogprobs(
        Tables.documents(spark, d), "doc_id", "text"), b.kn2Win _),
      ("kn3", d => queries.CurationQueries.knTrigram(spark, d), b.kn3Win _),
      ("span_hashed", d => queries.CurationQueries.spanRemoval(spark, d),
        b.spanHashed _),
      ("dupspans_hashed", d => queries.CurationQueries.dupSpans(spark, d),
        b.dupSpansHashed _),
      ("cont_hashed", d => queries.SimilarityQueries.containment(spark, d),
        b.contHashed _),
      ("ovl_grouped", d => queries.CurationQueries.sourceOverlap(spark, d),
        b.ovlGrouped _),
      ("wn_string_ref", d => queries.SimilarityQueries.winnowOverlap(spark, d),
        b.wnString _),
      // reference is the OLD string-ordered form (pjNoPersist — persist
      // presence cannot change rows), so this gates hashed ≡ string
      ("pj_hashed_vs_string", d => queries.SimilarityQueries.prefixJaccard(spark, d),
        b.pjNoPersist _),
      ("cont_hashed2", d => queries.SimilarityQueries.containment(spark, d),
        b.contHashed2 _),
      ("kn3_hashed", d => queries.CurationQueries.knTrigram(spark, d),
        b.kn3Hashed _))
  }
}

object R15Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val group = args.lift(1).getOrElse("pj")
    val spark = ProfileHarness.session(dir)
    val bld = new R15Variants.Builders(spark)
    import bld._
    if (group == "pjfoot") {
      // footprint of the corpus-volume `ordered` cache, string vs hashed
      // shingles: build each variant, materialize, read the block manager
      Seq("pj_full" -> (() => queries.SimilarityQueries.prefixJaccard(spark, dir)),
          "pj_hashed" -> (() => bld.pjHashed(dir))).foreach { case (name, fn) =>
        fn().write.mode("overwrite").format("noop").save()
        val stored = spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum
        println(f"PJFOOT $name%-10s cachedBytes=$stored%d (${stored / 1024.0 / 1024.0}%.1f MiB)")
        spark.catalog.clearCache()
      }
      spark.stop()
      return
    }
    val variants: Seq[(String, String => DataFrame)] = group match {
      case "pj" => Seq(
        "pj_full" -> (d => queries.SimilarityQueries.prefixJaccard(spark, d)),
        "pj_hashed" -> (d => pjHashed(d)),
        "pj_nopersist" -> (d => pjNoPersist(d)))
      case "span" => Seq(
        "span_full" -> (d => spanVariant(d, persistBase = true, persistGrams = true)),
        "span_nogram" -> (d => spanVariant(d, persistBase = true, persistGrams = false)),
        "span_nobase" -> (d => spanVariant(d, persistBase = false, persistGrams = true)),
        "span_nopersist" -> (d => spanVariant(d, persistBase = false, persistGrams = false)))
      case "spanh" => Seq(
        "span_full" -> (d => spanVariant(d, persistBase = true, persistGrams = true)),
        "span_hashed" -> (d => spanHashed(d)),
        "dupspans_full" -> (d => queries.CurationQueries.dupSpans(spark, d)),
        "dupspans_hashed" -> (d => dupSpansHashed(d)))
      case "hh" => Seq(
        "hh_persist" -> (d => hhVariant(d, persistGrams = true)),
        "hh_nopersist" -> (d => hhVariant(d, persistGrams = false)),
        "incr_persist" -> (d => incrVariant(d, persistGrams = true)),
        "incr_nopersist" -> (d => incrVariant(d, persistGrams = false)))
      case "kn" => Seq(
        "kn2_full" -> (d => queries.CurationQueries.knPerplexity(spark, d)),
        "kn2_win_score" -> (d => kn2Win(d)),
        "kn2_cur_score" -> (d => graft.ops.Score.knBigramLogprobs(
          Tables.documents(spark, d), "doc_id", "text")),
        "kn3_full" -> (d => queries.CurationQueries.knTrigram(spark, d)),
        "kn3_win" -> (d => kn3Win(d)),
        "kn3_hashed" -> (d => kn3Hashed(d)))
      case "cont" => Seq(
        "cont_full" -> (d => queries.SimilarityQueries.containment(spark, d)),
        "cont_hashed" -> (d => contHashed(d)),
        "cont_hashed2" -> (d => contHashed2(d)))
      case "ovl" => Seq(
        "ovl_full" -> (d => queries.CurationQueries.sourceOverlap(spark, d)),
        "ovl_grouped" -> (d => ovlGrouped(d)))
      case "wn" => Seq(
        "wn_hashed" -> (d => queries.SimilarityQueries.winnowOverlap(spark, d)),
        "wn_string" -> (d => wnString(d)))
      case "ivfpq" => Seq(
        "ivfpq_residual" -> (d => queries.SimilarityQueries.ivfPqResidual(spark, d)),
        "ivfpq_residual_fx" -> (d => queries.SimilarityQueries.ivfPqResidualFixed(spark, d)))
      case _ => sys.error(s"unknown group $group")
    }
    if (args.lift(2).contains("explain"))
      variants.foreach { case (name, fn) =>
        println(s"==== PLAN $name ====")
        println(fn(dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    else ProfileHarness.run(s"R15:$group", spark, dir, variants)
    spark.stop()
  }
}
