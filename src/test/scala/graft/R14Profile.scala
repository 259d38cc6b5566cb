package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 decomposition of the bench's slowest queries (fresh top of
  * the sf0.1 panel this session): substage variants per query family,
  * [[ProfileHarness]] discipline, so the optimization targets the slice
  * that is actually hot (guide §1.1-1.2) instead of the r12 guess list.
  *
  *   sbt 'Test/runMain graft.R14Profile /root/testdata/sf0.1 hh'
  */
object R14Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val group = args.lift(1).getOrElse("hh")
    val spark = ProfileHarness.session()
    import graft.ops.HeavyHitters

    def grams(d: String): DataFrame = Tables.documents(spark, d)
      .filter(col("text").isNotNull && length(col("text")) >= 3)
      .select(col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("text").substr(col("i"), lit(3)).as("tg"))

    def gramsBatched(d: String): DataFrame = Tables.documents(spark, d)
      .filter(col("text").isNotNull && length(col("text")) >= 3)
      .select(pmod(col("doc_id"), lit(3)).as("batch"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("batch"), col("text").substr(col("i"), lit(3)).as("tg"))

    val variants: Seq[(String, String => DataFrame)] = group match {
      case "hh" => Seq(
        "grams_count" -> (d => grams(d).agg(count(lit(1)).as("n"))),
        "mg_global" -> (d => grams(d)
          .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))),
        "retained_only" -> (d => grams(d)
          .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))
          .select(explode(col("hh.items")).as("it"))
          .select(col("it.tok").as("tg"), col("it.est").as("est"))),
        "join_only" -> { d =>
          val retained = grams(d)
            .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))
            .select(explode(col("hh.items")).as("it"))
            .select(col("it.tok").as("tg"), col("it.est").as("est"))
          grams(d).join(broadcast(retained), Seq("tg"))
            .groupBy(col("tg"), col("est"))
            .agg(count(lit(1)).as("exact_cnt"))
        },
        "hh_full" -> (d => queries.RelationalQueries.heavyHitters(spark, d)),
        "incr_full" -> (d => queries.RelationalQueries.incrHeavy(spark, d)),
        "raw_full" -> (d => queries.RelationalQueries.heavyHittersRaw(spark, d)))
      case "pr" => Seq(
        "edges_only" -> { d =>
          Tables.lineitem(spark, d)
            .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
            .join(broadcast(Tables.nation(spark, d).select(
              col("n_nationkey").as("ck"), col("n_name").as("dst"))),
              col("c_nationkey") === col("ck"))
            .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
            .join(broadcast(Tables.nation(spark, d).select(
              col("n_nationkey").as("sk"), col("n_name").as("src"))),
              col("s_nationkey") === col("sk"))
            .groupBy("src", "dst")
            .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("long")).as("weight"))
        },
        "pr_full" -> (d => queries.TpchQueries.pagerankNations(spark, d)))
      case "cms" => Seq(
        "skL" -> (d => graft.ops.CountMin.sketch(
          Tables.lineitem(spark, d).select(col("l_orderkey").cast("string").as("k")),
          "k", width = 4096)),
        "skO" -> (d => graft.ops.CountMin.sketch(
          Tables.orders(spark, d).select(col("o_orderkey").cast("string").as("k")),
          "k", width = 4096)),
        "exact" -> (d => Tables.lineitem(spark, d).select(col("l_orderkey"))
          .join(Tables.orders(spark, d).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("exact_join"))),
        "cms_full" -> (d => queries.RelationalQueries.cmsJoinSize(spark, d)))
      case "kn" => Seq(
        "kn2_full" -> (d => queries.CurationQueries.knPerplexity(spark, d)),
        "kn3_full" -> (d => queries.CurationQueries.knTrigram(spark, d)))
      case "kn2" =>
        import org.apache.spark.storage.StorageLevel
        def bi(d: String, persist: Boolean) = {
          val b = Tables.documents(spark, d)
            .withColumn("__toks", graft.text.TextMetrics.tokens(col("text")))
            .select(col("doc_id").as("id"),
              explode(graft.ops.Score.ngramStructs(col("__toks"), 2)).as("bg"))
            .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          if (persist) b.persist(StorageLevel.MEMORY_AND_DISK) else b
        }
        Seq(
          "bi_count" -> (d => bi(d, false).agg(count(lit(1)).as("n"))),
          "cb_only" -> (d => bi(d, false).groupBy("w1", "w2")
            .agg(count(lit(1)).as("cb"))),
          "kn2_score_only" -> (d => graft.ops.Score.knBigramLogprobs(
            Tables.documents(spark, d), "doc_id", "text")),
          "kn2_full" -> (d => queries.CurationQueries.knPerplexity(spark, d)),
          "kn2_score_bipersist" -> { d =>
            // alternative scoring: persist the exploded bigrams so the
            // corpus tokenizes once (scored join reads the cache)
            val b = bi(d, true)
            val cb = b.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val cs = cb.groupBy("w1")
              .agg(sum("cb").as("cs"), count(lit(1)).as("n1f"))
            val cr = cb.groupBy("w2").agg(count(lit(1)).as("n1r"))
            val types = cb.count().toDouble
            val disc = graft.ops.Score.KnDiscount
            val p = (greatest(col("cb").cast("double") - disc, lit(0.0))
              + ((lit(disc) * col("n1f")) * col("n1r")) / lit(types)) / col("cs")
            val lpByType = cb.join(cs, Seq("w1")).join(cr, Seq("w2"))
              .withColumn("klp_q", floor(log(p) * 10000).cast("long"))
              .select("w1", "w2", "klp_q")
            b.join(lpByType, Seq("w1", "w2"))
              .groupBy("id")
              .agg(count(lit(1)).as("n_bigrams"), sum("klp_q").as("kn_lp_sum_q"))
          })
      case "tri" =>
        import graft.ops.Similarity
        def perNodeNoPersist(edges: DataFrame): DataFrame = {
          val e = edges
            .select(least(col("id_a"), col("id_b")).as("u"),
              greatest(col("id_a"), col("id_b")).as("v"))
            .filter(col("u") =!= col("v"))
            .distinct()
          val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
            .groupBy("id").agg(count(lit(1)).as("deg"))
          val withDeg = e
            .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
            .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
          val uFirst = col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v"))
          val oriented = withDeg.select(
            when(uFirst, col("u")).otherwise(col("v")).as("src"),
            when(uFirst, col("v")).otherwise(col("u")).as("dst"),
            when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
          val o1 = oriented.select(col("src"), col("dst").as("w1"), col("ddst").as("dw1"))
          val o2 = oriented.select(col("src"), col("dst").as("w2"), col("ddst").as("dw2"))
          val wedges = o1.join(o2, Seq("src"))
            .filter(col("dw1") < col("dw2") ||
              (col("dw1") === col("dw2") && col("w1") < col("w2")))
          val closing = oriented.select(col("src").as("w1"), col("dst").as("w2"))
          val tris = wedges.join(closing, Seq("w1", "w2"))
            .select(col("src").as("a"), col("w1").as("b"), col("w2").as("c"))
          tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
            .groupBy("id").agg(count(lit(1)).as("n_tri"))
        }
        def lshNoPersist(d: String): DataFrame = {
          val emb = Tables.embeddings(spark, d)
          val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          val banded = e
            .select(col("vec_id"), col("v"),
              explode(sequence(lit(0), lit(7))).as("t"))
            .select(col("vec_id"), col("t"),
              Similarity.lshBucketAt(col("v"), col("t") * 8 + 1, 8).as("bucket"))
          val pairs = banded.select(col("t"), col("bucket"), col("vec_id").as("id_a"))
            .join(banded.select(col("t"), col("bucket"), col("vec_id").as("id_b")),
              Seq("t", "bucket"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct()
          pairs
            .join(e.select(col("vec_id").as("id_a"), col("v").as("va")), Seq("id_a"))
            .join(e.select(col("vec_id").as("id_b"), col("v").as("vb")), Seq("id_b"))
            .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
            .filter(col("cosine") >= 0.25)
            .select("id_a", "id_b", "cosine")
        }
        Seq(
          "tri_persisted" -> (d => queries.SimilarityQueries.triNearDup(spark, d)),
          "tri_nopersist" -> (d => perNodeNoPersist(lshNoPersist(d))),
          "embed_persisted" -> (d => queries.SimilarityQueries.embedNearDup(spark, d)),
          "embed_nopersist" -> (d => lshNoPersist(d)))
      case "pj" =>
        import org.apache.spark.storage.StorageLevel
        import graft.ops.{SketchDedup, Skew}
        def pjBase(d: String) = Skew.ensureParallelism(
          Tables.documents(spark, d)
            .filter(trim(coalesce(col("text"), lit(""))) =!= "")
            .select(col("doc_id").as("id"), col("text").as("__t")))
          .select(col("id"),
            SketchDedup.shinglesFromTokens(
              graft.text.TextMetrics.tokens(col("__t")), 3).as("sh"))
        def pjOrdered(d: String) = {
          val base = pjBase(d).persist(StorageLevel.MEMORY_AND_DISK)
          val ex = base.select(col("id"), explode(col("sh")).as("s"))
          val rep = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
            .filter(col("df_s") > 1)
          ex.join(broadcast(rep), Seq("s"), "left")
            .select(col("id"), struct(
              coalesce(col("df_s"), lit(1L)).as("df_s"), col("s")).as("__ds"))
            .groupBy("id")
            .agg(array_sort(collect_list(col("__ds"))).as("ord"))
        }
        Seq(
          "pj_base" -> (d => pjBase(d).agg(count(lit(1)))),
          "pj_rep" -> { d =>
            val base = pjBase(d).persist(StorageLevel.MEMORY_AND_DISK)
            base.select(col("id"), explode(col("sh")).as("s"))
              .groupBy("s").agg(count(lit(1)).as("df_s"))
              .filter(col("df_s") > 1).agg(count(lit(1)))
          },
          "pj_ordered" -> (d => pjOrdered(d).agg(count(lit(1)))),
          "pj_full" -> (d => queries.SimilarityQueries.prefixJaccard(spark, d)))
      case "span" =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.storage.StorageLevel
        import graft.ops.Curation
        val n = Curation.DupSpanN
        val minDocs = Curation.DupSpanMinDocs
        def variantGramsPersist(d: String): DataFrame = {
          val df = Tables.documents(spark, d)
          val idCol = "doc_id"
          val base = df
            .select(col(idCol), graft.text.TextMetrics.tokens(col("text")).as("__toks"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val toks = base
            .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
          val grams = base
            .select(col(idCol), posexplode(
              when(size(col("__toks")) >= n,
                transform(sequence(lit(0), size(col("__toks")) - n),
                  i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
                .otherwise(array().cast("array<string>"))).as(Seq("gpos", "gram")))
            .persist(StorageLevel.MEMORY_AND_DISK)
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
        Seq(
          "span_full" -> (d => queries.CurationQueries.spanRemoval(spark, d)),
          "span_grams_persist" -> (d => variantGramsPersist(d)),
          "dupspans_full" -> (d => queries.CurationQueries.dupSpans(spark, d)),
          "dupspans_eager" -> { d =>
            val df = Tables.documents(spark, d)
            val spans = df
              .withColumn("__toks", graft.text.TextMetrics.tokens(col("text")))
              .select(col("doc_id"), explode(
                when(size(col("__toks")) >= n,
                  transform(sequence(lit(0), size(col("__toks")) - n),
                    i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
                  .otherwise(array().cast("array<string>"))).as("span"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            spans.count()
            val dup = spans.groupBy("span")
              .agg(countDistinct(col("doc_id")).as("__nd"))
              .filter(col("__nd") >= minDocs)
              .select(col("span"), lit(1).as("__dup"))
            val perDoc = spans
              .join(dup, Seq("span"), "left")
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
          })
      case _ => sys.error(s"unknown group $group")
    }
    if (args.lift(2).contains("explain"))
      variants.foreach { case (name, fn) =>
        println(s"==== PLAN $name ====")
        println(fn(dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    else ProfileHarness.run(s"R14:$group", spark, dir, variants)
    spark.stop()
  }
}
