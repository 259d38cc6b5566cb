package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the ANN compression path:
  * L2-normalize each d-dim embedding (so squared L2 is monotone with
  * cosine), split it into `m` subvectors, quantize every subvector
  * against a per-subspace codebook, and search in two stages: ADC
  * (asymmetric distance computation — the query stays exact, each
  * candidate costs `m` integer table lookups) produces a shortlist,
  * then exact cosine re-ranks it. The corpus is stored as `m` small
  * ints per vector — 16 bytes instead of 256 at d=64/m=16/float32 —
  * the difference between an embedding corpus that fits in executor
  * memory and one that doesn't.
  *
  * Codebooks here are per-subspace label means (one code per label) —
  * the same supervised stand-in [[Similarity.labelCentroids]] uses for
  * IVF, keeping every query DuckDB-oracle-checkable; production
  * codebooks come from running [[KMeans.lloyd]] per subspace (itself
  * oracle-checked) over a sample.
  *
  * Scale shape mirrors IVF: codebooks are m·k·(d/m) doubles — a
  * literal, never a join side — so encoding is a pure projection
  * (in-row argmin per subspace, no shuffle, no window; pinned by
  * spec), ADC search broadcasts |Q| query distance tables against the
  * encoded corpus into the bounded-heap top-k, and the rerank touches
  * only |Q|·shortlist rows.
  *
  * Float parity: subspace distances are left-to-right squared-L2 folds
  * (bit-identical to the oracle's list_reduce), then quantized to
  * 1e-4 BIGINT ticks BEFORE the cross-subspace sum — integer sums are
  * partition-order-proof, the repo's standard trick for cross-engine
  * float determinism.
  */
object Pq {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Unit-normalize (zero vectors pass through unscaled); the norm fold
    * mirrors the oracle's list_reduce exactly.
    */
  private def normalized(v: Column): Column = {
    val norm = sqrt(aggregate(transform(v, x => x * x),
      lit(0.0), (a, x) => a + x))
    when(norm > 0, transform(v, x => x / norm)).otherwise(v)
  }

  /** Per-subspace, per-label mean subvectors of the normalized corpus:
    * (m_idx ∈ [0,m), code = label, cv: array<double> of d/m dims).
    */
  def codebooks(emb: DataFrame, m: Int = 16, dim: Int = 64): DataFrame = {
    val sub = dim / m
    emb.select(col("label"), posexplode(normalized(asDouble(col("embedding")))))
      .toDF("label", "pos", "x")
      .withColumn("m_idx", (col("pos") / sub).cast("int"))
      .groupBy("label", "m_idx", "pos").agg(avg("x").as("cx"))
      .groupBy("m_idx", "label")
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("m_idx"), col("label").as("code"),
        expr("transform(pairs, p -> p.cx)").as("cv"))
  }

  /** Trained codebooks — the production path the label-mean stand-in
    * stands in for: [[KMeans.lloyd]] per subspace over the normalized
    * subvectors. Cluster ids are dense 0..k-1 by construction (modulo
    * init), satisfying the positional-lookup contract; quantized
    * centroid ticks divide back to doubles once (deterministic — no
    * accumulation). Centroid frames are driver-built and tiny, so the
    * m training runs collect immediately and the staged input releases
    * before returning.
    */
  def codebooksLloyd(emb: DataFrame, m: Int = 16, dim: Int = 64,
                     k: Int = 10, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = dim / m
    val staged = emb.select(col("vec_id"),
      normalized(asDouble(col("embedding"))).as("__vn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = (0 until m).flatMap { mi =>
      val (_, cents) = KMeans.lloyd(
        staged.select(col("vec_id"),
          slice(col("__vn"), lit(mi * sub + 1), lit(sub)).as("embedding")),
        k, iters)
      // a cluster can empty out during iteration (data-dependent, not
      // just init): re-index the surviving centroids densely 0..len-1
      // so the positional ADC contract always holds
      cents.collect().sortBy(_.getInt(0)).zipWithIndex.map { case (r, code) =>
        (mi, code, r.getSeq[Long](1).map(_.toDouble / KMeans.Quant))
      }
    }
    staged.unpersist(blocking = false)
    rows.toDF("m_idx", "code", "cv")
  }

  /** Total quantized reconstruction error of a codebook over the corpus
    * (Σ per vector per subspace of the best squared distance, in 1e-4
    * ticks summed as integers — order-proof). The PQ quality report:
    * lower is a strictly better quantizer; SimilaritySpec uses it to
    * prove trained codebooks beat the label-mean stand-in.
    */
  def reconstructionErrorQ(emb: DataFrame, cb: DataFrame,
                           m: Int = 16, dim: Int = 64): Long = {
    val sub = dim / m
    val cbl = codebookLiteral(cb, m)
    val perVec = (0 until m).map { mi =>
      floor(array_min(transform(element_at(cbl, mi + 1), c =>
        struct(l2sq(subVec(col("__vn"), lit(mi), sub), c.getField("cv")).as("dist"),
          c.getField("code").as("code"))))
        .getField("dist") * 1e4).cast("long")
    }.reduce(_ + _)
    emb.select(normalized(asDouble(col("embedding"))).as("__vn"))
      .select(perVec.as("e"))
      .agg(coalesce(sum("e"), lit(0L))) // empty corpus → 0, not a null NPE
      .collect()(0).getLong(0)
  }

  /** Encode against an explicit codebook table (label-mean or
    * [[codebooksLloyd]] — same (m_idx, code, cv) schema).
    */
  def encode(emb: DataFrame, cb: DataFrame, m: Int, dim: Int): DataFrame =
    encodeWith(emb, codebookLiteral(cb, m), m, dim)

  /** Codebooks collected to a nested literal:
    * element_at(lit, m_idx+1) = array<struct<code, cv>> sorted by code.
    *
    * Codes MUST be dense 0..k-1 in every subspace: the ADC table lookup
    * is positional (`element_at(tab, code + 1)`), so a sparse code set
    * would silently read the wrong distances. True for label codebooks
    * over a dense label column and for [[KMeans.lloyd]] cluster ids;
    * enforced loudly here rather than assumed.
    */
  private def codebookLiteral(cb: DataFrame, m: Int): Column = {
    import org.apache.spark.sql.types._
    val rows = cb.collect()
    // One Literal node for the whole m×k×(d/m) table. The
    // array(struct(lit..)) tree form this replaces put ~m·k·(d/m)
    // expression nodes into EVERY use site — encode references the
    // codebook once per subspace column, so the analyzed plan carried
    // m× that tree and Janino compiled all of it (~2 s of the measured
    // q_pq_encode time at m=16, k=10, d=64).
    val value: Seq[Seq[org.apache.spark.sql.Row]] = (0 until m).map { mi =>
      val sub = rows.filter(_.getInt(0) == mi).sortBy(_.getInt(1))
      val codes = sub.map(_.getInt(1)).toSeq
      require(codes == (0 until sub.length),
        s"PQ codebook codes must be dense 0..k-1 per subspace " +
          s"(subspace $mi has $codes); remap labels before building codebooks")
      sub.toSeq.map(r => org.apache.spark.sql.Row(r.getInt(1), r.getSeq[Double](2)))
    }
    val dt = ArrayType(ArrayType(StructType(Seq(
      StructField("code", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false),
        nullable = false))), containsNull = false), containsNull = false)
    org.apache.spark.sql.GraftSqlBridge.literal(value, dt)
  }

  /** Native codegen'd left-to-right squared-L2 fold
    * ([[graft.plans.L2SqDistance]]) — bit-identical to the oracle's
    * `list_reduce(list_transform(...), (a,b) -> a+b)` and to the
    * interpreted `aggregate(zip_with(...))` form it replaced (which
    * allocated a boxed pair array per call, m·k times per vector).
    */
  private def l2sq(a: Column, b: Column): Column =
    graft.plans.L2SqDistance(a, b)

  private def subVec(v: Column, mi: Column, sub: Int): Column =
    slice(v, mi * sub + 1, lit(sub))

  /** Encode every vector: per subspace, the code minimizing squared L2
    * to the normalized subvector (tie → smallest code, same as the
    * oracle's `ORDER BY dist, code` argmin window). Pure projection —
    * one row in, one row out, nothing shuffles. One int column per
    * subspace (`code_0..code_{m-1}`).
    */
  def encode(emb: DataFrame, m: Int = 16, dim: Int = 64): DataFrame =
    encodeWith(emb, codebookLiteral(codebooks(emb, m, dim), m), m, dim)

  private def encodeWith(emb: DataFrame, cbl: Column, m: Int,
                         dim: Int): DataFrame = {
    val sub = dim / m
    // ⚠ the normalized vector MUST be staged as a bound attribute: an
    // inline normalize subtree gets copied into every (subspace, code)
    // argmin lambda and re-folds the full 64-dim norm m·k times per row
    // (measured 90 s for 2 000 vectors; 0.5 s staged). Multi-use +
    // non-cheap keeps CollapseProject from re-inlining it.
    val staged = emb.select(col("vec_id"),
      normalized(asDouble(col("embedding"))).as("__vn"))
    val codeCols = (0 until m).map { mi =>
      array_min(transform(element_at(cbl, mi + 1), c =>
        struct(l2sq(subVec(col("__vn"), lit(mi), sub), c.getField("cv")).as("dist"),
          c.getField("code").as("code"))))
        .getField("code").as(s"code_$mi")
    }
    staged.select(col("vec_id") +: codeCols: _*)
  }

  /** ADC shortlist: per query, per subspace, a distance table over the
    * codebook (m·k quantized BIGINT ticks, computed in-row from the
    * literal); candidates pay m integer table lookups. Ranking through
    * the bounded-heap aggregate (never a per-query window); ties broken
    * by vec_id like every top-k in the engine.
    */
  def adcTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 100,
              m: Int = 16, dim: Int = 64): DataFrame = {
    val sub = dim / m
    // one codebook collect job feeds both the query tables and encode
    val cbl = codebookLiteral(codebooks(emb, m, dim), m)
    // same staging rule as encode (|Q| rows, but the blowup is m·k per
    // row either way)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        normalized(asDouble(col("embedding"))).as("__qn"))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), mi =>
          transform(element_at(cbl, mi + 1), c =>
            floor(l2sq(subVec(col("__qn"), mi, sub), c.getField("cv")) * 1e4)
              .cast("long"))).as("qtab"))
    val enc = encodeWith(emb, cbl, m, dim)
    val scored = enc
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("dist_q",
        (0 until m).map(mi => element_at(element_at(col("qtab"), mi + 1),
          col(s"code_$mi") + 1)).reduce(_ + _))
      .select(col("query_id"), col("vec_id"),
        (-col("dist_q").cast("double")).as("cosine"))
    // TopK ranks by (cosine DESC, vec_id) — negated distance gives
    // (dist ASC, vec_id); negate back on the way out.
    TopK.perQuery(scored, k)
      .select(col("query_id"), col("vec_id"),
        (-col("cosine")).cast("long").as("dist_q"), col("rank"))
  }

  /** Two-stage PQ search — the production shape: ADC shortlist over
    * compressed codes, exact cosine (on the raw vectors) re-ranks the
    * shortlist to the final top k. Rerank cost is |Q|·shortlist rows;
    * recall is the shortlist's (0.94 at shortlist=100 on the fixture,
    * measured in SimilaritySpec).
    */
  def adcRerankTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
                    shortlist: Int = 100, m: Int = 16,
                    dim: Int = 64): DataFrame = {
    val short = adcTopK(emb, nQueries, shortlist, m, dim)
      .select("query_id", "vec_id")
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("v")))
      .select("query_id", "vec_id", "cosine")
    TopK.perQuery(scored, k)
  }
}
