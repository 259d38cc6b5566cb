package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.DotProduct

/** Trained quality classifier: feature-hashed bag-of-words logistic
  * regression, the model class behind fastText-style corpus curation
  * filters (CCNet's wiki-vs-crawl LM proxy, DCLM's fastText quality
  * classifier, FineWeb-Edu's educational-value scorer — all are
  * "cheap linear model over hashed text features, applied to every
  * document"). The engine's heuristic quality surface (ops/Score,
  * q_quality_ensemble) is rule-based; this adds the LEARNED filter:
  * fit on a labeled sliver, score the whole corpus.
  *
  * Reference scope note: the reference pipeline has no trained
  * classifier (its quality stage is hand rules,
  * `text_clean_and_filter.py`); this operator is part of the
  * beyond-reference LLM-curation surface the builder brief asks for.
  *
  * == Design ==
  *
  * Features: the existing feature-hashing projection
  * ([[HashedEmbed.hashedVector]], a compiled one-pass kernel) — signed
  * token counts in `dim` buckets, no vocabulary, no fitting, so the
  * feature step is a pure map and shares its codegen pass with any
  * other scalar stage.
  *
  * Training: full-batch gradient descent on L2-regularized logistic
  * loss. One Spark job per iteration: broadcast the weight vector,
  * fold a per-partition dense gradient, combine on the driver IN
  * PARTITION-INDEX ORDER. That ordering is the determinism keystone —
  * floating-point addition is not associative, so a treeAggregate
  * whose combine order depends on task completion would give
  * run-to-run different low bits; folding partition gradients in
  * sorted order makes training bit-reproducible for a fixed input
  * layout (pinned in ClassifierSpec: two trainings, identical
  * weights).
  *
  * == 100 TB shape ==
  *
  * Fitting and scoring scale differently and the API keeps them
  * apart. SCORING is the corpus-scale path: one broadcast weight
  * literal, one [[graft.plans.DotProduct]] per row inside whole-stage
  * codegen — exactly as scalable as `length(text)`. TRAINING runs on
  * a labeled sliver (10^5..10^6 docs — no curation classifier trains
  * on the full crawl); per-iteration driver state is
  * numPartitions × dim doubles, so at the documented ceiling
  * (dim 2^18, 1024 training partitions) the combine is 2 GB spread
  * over the job, or cap training parallelism with coalesce. The
  * dense per-partition gradient buffer is dim doubles per task —
  * constant memory regardless of row count.
  */
object Classifier {

  /** A fitted linear model: score(x) = sigmoid(w·x + b). */
  final case class LogisticModel(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
    /** Columnar inference over an array<double> feature column: one
      * codegen dot product against the weight literal per row.
      */
    def scoreCol(feat: Column): Column = {
      val w = typedlit[Seq[Double]](weights.toSeq)
      lit(1.0) / (lit(1.0) + exp(-(DotProduct(feat, w) + lit(bias))))
    }
  }

  /** Hashed bag-of-words features for a token-array column. */
  def features(toks: Column, dim: Int): Column =
    HashedEmbed.hashedVector(toks, dim)

  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Fit L2-regularized logistic regression by full-batch GD.
    *
    * @param df       training rows
    * @param featCol  array<double> column of length `dim` (e.g. [[features]])
    * @param labelCol 0/1 label column (anything castable to double)
    * @param iters    gradient steps (fixed count — no data-dependent
    *                 stopping, part of the determinism contract)
    * @param lr       learning rate
    * @param l2       L2 penalty on weights (bias unpenalized)
    */
  def trainLogistic(df: DataFrame, featCol: String, labelCol: String,
      dim: Int, iters: Int = 50, lr: Double = 0.5,
      l2: Double = 1e-4): LogisticModel = {
    val spark = df.sparkSession
    val data = df.select(col(featCol), col(labelCol).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = data.count().toDouble
      require(n > 0, "trainLogistic: empty training set")
      val w = new Array[Double](dim)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val bw = spark.sparkContext.broadcast(w)
        val bb = b
        // (partitionIndex, gradW, gradB) — the per-partition fold is
        // sequential in row order; the driver combine below is sorted
        // by index, so the full gradient is a fixed-order sum.
        val parts = data.rdd.mapPartitionsWithIndex { (idx, rows) =>
          val ww = bw.value
          val g = new Array[Double](ww.length)
          var gb = 0.0
          rows.foreach { row =>
            val x = row.getSeq[Double](0)
            val y = row.getDouble(1)
            var z = bb
            var i = 0
            val m = math.min(x.length, ww.length)
            while (i < m) { z += ww(i) * x(i); i += 1 }
            val e = sigmoid(z) - y
            i = 0
            while (i < m) { g(i) += e * x(i); i += 1 }
            gb += e
          }
          Iterator((idx, (g, gb)))
        }.collect()
        val grad = new Array[Double](dim)
        var gradB = 0.0
        parts.sortBy(_._1).foreach { case (_, (g, gb)) =>
          var i = 0
          while (i < dim) { grad(i) += g(i); i += 1 }
          gradB += gb
        }
        var i = 0
        while (i < dim) { w(i) -= lr * (grad(i) / n + l2 * w(i)); i += 1 }
        b -= lr * (gradB / n)
        bw.destroy()
        it += 1
      }
      LogisticModel(w, b)
    } finally data.unpersist()
  }

  /** Mean logistic loss of a model over a labeled frame — one
    * aggregation, used by the spec to assert training monotonicity.
    */
  def logLoss(df: DataFrame, featCol: String, labelCol: String,
      model: LogisticModel): Double = {
    val p = model.scoreCol(col(featCol))
    val y = col(labelCol).cast("double")
    // clamp away from {0,1} so the log is finite
    val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
    df.select(avg(-(y * log(pc) + (lit(1.0) - y) * log(lit(1.0) - pc))))
      .head().getDouble(0)
  }
}
