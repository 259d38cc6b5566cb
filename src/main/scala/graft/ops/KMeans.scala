package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd's k-means over an embedding column — the training
  * step behind the IVF index (ops.Similarity uses label-derived
  * centroids; this learns them unsupervised, the way a real IVF build
  * does).
  *
  * Scale shape per iteration: assignment is corpus ⨯ broadcast(k-row
  * centroid table) — the corpus is scanned once and never shuffled or
  * repartitioned; the centroid update is one keyed aggregate producing
  * k·dim rows, which are collected to the driver and re-broadcast as a
  * literal table for the next round. Driver state is k·dim longs —
  * small by construction — and pinning centroids on the driver keeps
  * the per-round plan depth CONSTANT (a lazy centroid lineage would
  * nest the whole previous round inside each new assignment plan).
  * This is the textbook distributed k-means layout; mini-batch or
  * sampled variants drop in by replacing the input DataFrame.
  *
  * Determinism/oracle design: all arithmetic is in integer-quantized
  * space. Vector components are floor-quantized to 1e-6 BIGINTs once at
  * load; centroid components are floor(avg(quantized)) BIGINTs;
  * distances are exact BIGINT sums of squared deltas; argmin ties break
  * on the lower cluster id. Every step is order-proof and reproduces
  * bit-identically in any engine — no float accumulation anywhere.
  */
object KMeans {

  val Quant = 1000000L  // 1e-6 component quantization

  /** Returns (assignments, centroids) after `iters` Lloyd rounds:
    * assignments = (idCol, cluster, dist_q); centroids = (cluster, cv)
    * with cv an array<long> of quantized components from the FINAL
    * update. Initial clusters are `id % k` — deterministic and seedless
    * (k-means++ would add a sampling pass; modulo init keeps the oracle
    * story simple). `dist_q` is the squared distance integer-divided by
    * [[Quant]] so downstream sums (inertia) can't overflow BIGINT.
    */
  def lloyd(emb: DataFrame, k: Int, iters: Int,
            idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._

    val qv = transform(col(vecCol).cast("array<double>"),
      x => floor(x * Quant.toDouble).cast("long"))
    val base = emb.select(col(idCol).as("id"), qv.as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // one aggregate job -> k·dim rows -> driver -> literal table
    def centroidsOf(assigned: DataFrame): DataFrame = {
      val flat = assigned.select(col("cluster"), posexplode(col("qv")))
        .groupBy("cluster", "pos")
        .agg(floor(avg(col("col"))).cast("long").as("c"))
        .collect()
      val packed = flat.groupBy(_.getInt(0)).toSeq.map { case (cl, rs) =>
        (cl, rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
      }.sortBy(_._1)
      packed.toDF("cluster", "cv")
    }

    def assign(cents: DataFrame): DataFrame =
      base.crossJoin(broadcast(cents))
        .withColumn("__dist",
          aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x))
        .groupBy("id")
        .agg(min(struct(col("__dist"), col("cluster"))).as("best"),
          first(col("qv")).as("qv")) // qv identical across the k copies
        .select(col("id"), col("best.cluster").as("cluster"),
          expr(s"best.__dist div $Quant").as("dist_q"), col("qv"))

    var cents = centroidsOf(
      base.withColumn("cluster", pmod(col("id"), lit(k)).cast("int")))
    var assigned = assign(cents)
    for (i <- 2 to iters) {
      cents = centroidsOf(assigned)
      assigned = assign(cents)
    }
    cents = centroidsOf(assigned)
    // materialize the final assignment BEFORE releasing the cached
    // input: the returned frame is lazy, and without this every caller
    // evaluation would recompute the whole assignment subtree uncached
    // (semDedup references it three times). localCheckpoint also pins
    // plan depth, like the connected-components loop.
    val out = assigned.select(col("id").as(idCol), col("cluster"),
      col("dist_q")).localCheckpoint()
    base.unpersist(blocking = false)
    (out, cents)
  }
}
