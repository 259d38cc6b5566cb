package graft

import graft.ops.Similarity

/** Approximation quality of the scale paths, measured against their
  * exact counterparts on the sf0.001 fixture (deterministic data, so
  * the recall floors are stable pins, not flaky statistics).
  */
class SimilaritySpec extends SparkTestBase {

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("IVF probe search: usable recall, monotone in probe count") {
    def topk(probes: Int) =
      Similarity.ivfTopK(emb, nQueries = 10, k = 5, probes = probes)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.annTopK(emb, nQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = (exact & topk(2)).size.toDouble / exact.size
    val r4 = (exact & topk(4)).size.toDouble / exact.size
    println(s"SIM ivf recall probes=2 $r2, probes=4 $r4")
    // the fixture's labels are weak clusters: 2/10 probes recovering
    // over a third of exact neighbours is the pinned floor
    assert(r2 >= 0.35, s"IVF recall degraded to $r2")
    assert(r4 >= r2, "more probes must not lose recall")
  }

  test("PQ: rerank recovers exact top-k through the compressed shortlist; encode is shuffle-free") {
    import graft.ops.Pq
    val exact = Similarity.annTopK(emb, nQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pure ADC at k=5 is a coarse ranking (10-code reconstructions);
    // the two-stage shape is the product: shortlist=100 → exact rerank
    val reranked = Pq.adcRerankTopK(emb, nQueries = 10, k = 5, shortlist = 100)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & reranked).size.toDouble / exact.size
    println(s"SIM pq rerank recall = $recall")
    assert(recall >= 0.9, s"PQ rerank recall degraded to $recall")
    // encode must be a pure projection: no exchange anywhere
    val plan = Pq.encode(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PQ encode shuffles:\n$plan")
    // codes are confined to the codebook's label range
    val codes = Pq.encode(emb).collect()
    assert(codes.forall(r => (1 to 16).forall { i =>
      val c = r.getInt(i); c >= 0 && c <= 9
    }))
  }

  test("Lloyd-trained PQ codebooks cut reconstruction error vs label means") {
    import graft.ops.Pq
    val label = Pq.codebooks(emb, m = 4, dim = 64)
    val trained = Pq.codebooksLloyd(emb, m = 4, dim = 64, k = 10, iters = 3)
    val eLabel = Pq.reconstructionErrorQ(emb, label, m = 4, dim = 64)
    val eTrained = Pq.reconstructionErrorQ(emb, trained, m = 4, dim = 64)
    println(s"SIM pq recon error: label=$eLabel trained=$eTrained")
    // Lloyd optimizes exactly this objective; label means are arbitrary
    // partitions of weak clusters
    assert(eTrained < eLabel,
      s"training did not improve the quantizer: $eTrained vs $eLabel")
    // trained codebooks satisfy the dense-code contract end to end
    assert(Pq.encode(emb, trained, m = 4, dim = 64).count() === emb.count())
  }

  test("multi-table LSH near-dup: exact precision, usable recall") {
    val threshold = 0.25
    val exact = Similarity.nearDupPairsBrute(emb, threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.nearDupPairsLsh(emb, threshold, nbits = 8, tables = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair must be a true pair (verification is exact)...
    assert((approx -- exact).isEmpty, "LSH emitted a non-pair")
    // ...and banding should recover the expected share
    // (≈ 1-(1-p^8)^8 ≈ 0.1 at this low threshold; near-dup thresholds
    // ≥0.9 would recall far more — documented trade)
    if (exact.nonEmpty) {
      val recall = (exact & approx).size.toDouble / exact.size
      println(s"SIM lsh recall = $recall (${exact.size} true pairs)")
      assert(recall >= 0.05, s"LSH recall degraded to $recall")
    }
  }
}
