package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected pair list — the graph
  * diagnostic the dedup family feeds: a genuine duplicate cluster is
  * CLIQUISH (every member pairs with every other → triangle-dense),
  * while a chain of borderline matches that connected-components would
  * happily glue into one cluster is triangle-FREE transitive drift.
  * Per-node triangle counts therefore separate "safe to keep one of
  * these" from "this cluster is an artifact of threshold chaining" —
  * a curation signal connected components ([[DupClusters]]) cannot
  * give.
  *
  * Algorithm: degree-ordered orientation (the standard scalable
  * scheme — Latapy's compact-forward / Suri–Vassilvitskii's MR
  * adaptation; public literature). Orient every edge from the
  * lower-(degree, id) endpoint to the higher; every triangle then has
  * exactly ONE vertex with out-degree 2 in it (its minimum), so
  * counting (wedge at u) ⋈ (closing oriented edge) counts each
  * triangle exactly once — AND the wedge fan-out per vertex is bounded
  * by its ORIENTED out-degree, which the orientation provably caps at
  * O(sqrt(|E|)) for any graph: the classic hub-killer (a celebrity
  * node of raw degree millions still has small out-degree, so no task
  * ever enumerates a hub's full neighborhood square). Joins are
  * hash-partitioned on vertex / edge keys; nothing is ever all-pairs.
  */
object Triangles {

  /** Per-node triangle participation counts (nodes in ≥1 triangle).
    * Input edges may carry duplicates/self-loops/either orientation —
    * canonicalized here.
    */
  def perNode(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    // total order: (degree, id) — orient small -> large
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    // wedges at src, endpoints ordered by the SAME total order, so the
    // closing edge — if present — is oriented exactly (w1 -> w2)
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
}
