package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus processing over [[SnapshotDiff]] — the
  * operational answer to "the crawl grew 1%, don't reprocess 100 TB":
  * recompute the per-document pipeline only for added + changed
  * documents, carry the previous run's rows forward for unchanged ones,
  * and let removed documents fall out.
  *
  * Soundness contract: `process` must be row-local (metrics, scoring,
  * masking, tokenisation — any per-doc projection), so a document's
  * output depends only on its own content; then carry-forward equals
  * recompute by construction (IncrementalSpec asserts the equality).
  * Corpus-global operators — dedup windows, document-frequency stats,
  * vocabulary builds — must re-run through the Orchestrator instead;
  * composing them here would silently serve stale global state.
  *
  * Scale shape: one co-keyed full-outer join for the diff, two
  * semi-joins keyed on the id to split work. The unchanged majority
  * never re-reads its text and never enters `process`'s plan; the
  * recompute side is delta-sized. With both snapshot tables bucketed on
  * the id every exchange disappears.
  */
object Incremental {

  /** Per-doc output for the current snapshot, recomputing only the
    * delta. `prev` is the previous corpus snapshot (id + textCol),
    * `prevOut` the previous run's `process` output keyed by the same
    * id. Content identity is md5(textCol) — the same fingerprint
    * convention as the snapshot-diff query surface.
    */
  def processDelta(cur: DataFrame, prev: DataFrame, prevOut: DataFrame,
                   process: DataFrame => DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    def fps(df: DataFrame): DataFrame =
      df.select(col(idCol),
        md5(coalesce(col(textCol), lit(""))).as("fingerprint"))
    // the diff feeds BOTH union branches: persist the (id, status)
    // sliver — ids only, never text — or each branch re-scans and
    // re-fingerprints both snapshots. RDD-level persist (the Pack
    // convention), NOT catalog-level: the blocks' lifetime then
    // follows the result frame's lineage and ContextCleaner releases
    // them once the caller drops it — a library caller (the
    // production incrementalRun CLI never calls clearCache) cannot
    // accumulate pinned cache entries across calls.
    val diffed = SnapshotDiff.diff(fps(prev), fps(cur), idCol)
      .select(col(idCol), col("status"))
    val d = cur.sparkSession.createDataFrame(
      diffed.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      diffed.schema)
    val todo = d.filter(col("status").isin("added", "changed"))
      .select(idCol)
    val keep = d.filter(col("status") === "unchanged").select(idCol)
    process(cur.join(todo, Seq(idCol), "left_semi"))
      .unionByName(prevOut.join(keep, Seq(idCol), "left_semi"))
  }

  /** Snapshot MERGE — the copy-on-write upsert/delete that produces the
    * NEXT corpus snapshot from the current one plus a change set (what
    * Delta/Iceberg `MERGE INTO` does, as plain relational algebra):
    * rows named by `deletes` fall out, rows named by `upserts` are
    * replaced wholesale, everything else carries forward untouched.
    * Feeding the result and the old snapshot to [[SnapshotDiff.diff]] /
    * [[processDelta]] closes the loop: merge → diff → delta-only
    * reprocess.
    *
    * Scale shape: two LEFT-ANTI joins keyed on the id plus a union —
    * the unchanged majority is never rewritten row-by-row, never
    * compared column-by-column, and its text never moves except
    * through the id joins. Change sets are delta-sized, so AQE
    * broadcasts both anti-join build sides; with the snapshot bucketed
    * on the id even that exchange disappears.
    *
    * Contract: `upserts` is keyed by the id. A duplicated upsert id
    * would silently emit a duplicate-id snapshot (which then fans out
    * through every later diff / processDelta id-join), so — like
    * Delta/Iceberg `MERGE INTO` on a multi-matching source — the merge
    * FAILS on one instead; a NULL upsert id fails too (a null-keyed
    * row can never be replaced or deleted later — the id anti-joins
    * never match null — so it would accumulate forever). The guard is
    * lazy and delta-sized: a broadcast null-safe self-count join plus
    * a raising filter (filters are never pruned away, so the check
    * cannot be optimized out). An id in both `deletes` and `upserts`
    * is well-defined: the old row falls out, the new version lands.
    *
    * The null-id guard covers ALL THREE inputs, not just upserts: a
    * null id in `deletes` would silently delete nothing (anti-joins
    * never match null), and a null-id row already in `snapshot` can
    * never be replaced or deleted by any later merge — both are the
    * same accumulate-forever hazard, so both raise. The snapshot check
    * is a per-row filter inside the scan the anti-joins already pay —
    * no extra pass, no shuffle.
    */
  def applyDelta(snapshot: DataFrame, upserts: DataFrame,
                 deletes: DataFrame,
                 idCol: String = "doc_id"): DataFrame = {
    def requireIds(df: DataFrame, which: String): DataFrame =
      df.filter(
        when(col(idCol).isNull,
          raise_error(lit(s"applyDelta: $which has a null id")))
          .otherwise(lit(true)))
    val dupIds = upserts.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_ups"))
      .filter(col("__n_ups") > 1)
      .select(col(idCol).as("__dup_id"), col("__n_ups"))
    // null-SAFE join: a plain USING join never matches null keys, which
    // would let duplicated null-id upserts slip past the guard
    val guarded = upserts
      .join(broadcast(dupIds), col(idCol) <=> col("__dup_id"), "left")
      .filter(
        when(col(idCol).isNull,
          raise_error(lit("applyDelta: upsert change set has a null id")))
          .when(col("__n_ups").isNotNull,
            raise_error(concat(
              lit("applyDelta: upsert change set has duplicate id "),
              col(idCol).cast("string"))))
          .otherwise(lit(true)))
      .drop("__dup_id", "__n_ups")
    requireIds(snapshot, "snapshot")
      .join(requireIds(deletes.select(col(idCol)), "delete change set"),
        Seq(idCol), "left_anti")
      .join(guarded.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(guarded)
  }

  /** Incremental distinct tracking: merge a NEW batch's per-group HLL
    * register table into the persisted state table — the "how many
    * distinct documents has this source ever sent us" monitor that at
    * 100 TB must never rescan history. Registers merge by idempotent
    * max ([[Hll.mergeMaps]]), so state(batches 1..n) is bit-identical
    * to a flat build over the union — which is exactly what the
    * q_incr_hll oracle computes. The join is group-keyed (state tables
    * are group-cardinality-sized, i.e. tiny next to the corpus);
    * either side may lack a group (new source / quiet source).
    */
  def mergeHllStates(state: DataFrame, batch: DataFrame): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    state.toDF("g", "ra")
      .join(batch.toDF("g", "rb"), Seq("g"), "full_outer")
      .as[(String, Map[Int, Int], Map[Int, Int])]
      .map { case (g, ra, rb) =>
        (g, Hll.mergeMaps(Option(ra).getOrElse(Map.empty),
          Option(rb).getOrElse(Map.empty)))
      }
      .toDF("g", "regs")
  }
}
