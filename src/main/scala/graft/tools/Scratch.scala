package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Similarity, SketchDedup}

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n")
    }

    time("minhash COLD")(SketchDedup.minhashLshPairs(docs, "doc_id", "text").count())
    time("minhash WARM")(SketchDedup.minhashLshPairs(docs, "doc_id", "text").count())
    time("ann_topk COLD")(Similarity.annTopK(emb, 10, 5).count())
    time("ann_topk WARM")(Similarity.annTopK(emb, 10, 5).count())
    time("embed_neardup")(Similarity.nearDupPairsLsh(emb, 0.25, 16).count())
    time("ivf_assign")(Similarity.ivfAssign(emb).count())
    time("ngram_jaccard")(SketchDedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("simhash")(SketchDedup.simhashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
