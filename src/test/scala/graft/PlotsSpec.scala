package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Plots

/** S8 plot sink: distributed binning parity with plt.hist semantics,
  * PNG render integrity, empty/degenerate handling.
  */
class PlotsSpec extends SparkTestBase {

  private def tmpPng(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out.png").toString

  test("histogram bins match plt.hist semantics: equal width over [min,max], last bin closed") {
    import spark.implicits._
    // values 0..10 with bins=5 -> width 2: [0,2) [2,4) [4,6) [6,8) [8,10]
    // counts: {0,1}=2 {2,3}=2 {4,5}=2 {6,7}=2 {8,9,10}=3 (10 = max lands
    // in the LAST bin, not a phantom 6th — the right-closed rule)
    val df = (0 to 10).toDF("v")
    val Some((counts, lo, hi)) = Plots.histogramCounts(df, "v", bins = 5)
    assert((lo, hi) === (0.0, 10.0))
    assert(counts === Seq(2L, 2L, 2L, 2L, 3L))
  }

  test("histogram: nulls and NaNs are dropped like series.dropna()") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, Double.NaN, 3.0).toDF("v")
    val Some((counts, lo, hi)) = Plots.histogramCounts(df, "v", bins = 2)
    assert((lo, hi) === (1.0, 3.0))
    assert(counts.sum === 2L)
  }

  test("all-identical column degenerates to one full bar, empty writes nothing") {
    import spark.implicits._
    val Some((counts, _, _)) =
      Plots.histogramCounts(Seq(7, 7, 7).toDF("v"), "v", bins = 4)
    assert(counts === Seq(3L, 0L, 0L, 0L))
    val p = tmpPng("empty")
    assert(!Plots.writeHistogramPng(
      spark.emptyDataFrame.withColumn("v", lit(null).cast("double")),
      "v", p, "t", "x"))
    assert(!new java.io.File(p).exists())
  }

  test("histogram PNG: written, decodable, bars actually drawn") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = tmpPng("hist")
    assert(Plots.writeHistogramPng(docs.withColumn("n_chars", length(col("text"))),
      "n_chars", p, "Characters per document", "n_chars"))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(bytes.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.File(p))
    assert(img.getWidth === 800 && img.getHeight === 500)
    // at least one pixel in the bar color (matplotlib C0 blue)
    val blue = new java.awt.Color(31, 119, 180).getRGB
    val found = (0 until img.getWidth by 4).exists(x =>
      (0 until img.getHeight by 4).exists(y => img.getRGB(x, y) == blue))
    assert(found, "no bar pixels rendered")
  }

  test("bar-counts PNG: top-N value counts, deterministic, decodable") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = tmpPng("bars")
    assert(Plots.writeBarCountsPng(docs, "source", p,
      "Documents per source", "source", topN = 10))
    val img = javax.imageio.ImageIO.read(new java.io.File(p))
    assert(img !== null)
    // empty categorical -> false
    assert(!Plots.writeBarCountsPng(
      docs.filter(lit(false)), "source", tmpPng("b2"), "t", "x"))
  }
}
