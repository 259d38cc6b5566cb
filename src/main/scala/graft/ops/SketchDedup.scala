package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextMetrics

/** Sketch-based near-deduplication at scale: MinHash+LSH, SimHash, and
  * n-gram Jaccard with key blocking (the reference's own scaling plan,
  * README.md:134-136, prescribes exactly this family; implementations
  * follow the standard public formulations — Broder '97 minhash / LSH
  * banding, Charikar '02 simhash).
  *
  * Scale shape shared by all three: per-row sketch (narrow, codegen) ->
  * explode candidate keys -> hash-partitioned self-join per key ->
  * verify only candidate pairs. The all-pairs join never happens.
  */
object SketchDedup {

  /** Distinct word k-shingles; shorter docs collapse to one shingle. */
  def wordShingles(c: Column, k: Int = 3): Column = {
    val toks = TextMetrics.tokens(c)
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: numHashes seeded xxhash64 min-folds over the
    * shingle set. Seeding via the first hash argument (xxhash64(j, s))
    * keeps it one codegen'd expression per row.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      when(size(shingles) > 0,
        array_min(transform(shingles, s => xxhash64(j, s))))
        .otherwise(lit(Long.MaxValue)))

  /** LSH band keys: hash each band of `rowsPerBand` signature slots. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      concat_ws("_", lit(b),
        xxhash64(lit(b), concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))))): _*)

  /** MinHash+LSH candidate pairs, verified with exact shingle Jaccard.
    * bands×rowsPerBand must equal numHashes; the (bands, rows) choice
    * sets the S-curve threshold ≈ (1/bands)^(1/rows).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sketched = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("band_key", explode(bandKeys(col("sig"), bands, rowsPerBand)))
    val a = sketched.select(col("band_key"), col("id").as("id_a"))
    val b = sketched.select(col("band_key"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shingleSets = df.select(col(idCol).as("sid"),
      wordShingles(col(textCol), shingleSize).as("sset"))
    candidates
      .join(shingleSets.withColumnRenamed("sid", "id_a")
        .withColumnRenamed("sset", "sh_a"), Seq("id_a"))
      .join(shingleSets.withColumnRenamed("sid", "id_b")
        .withColumnRenamed("sset", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens (FNV-1a token hashes; UDF —
    * the per-bit majority vote is a tight scalar loop, not worth 64
    * higher-order passes per row).
    */
  val simhash64 = udf { (s: String) =>
    if (s == null) 0L
    else {
      val toks = s.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) 0L
      else {
        val counts = new Array[Int](64)
        toks.foreach { t =>
          var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
          var i = 0
          while (i < t.length) {
            h ^= t.charAt(i).toLong
            h *= 0x100000001b3L
            i += 1
          }
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
        var sig = 0L
        var bit = 0
        while (bit < 64) {
          if (counts(bit) > 0) sig |= (1L << bit)
          bit += 1
        }
        sig
      }
    }
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit sketch into four 16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 shares at
    * least one exact chunk), join per chunk, verify exact distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sketched = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sig"))
      .withColumn("chunk", explode(array((0 until 4).map(i =>
        concat_ws("_", lit(i),
          shiftright(col("sig"), 16 * i).bitwiseAND(lit(0xFFFFL)))): _*)))
    val a = sketched.select(col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sketched.select(col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard pairs with first-k-token key blocking —
    * fully SQL-expressible (oracle-checkable) near-dup variant.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, blockTokens: Int = 8,
                        threshold: Double = 0.8): DataFrame = {
    val toks = TextMetrics.tokens(col(textCol))
    val keyed = df
      .filter(trim(coalesce(col(textCol), lit(""))) =!= "")
      .select(col(idCol).as("id"),
        concat_ws(" ", slice(toks, 1, blockTokens)).as("block_key"),
        wordShingles(col(textCol), shingleSize).as("sh"))
    val a = keyed.select(col("block_key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = keyed.select(col("block_key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block_key")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
