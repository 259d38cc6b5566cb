package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Oracle-checkable HyperLogLog (Flajolet et al. 2007) — the graded
  * twin for the engine's Datasketches-HLL path (`q_hll_shards`), built
  * the same way the md5 MinHash twin proves the seeded-XXH64 MinHash:
  * identical algorithm, an ENGINE-PORTABLE hash, and integer-exact
  * state so a foreign engine replays every register.
  *
  * Design for cross-engine exactness:
  *  - hash = 60-bit md5 prefix (the engine-wide
  *    `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` convention):
  *    top [[P]] bits pick the register, the low [[RankBits]] carry the
  *    rank, so index and rank are pure integer functions of the value;
  *  - registers MERGE by max — commutative, associative, idempotent —
  *    so the sketch is partition-order-proof AND shard-merge-proof:
  *    two-level (shard → global) aggregation is bit-identical to a
  *    flat build, which is exactly what the oracle computes;
  *  - the indicator sum Σ 2^(−M_j) is kept as the EXACT integer
  *    Σ 2^(49−M_j) (≤ 4096·2⁴⁹ = 2⁶¹, inside a BIGINT on both
  *    engines) — no FP accumulation order anywhere in the state;
  *  - the estimate α·m²·2⁴⁹/S (with the standard small-range
  *    correction m·ln(m/V₀)) is single-expression IEEE arithmetic,
  *    floor-quantized ×100 per the engine's double-parity rule; the
  *    only libm residue is that final ln, the same fixed-fixture
  *    argument as the DDSketch bucket map.
  *
  * Buffer representation: the register table is a `collection.Map`
  * (idx → rank) with DdSketch's copy-on-upgrade discipline — within a
  * partition the buffer holds a `mutable.HashMap` updated in place;
  * a buffer arriving from deserialization is immutable and upgraded
  * with one copy. A flat `Array[Byte]` buffer under `Encoders.BINARY`
  * is NOT safe here: the typed-aggregate zero buffer is a shared
  * literal that binary deserialization ALIASES instead of copying, so
  * in-place writes leak one group's registers into the next (observed:
  * every group converged to the global union). The map form also keeps
  * small-cardinality partials proportional to what they saw instead of
  * 4 KB each.
  */
object Hll {

  /** Register-index bits: m = 2^P registers (standard HLL precision). */
  val P = 12
  val M: Int = 1 << P
  val RankBits = 48
  val HashHexChars = 15 // 60 bits = P + RankBits

  /** 60-bit md5-prefix hash of a key (engine side of the convention;
    * fused [[graft.plans.Md5PrefixLong]] kernel, bit-identical to the
    * conv/substring/md5 form the oracle replays).
    */
  def hash60(c: Column): Column =
    graft.plans.Md5PrefixLong(c.cast("string"), HashHexChars)

  /** Sparse register table: only registers with a nonzero rank. */
  case class Buf(regs: scala.collection.Map[Int, Int])

  /** (register-zero count, exact integer indicator sum Σ2^(49−M_j),
    * order-free register checksum Σ(idx+1)·M_idx, quantized estimate).
    */
  case class Est(v_zero: Long, s49: Long, reg_checksum: Long, est_q: Long)

  private type MMap = scala.collection.mutable.HashMap[Int, Int]

  private def asMutable(m: scala.collection.Map[Int, Int]): MMap = m match {
    case hm: MMap @unchecked => hm
    case other =>
      val hm = new scala.collection.mutable.HashMap[Int, Int](
        other.size * 2 + 8, scala.collection.mutable.HashMap.defaultLoadFactor)
      other.foreach { case (k, v) => hm.update(k, v) }
      hm
  }

  private def bump(m: MMap, idx: Int, rank: Int): Unit =
    if (rank > m.getOrElse(idx, 0)) m.update(idx, rank)

  /** (idx, rank) of a 60-bit hash: top 12 bits pick the register, the
    * rank is leading zeros within the 48-bit window + 1.
    */
  private def idxRank(h: Long): (Int, Int) = {
    val idx = (h >>> RankBits).toInt // h < 2^60, so idx < 4096
    val rest = h & ((1L << RankBits) - 1)
    val rank =
      if (rest == 0L) RankBits + 1
      else RankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    (idx, rank)
  }

  /** Sketch builder: 60-bit hashes → sparse register map. */
  val registers: Aggregator[Long, Buf, Map[Int, Int]] =
    new Aggregator[Long, Buf, Map[Int, Int]] {
      override def zero: Buf = Buf(new MMap())
      override def reduce(b: Buf, h: Long): Buf = {
        val (idx, rank) = idxRank(h)
        val m = asMutable(b.regs)
        bump(m, idx, rank)
        if (m eq b.regs) b else Buf(m)
      }
      override def merge(a: Buf, b: Buf): Buf = {
        val (big, small) =
          if (a.regs.size >= b.regs.size) (a, b) else (b, a)
        val m = asMutable(big.regs)
        small.regs.foreach { case (i, r) => bump(m, i, r) }
        if (m eq big.regs) big else Buf(m)
      }
      override def finish(b: Buf): Map[Int, Int] = b.regs.toMap
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[Int, Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Int]]()
    }

  /** Register merger for the second (shard → global) level. */
  val mergeRegisters: Aggregator[Map[Int, Int], Buf, Map[Int, Int]] =
    new Aggregator[Map[Int, Int], Buf, Map[Int, Int]] {
      override def zero: Buf = Buf(new MMap())
      override def reduce(b: Buf, in: Map[Int, Int]): Buf = {
        val m = asMutable(b.regs)
        in.foreach { case (i, r) => bump(m, i, r) }
        if (m eq b.regs) b else Buf(m)
      }
      override def merge(a: Buf, b: Buf): Buf = {
        val m = asMutable(a.regs)
        b.regs.foreach { case (i, r) => bump(m, i, r) }
        if (m eq a.regs) a else Buf(m)
      }
      override def finish(b: Buf): Map[Int, Int] = b.regs.toMap
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[Int, Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Int]]()
    }

  /** Driver-free register-table merge (idempotent max) — the state
    * update of the incremental path ([[Incremental.mergeHllStates]]):
    * old state ⊔ batch state, never a history rescan.
    */
  def mergeMaps(a: Map[Int, Int], b: Map[Int, Int]): Map[Int, Int] = {
    val m = new MMap()
    m ++= a
    b.foreach { case (i, r) => bump(m, i, r) }
    m.toMap
  }

  /** The finisher — deterministic arithmetic a foreign engine replays
    * term-for-term (operation ORDER mirrored in the oracle SQL: IEEE
    * multiplication is not associative).
    */
  def estimate(regs: Map[Int, Int]): Est = {
    val used = regs.size.toLong
    val vz = M - used
    var s = vz * (1L << (RankBits + 1))
    var chk = 0L
    regs.foreach { case (i, r) =>
      s += (1L << (RankBits + 1 - r))
      chk += (i + 1).toLong * r
    }
    val m = M.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val eRaw = alpha * m * m * 562949953421312.0 / s.toDouble // 2^49
    val e = if (eRaw <= 2.5 * m && vz > 0) m * math.log(m / vz.toDouble)
            else eRaw
    Est(vz, s, chk, math.floor(e * 100).toLong)
  }
}
