package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed, mergeable Spark
  * `Aggregator` — and, unlike the built-in `approx_count_distinct`
  * (whose register layout is engine-private, so its oracle check is
  * rows-only), FULLY hash-verifiable: it reuses the portable
  * [[KmvSketch.hash]] 31-bit integer hash, m = 64 buckets (p = 6) from
  * the low bits, and a 25-bit rho window from the high bits, so a
  * DuckDB oracle reproduces every register and the estimate bit-exactly
  * (rho via `length(bin(r))`, the estimate in pure integer fixed point).
  *
  * The estimate is the RAW HyperLogLog harmonic mean
  * alpha_m·m²/Z (Flajolet et al. 2007) with NO small/large-range
  * correction: the corrections switch on float thresholds and a
  * transcendental (m·ln(m/V)), which no cross-engine bit contract can
  * pin down. Raw HLL is deterministic, mergeable, and its known
  * small-cardinality bias (overestimates below ~2.5·m ≈ 160) is the
  * documented tradeoff — pair with the exact twin or KMV when the
  * regime is small. Z is scaled by 2^26 so every term 2^(26-reg) is an
  * integer; the final value is alpha·m²·2^26·2^20 / Z_scaled with a
  * single floor division — `hll_fp20` is the estimate in 2^-20 units.
  *
  * Buffer: 64 bytes of registers per group, elementwise-max merge —
  * constant memory, associative, commutative, spill-friendly; sketches
  * per shard/day can be stored and merged without re-scan exactly like
  * [[KmvSketch]].
  */
object HllSketch {

  /** Buckets (p = 6 low bits of the hash). */
  val M = 64

  /** rho window: hash < 2^31, so hash >> 6 has 25 significant bits. */
  val W = 25

  /** round(alpha_64 · 2^20) with alpha_64 = 0.7213/(1 + 1.079/64).
    * The exact integer is the cross-engine contract; its last-bit
    * accuracy only shifts the (already ~±13%) estimator bias.
    */
  val AlphaFp20 = 743822L

  def bucketOf(h: Long): Int = (h & (M - 1)).toInt

  /** Position of the leftmost 1-bit in the 25-bit window (1-based),
    * W + 1 when the window is all zeros — equals
    * `26 - length(bin(h // 64))` for nonzero windows in the oracle.
    */
  def rhoOf(h: Long): Int = {
    val r = h >>> 6
    if (r == 0L) W + 1
    else W - (63 - java.lang.Long.numberOfLeadingZeros(r))
  }

  /** Raw-HLL estimate in 2^-20 fixed point, all-integer: empty
    * registers contribute 2^26 to Z_scaled, a register holding reg
    * contributes 2^(26-reg).
    */
  def estFp20(regs: Array[Int]): Long = {
    var z = 0L
    var i = 0
    while (i < M) { z += 1L << (W + 1 - regs(i)); i += 1 }
    AlphaFp20 * M * M * (1L << (W + 1)) / z
  }

  final case class Buf(regs: Array[Int])

  class HllAggregator extends Aggregator[java.lang.Long, Buf, Long] {
    override def zero: Buf = Buf(new Array[Int](M))
    override def reduce(b: Buf, value: java.lang.Long): Buf = {
      if (value != null) {
        val h = KmvSketch.hash(value.longValue)
        val i = bucketOf(h)
        val r = rhoOf(h)
        if (r > b.regs(i)) b.regs(i) = r
      }
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < M) {
        if (b2.regs(i) > b1.regs(i)) b1.regs(i) = b2.regs(i)
        i += 1
      }
      b1
    }
    override def finish(b: Buf): Long = estFp20(b.regs)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Untyped column form for `groupBy(...).agg(...)`. */
  def hllFp20(): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAggregator, Encoders.LONG)
}
