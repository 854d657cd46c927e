package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed, mergeable
  * Spark `Aggregator` — the bounded-memory building block for
  * cardinality estimation over 100 TB groups.
  *
  * Unlike HLL, KMV is **deterministic and portable**: the sketch is
  * just the k smallest distinct values of a fixed integer hash, so an
  * engine-independent oracle can replicate the result exactly (see
  * `q_kmv_distinct`). Estimator: exact count while fewer than k
  * distinct hashes have been seen; otherwise the classic
  * (k-1) * P / h_k with h_k the k-th smallest hash over [0, P).
  *
  * The buffer is a sorted array capped at k elements — constant
  * memory per group, associative+commutative merge, spill-friendly.
  */
object KmvSketch {

  val P: Long = 2147483647L
  val HashA: Long = 1610612741L
  val HashB: Long = 805306457L
  val HashA2: Long = 1566083941L
  val HashB2: Long = 12345L

  /** Portable value hash onto [0, P): affine round + quadratic round.
    * A single affine map sends sequential ids to an arithmetic
    * progression (badly biasing the k-th minimum); squaring mod P
    * scatters it. All intermediates fit int64, so the DuckDB oracle
    * replicates this exactly (no wrapping semantics needed).
    */
  def hash(v: Long): Long = {
    val x0 = (HashA * (v % P) + HashB) % P
    val x = if (x0 < 0) x0 + P else x0
    val y = ((x * x % P) * HashA2 + HashB2) % P
    if (y < 0) y + P else y
  }

  def estimateFrom(sorted: Seq[Long], k: Int): Double =
    if (sorted.size < k) sorted.size.toDouble
    else (k - 1).toDouble * P.toDouble / sorted(k - 1).toDouble

  final case class Buf(hashes: Array[Long])

  private def insert(buf: Buf, h: Long, k: Int): Buf = {
    val a = buf.hashes
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than current k minima
      else {
        val n = math.min(a.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
        Buf(out)
      }
    }
  }

  abstract class KmvAggregatorBase[OUT](k: Int)
      extends Aggregator[java.lang.Long, Buf, OUT] {
    override def zero: Buf = Buf(Array.emptyLongArray)
    override def reduce(b: Buf, value: java.lang.Long): Buf =
      if (value == null) b else insert(b, hash(value.longValue), k)
    override def merge(b1: Buf, b2: Buf): Buf =
      b2.hashes.foldLeft(b1)((b, h) => insert(b, h, k))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  class KmvAggregator(k: Int) extends KmvAggregatorBase[Double](k) {
    override def finish(b: Buf): Double = estimateFrom(b.hashes.toSeq, k)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Sketch-valued variant: returns the sorted k-minimum hash array
    * itself, so sketches can be STORED (per day / per shard) and
    * merged later without re-scanning — the union of per-group
    * k-minima contains the global k minima, so a downstream
    * distinct+sort+slice over collected sketches reproduces the exact
    * whole-corpus sketch. See `q_kmv_merge`.
    */
  class KmvHashesAggregator(k: Int) extends KmvAggregatorBase[Seq[Long]](k) {
    override def finish(b: Buf): Seq[Long] = b.hashes.toSeq
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped column form for use in `groupBy(...).agg(...)`. */
  def kmvDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k), Encoders.LONG)

  /** Untyped column form of [[KmvHashesAggregator]]. */
  def kmvHashes(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvHashesAggregator(k), Encoders.LONG)
}
