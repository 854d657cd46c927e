package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic hash-reservoir sample as a typed, mergeable Spark
  * `Aggregator`: keeps the values of the k keys with SMALLEST portable
  * hash — a uniform sample that, unlike `reservoir sampling` with an
  * RNG, is identical under any partitioning, merge order, or engine
  * (the [[KmvSketch]] discipline applied to value sampling), so
  * sample-based quantile estimates are bit-replicable in a DuckDB
  * oracle. The third fully-hash-verified sketch family next to KMV
  * and count-min — where the library KLL/HLL sketches are rows-only
  * checkable, this one's estimates themselves hash-match.
  *
  * Buffer: two parallel arrays (hash-sorted), capped at k — constant
  * memory, associative + commutative merge, spill-friendly. Distinct
  * keys colliding on the 31-bit hash (expected a handful per 100 k
  * keys) dedupe to the MINIMUM value — an order-free tie-break, so
  * the sample stays bit-deterministic under any merge order; "first
  * seen wins" would not.
  */
object ReservoirSketch {

  final case class QBuf(hs: Array[Long], vs: Array[Double])

  private def insert(b: QBuf, h: Long, v: Double, k: Int): QBuf = {
    val pos = java.util.Arrays.binarySearch(b.hs, h)
    if (pos >= 0) {
      // hash collision across distinct keys: min value, order-free
      if (v < b.vs(pos)) b.vs(pos) = v
      b
    } else {
      val ins = -pos - 1
      if (ins >= k) b
      else {
        val n = math.min(b.hs.length + 1, k)
        val hs = new Array[Long](n)
        val vs = new Array[Double](n)
        System.arraycopy(b.hs, 0, hs, 0, ins)
        System.arraycopy(b.vs, 0, vs, 0, ins)
        hs(ins) = h
        vs(ins) = v
        System.arraycopy(b.hs, ins, hs, ins + 1, n - ins - 1)
        System.arraycopy(b.vs, ins, vs, ins + 1, n - ins - 1)
        QBuf(hs, vs)
      }
    }
  }

  /** Returns the SORTED sampled values (ascending) — quantile reads
    * are positional lookups on this array.
    */
  class ReservoirAggregator(k: Int)
      extends Aggregator[(java.lang.Long, java.lang.Double), QBuf, Seq[Double]] {
    require(k >= 1, "reservoir size must be positive")
    override def zero: QBuf = QBuf(Array.emptyLongArray, Array.emptyDoubleArray)
    override def reduce(b: QBuf, in: (java.lang.Long, java.lang.Double)): QBuf =
      if (in == null || in._1 == null || in._2 == null) b
      else insert(b, KmvSketch.hash(in._1.longValue), in._2.doubleValue, k)
    override def merge(b1: QBuf, b2: QBuf): QBuf = {
      var b = b1
      var i = 0
      while (i < b2.hs.length) { b = insert(b, b2.hs(i), b2.vs(i), k); i += 1 }
      b
    }
    override def finish(b: QBuf): Seq[Double] = b.vs.toSeq.sorted
    override def bufferEncoder: Encoder[QBuf] = Encoders.product[QBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Untyped column form: call with `(keyCol, valueCol)` — the tuple
    * encoder flattens to two SQL arguments. */
  def reservoir(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new ReservoirAggregator(k),
      ExpressionEncoder[(java.lang.Long, java.lang.Double)]())
}
