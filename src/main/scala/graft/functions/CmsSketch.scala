package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed, mergeable Spark `Aggregator` — the
  * bounded-memory frequency table for heavy-hitter estimation when
  * the true vocabulary (URLs, n-grams, user ids) is too large to
  * aggregate exactly at 100 TB.
  *
  * d hash rows × w counters; update adds 1 to one counter per row,
  * point query takes the MIN across rows — estimates are exact counts
  * plus non-negative collision noise (one-sided error ≤ εN with
  * w = ⌈e/ε⌉ at confidence 1−(1/2)^d). The buffer is a fixed
  * d·w-long array: constant memory per group, associative and
  * commutative merge (element-wise sum), spill-friendly.
  *
  * Like [[KmvSketch]] (and unlike library HLL/CountMinSketch objects
  * with private seeds), everything here is **deterministic and
  * portable**: fixed affine hashes over int64, so a DuckDB oracle
  * replicates sketch contents AND estimates bit-for-bit — collisions
  * included (see `q_cms_topk`, which is fully hash-verified, not a
  * rows-only sketch check).
  */
object CmsSketch {

  val P: Long = 2147483647L

  /** Per-row affine hash parameters (distinct odd multipliers). */
  val RowAB: Seq[(Long, Long)] = Seq(
    (1610612741L, 805306457L), (402653189L, 201326611L),
    (1566083941L, 12345L), (3145739L, 6291469L))

  def bucket(v: Long, row: Int, width: Int): Int = {
    val (a, b) = RowAB(row)
    val x = (a * (v % P) + b) % P
    ((if (x < 0) x + P else x) % width).toInt
  }

  final case class Buf(counts: Array[Long])

  class CmsAggregator(width: Int, depth: Int)
      extends Aggregator[java.lang.Long, Buf, Seq[Long]] {
    require(depth >= 1 && depth <= RowAB.size, s"depth must be in [1, ${RowAB.size}]")
    require(width >= 2, "width must be >= 2")
    override def zero: Buf = Buf(new Array[Long](width * depth))
    override def reduce(b: Buf, value: java.lang.Long): Buf = {
      if (value != null) {
        var r = 0
        while (r < depth) {
          b.counts(r * width + bucket(value.longValue, r, width)) += 1L
          r += 1
        }
      }
      b
    }
    override def merge(b1: Buf, b2: Buf): Buf = {
      var i = 0
      while (i < b1.counts.length) { b1.counts(i) += b2.counts(i); i += 1 }
      b1
    }
    override def finish(b: Buf): Seq[Long] = b.counts.toSeq
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Untyped column form: aggregates value hashes into the flattened
    * d×w counter array (row-major).
    */
  def cmsSketch(width: Int, depth: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CmsAggregator(width, depth), Encoders.LONG)
}
