package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed, mergeable Spark
  * `Aggregator` — find every key whose frequency exceeds n/(k+1) in
  * ONE pass with k counters of state, no full `groupBy key` over an
  * unbounded key domain. The canonical use at 100 TB is vocabulary
  * triage: surfacing boilerplate/stopword tokens from a corpus whose
  * full term-count table would itself be a heavyweight shuffle.
  *
  * Guarantees (they survive ARBITRARY merge trees — Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - estimates never overcount: `est(x) ≤ true(x)`;
  *  - undercount is bounded: `true(x) − est(x) ≤ n/(k+1)`;
  *  - hence every key with `true(x) > n/(k+1)` is in the summary.
  *
  * The candidate SET and the estimates depend on partitioning/merge
  * order (only the bounds are invariant), so oracle-checked queries
  * must emit the CERTIFIED facts (exact counts of true heavy
  * hitters + the always-true bound booleans), never raw estimates —
  * the same price-the-approximation discipline as `q_bloom_fpr`.
  */
object MisraGries {

  /** Parallel arrays sorted by key; `counts(i)` > 0 invariantly. */
  final case class Buf(keys: Array[String], counts: Array[Long])

  /** Decrement every counter by `d`, dropping non-positive ones. */
  private def decay(keys: Array[String], counts: Array[Long],
      d: Long): Buf = {
    val kb = Array.newBuilder[String]
    val cb = Array.newBuilder[Long]
    var i = 0
    while (i < keys.length) {
      if (counts(i) > d) { kb += keys(i); cb += counts(i) - d }
      i += 1
    }
    Buf(kb.result(), cb.result())
  }

  private def insert(buf: Buf, key: String, add: Long, k: Int): Buf = {
    val pos = java.util.Arrays.binarySearch(
      buf.keys.asInstanceOf[Array[AnyRef]], key)
    if (pos >= 0) {
      val c = buf.counts.clone()
      c(pos) += add
      Buf(buf.keys, c)
    } else {
      val ins = -pos - 1
      val n = buf.keys.length
      val keys = new Array[String](n + 1)
      val counts = new Array[Long](n + 1)
      System.arraycopy(buf.keys, 0, keys, 0, ins)
      System.arraycopy(buf.counts, 0, counts, 0, ins)
      keys(ins) = key
      counts(ins) = add
      System.arraycopy(buf.keys, ins, keys, ins + 1, n - ins)
      System.arraycopy(buf.counts, ins, counts, ins + 1, n - ins)
      if (keys.length <= k) Buf(keys, counts)
      else {
        // over capacity: subtract the (k+1)-th largest count from all
        // (classic MG decrement generalized to merges), keep > 0
        val d = counts.sortedReverseKth(k)
        decay(keys, counts, d)
      }
    }
  }

  private implicit final class KthOps(private val a: Array[Long])
      extends AnyVal {
    /** (k+1)-th largest value of `a` (0-indexed k), a.length > k. */
    def sortedReverseKth(k: Int): Long = {
      val s = a.clone()
      java.util.Arrays.sort(s)
      s(s.length - 1 - k)
    }
  }

  class MgAggregator(k: Int)
      extends Aggregator[String, Buf, Seq[(String, Long)]] {
    require(k >= 1, s"k must be >= 1: $k")
    override def zero: Buf = Buf(Array.empty, Array.empty)
    override def reduce(b: Buf, key: String): Buf =
      if (key == null) b else insert(b, key, 1L, k)
    override def merge(b1: Buf, b2: Buf): Buf = {
      var b = b1
      var i = 0
      while (i < b2.keys.length) {
        b = insert(b, b2.keys(i), b2.counts(i), k)
        i += 1
      }
      b
    }
    override def finish(b: Buf): Seq[(String, Long)] =
      b.keys.zip(b.counts).toSeq
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Untyped column form for `groupBy(...).agg(...)` over a string
    * key column; emits `array<struct<_1: key, _2: estimate>>`.
    */
  def mgSummary(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MgAggregator(k), Encoders.STRING)
}
