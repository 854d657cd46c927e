package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed, mergeable `Aggregator` — the
  * scale-path alternative to `row_number().over(Window...)` for
  * "top k rows per group".
  *
  * A window top-k shuffles EVERY row to its group's partition and
  * sorts there; this aggregator reduces each map partition to at most
  * k entries per group before the exchange, so the shuffle carries
  * O(groups · k) rows no matter how large the fact table is — the
  * same partial-aggregation shape Spark gives `max`, applied to a
  * whole ranked row. Merge is associative and commutative, so the
  * result is partitioning-invariant.
  *
  * Ordering contract (total, deterministic, oracle-replicable):
  * by `v` (ascending when `asc`, else descending), then `t1`
  * ascending, then `t2` ascending. Ties beyond (v, t1, t2) cannot
  * exist because callers pass a unique (t1, t2) row key. `v` is a
  * double: exact for any parquet DOUBLE column and for integer keys
  * up to 2^53 (document ids, timestamps in micros) — callers with
  * wider keys must split them across t1/t2 instead.
  */
object TopKRows {

  /** One ranked entry: sort value + two tie-break/payload longs. */
  final case class Entry(v: Double, t1: Long, t2: Long)

  final case class Buf(entries: Array[Entry])

  class TopKAggregator(k: Int, asc: Boolean)
      extends Aggregator[Entry, Buf, Seq[Entry]] {

    // ascending lexicographic order on (±v, t1, t2); NaNs order last
    // like java.lang.Double.compare (same as Spark SQL and DuckDB)
    private def lt(a: Entry, b: Entry): Boolean = {
      val c0 = java.lang.Double.compare(a.v, b.v)
      val c = if (asc) c0 else -c0
      if (c != 0) c < 0
      else if (a.t1 != b.t1) a.t1 < b.t1
      else a.t2 < b.t2
    }

    override def zero: Buf = Buf(Array.empty[Entry])

    private def insert(buf: Buf, e: Entry): Buf = {
      val a = buf.entries
      if (a.length >= k && !lt(e, a(a.length - 1))) buf
      else {
        var ins = 0
        while (ins < a.length && lt(a(ins), e)) ins += 1
        val n = math.min(a.length + 1, k)
        val out = new Array[Entry](n)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = e
        System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
        Buf(out)
      }
    }

    override def reduce(b: Buf, e: Entry): Buf =
      if (e == null) b else insert(b, e)

    override def merge(b1: Buf, b2: Buf): Buf =
      b2.entries.foldLeft(b1)(insert)

    override def finish(b: Buf): Seq[Entry] = b.entries.toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped column form: `topK(3, asc = false)(v, t1, t2)` (three
    * flattened args, the udaf calling convention for a product input
    * encoder) yields `array<struct<v,t1,t2>>` sorted best-first;
    * posexplode for ranks.
    */
  def topK(k: Int, asc: Boolean): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAggregator(k, asc), Encoders.product[Entry])
}
