package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding matrix by POWER ITERATION
  * in quantized integer arithmetic — the dimensionality-reduction /
  * drift-detection primitive (which way does this corpus's embedding
  * cloud point?) that normally cannot hash-match across engines
  * because float accumulation is partition-order-dependent.
  *
  * The discipline (shared with the quantized k-means update and
  * integer PageRank): embeddings quantize once to xq = ⌊x·2^10⌋
  * longs (x cast float→double first — exact — so both engines scale
  * the same doubles); the direction lives as vq = 2^20-scaled longs;
  * each round computes u = Σ_rows (xq·vq)·xq with EXACT decimal(38)
  * sums (order-free under any partitioning), then renormalizes by the
  * max component: vq' = (u·2^20) div max|u| — truncating integer
  * division, identical in Java, BigInt, and DuckDB `//`. Every round
  * is therefore bit-reproducible and the whole 3-round iteration
  * hash-matches an unrolled SQL oracle. Sign is pinned by the fixed
  * all-ones start vector.
  *
  * Scale shape: one corpus pass per round — a narrow xq projection,
  * the per-row dot product, one posexplode into a (dim)-key hash agg;
  * the driver holds only the dim-length direction (the same O(1)-row
  * feedback as Bpe.learnMerges' argmax), which re-enters the next
  * round as a literal, so no growing lineage and no broadcast chain.
  * The higher-order zip_with/aggregate dot product is fine at profile
  * scale; at 100 TB swap in a codegen'd dot expression (the
  * [[graft.functions.VectorExpressions.FloatDotProduct]] pattern) —
  * the round structure is unchanged.
  */
object Pca {

  /** `iters` power-iteration rounds over `vecCol` (float array, all
    * rows length `dim`). Returns (k, vq): the 2^20-scaled quantized
    * principal direction, k 0-based. A zero matrix keeps the start
    * vector (div-by-zero guard); callers wanting the float direction
    * divide by 2^20.
    */
  def powerIterationTop(
      df: DataFrame,
      vecCol: String,
      iters: Int = 3,
      dim: Int = 64): DataFrame = {
    require(iters >= 1 && dim >= 1, "iters and dim must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(
      transform(col(vecCol),
        x => floor(x.cast("double") * 1024d).cast("long")).as("xq"))
    var v: IndexedSeq[BigInt] = IndexedSeq.fill(dim)(BigInt(1L << 20))
    for (_ <- 1 to iters) {
      val vlit = typedLit(v.map(_.toLong))
      val d = aggregate(
        zip_with(col("xq"), vlit, (x, w) => x * w), lit(0L), (acc, t) => acc + t)
      val u = rows.withColumn("d", d)
        .select(col("d"), posexplode(col("xq")).as(Seq("k", "x")))
        .groupBy("k")
        .agg(sum((col("d") * col("x")).cast("decimal(38,0)")).as("u"))
        .orderBy("k")
        .head(dim)
        .map(r => BigInt(r.getDecimal(1).toBigInteger))
      val mx = u.map(_.abs).max
      if (mx > 0) v = u.map(ui => ui * (1L << 20) / mx)
    }
    v.zipWithIndex
      .map { case (vq, k) => (k.toLong, vq.toLong) }
      .toDF("k", "vq")
  }
}
