package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-level embedding aggregation: per-group centroids are the
  * building block for IVF codebook training, per-class prototypes,
  * and drift monitoring over an embedded corpus.
  *
  * Two variants:
  *  - [[meanCentroids]] — the plain float mean. Right for production,
  *    but a float sum's value depends on partition merge order, so it
  *    is library-path only (spec-tested, no cross-engine oracle).
  *  - [[quantizedCentroids]] — components are first quantized to
  *    integers (floor(x·2^bits), exact dyadic scaling in double),
  *    summed exactly in long, and divided back in a fixed order.
  *    Every step is bit-deterministic under any partitioning and
  *    bit-identical cross-engine, so this is the oracle-verified path
  *    — and quantized centroids are themselves a standard trick in
  *    quantized vector stores.
  *
  * Scale shape: posexplode to (grp, pos, component) then one
  * map-side-combinable hash agg keyed (grp, pos) — shuffle carries
  * one partial per (group, dimension) per partition, never vectors.
  */
object Embeddings {

  /** (grp, pos, centroid, n): exact quantized mean per group and
    * dimension; pos is 0-based. centroid = (Σ floor(x·2^bits)) / n /
    * 2^bits — two correctly-rounded double divisions of exact longs.
    */
  def quantizedCentroids(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      scaleBits: Int = 10): DataFrame = {
    val scale = (1L << scaleBits).toDouble
    df
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("grp"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * scale).cast("long").as("q"))
      .groupBy("grp", "pos")
      .agg(sum(col("q")).as("qsum"), count(lit(1)).as("n"))
      .select(
        col("grp"), col("pos"),
        ((col("qsum").cast("double") / col("n").cast("double")) / scale)
          .as("centroid"),
        col("n"))
  }

  /** Per-dimension mean product term for [[centroidDrift]]'s folds
    * (quantized at 2^10 — the [[quantizedCentroids]] convention),
    * token-shared with the oracle.
    */
  val DriftDot: String =
    """(CAST(x.qa AS DOUBLE)/CAST(x.na AS DOUBLE)/1024.0)
       * (CAST(x.qb AS DOUBLE)/CAST(x.nb AS DOUBLE)/1024.0)"""
  val DriftAa: String =
    """(CAST(x.qa AS DOUBLE)/CAST(x.na AS DOUBLE)/1024.0)
       * (CAST(x.qa AS DOUBLE)/CAST(x.na AS DOUBLE)/1024.0)"""
  val DriftBb: String =
    """(CAST(x.qb AS DOUBLE)/CAST(x.nb AS DOUBLE)/1024.0)
       * (CAST(x.qb AS DOUBLE)/CAST(x.nb AS DOUBLE)/1024.0)"""

  /** Embedding-distribution drift between two cohorts: cosine and L2
    * distance between the cohorts' mean vectors — the cheap first
    * alarm before re-clustering ("did this week's embeddings move").
    * Per-dimension sums are exact integers on the 2^10 fixed-point
    * grid ([[quantizedCentroids]]); the closing dot/norm folds run
    * over the DIMENSION-bounded frame sorted by position, every
    * double expression token-shared with the oracle
    * ([[DriftDot]]/[[DriftAa]]/[[DriftBb]]).
    *
    * Scale shape: ONE posexplode scan with conditional per-cohort
    * sums, shuffling one row per dimension regardless of corpus
    * size; the fold is a single collected 64-struct array.
    *
    * @param guardEmpty division-safe variant for programmatic gates
    *        (e.g. the ANN drift trigger, which needs counts AND the
    *        cosine from ONE corpus pass instead of a separate count
    *        job): per-dimension terms where either cohort has no
    *        component are folded as 0.0 instead of dividing by a zero
    *        count, and the counts are coalesced to 0 on an empty
    *        input. With both cohorts non-empty over fixed-dimension
    *        vectors the output is bit-identical to the default; the
    *        default (false) keeps the oracle-verified expressions
    *        byte-for-byte.
    * @return 1 row: (n_a, n_b, cos_sim, l2_dist)
    */
  def centroidDrift(
      df: DataFrame,
      vecCol: String,
      cohortWhen: org.apache.spark.sql.Column,
      guardEmpty: Boolean = false): DataFrame = {
    val comp = df
      .select(cohortWhen.as("a"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("a"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * 1024).cast("long").as("q"))
      .groupBy("pos")
      .agg(
        sum(when(col("a"), col("q")).otherwise(0L)).as("qa"),
        sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("a"), col("q")).otherwise(0L)).as("qb"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))
    def term(t: String): String =
      if (guardEmpty) s"CASE WHEN x.na = 0 OR x.nb = 0 THEN 0.0 ELSE $t END"
      else t
    def cnt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (guardEmpty) coalesce(c, lit(0L)) else c
    comp
      .agg(cnt(max(col("na"))).as("n_a"), cnt(max(col("nb"))).as("n_b"),
        sort_array(collect_list(struct(col("pos"), col("qa"), col("na"),
          col("qb"), col("nb")))).as("ds"))
      .select(col("n_a"), col("n_b"),
        expr(s"""aggregate(ds, CAST(0 AS DOUBLE),
            (acc, x) -> acc + (${term(DriftDot)}))""").as("dot"),
        expr(s"""aggregate(ds, CAST(0 AS DOUBLE),
            (acc, x) -> acc + (${term(DriftAa)}))""").as("aa"),
        expr(s"""aggregate(ds, CAST(0 AS DOUBLE),
            (acc, x) -> acc + (${term(DriftBb)}))""").as("bb"))
      .select(col("n_a"), col("n_b"),
        expr("""CASE WHEN aa = 0.0 OR bb = 0.0 THEN NULL
                ELSE dot/(sqrt(aa)*sqrt(bb)) END""").as("cos_sim"),
        expr("sqrt(greatest(aa - 2*dot + bb, CAST(0 AS DOUBLE)))")
          .as("l2_dist"))
  }

  /** Plain float-mean centroids (production path; see class doc for
    * why this variant carries no cross-engine oracle).
    */
  def meanCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(avg(col("x").cast("double")).as("centroid"), count(lit(1)).as("n"))

  /** Symmetric per-vector int8 quantization — the 4× embedding
    * storage compression a vector store applies before ANN serving:
    * scale = max|x| per row, q_k = round-half-up(x_k · 127 / scale)
    * ∈ [-127, 127]. Wholly per-ROW arithmetic (no cross-row float
    * accumulation), so it is bit-deterministic under any partitioning
    * and replicates exactly in SQL: each component does one
    * double-divide by the row max and one floor(v + 0.5). The scale
    * rides along 2^20-fixed-point (a long) so downstream exact
    * comparisons never touch a float scale. All-zero vectors keep
    * scale 0 and an all-zero code — no divide-by-zero.
    *
    * @return (idCol, scale_fp = ⌊max|x|·2^20⌋, qvec array<long>)
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mx = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(
      col(idCol),
      floor(mx * (1L << 20).toDouble).cast("long").as("scale_fp"),
      when(mx === 0d,
        transform(col(vecCol), _ => lit(0L)))
        .otherwise(transform(col(vecCol),
          x => floor(x.cast("double") * 127d / mx + 0.5d).cast("long")))
        .as("qvec"))
  }

  /** Exact Gram + covariance matrix of the leading `dims` embedding
    * components: components quantize to fixed-point longs
    * (⌊x·scale⌋ on the double-widened float — identical both
    * engines), and every (i ≤ j) cell is an exact DECIMAL fold of
    * products, so Σxᵢxⱼ hash-verifies where a float accumulation is
    * partition-order noise. Covariance is the one closing double:
    * (Σxᵢxⱼ/n − x̄ᵢx̄ⱼ)/scale².
    *
    * Scale shape: NO self-join — each row emits its d(d+1)/2 upper
    * triangle through one per-row nested transform + explode, then
    * ONE partial-combining hash aggregation over d(d+1)/2 cells. The
    * shuffle carries cells, never vectors. d is a literal, so the
    * whole triangle expression stays codegen'd.
    *
    * @return (i, j, n, gram_q, cov) for 0 ≤ i ≤ j < dims
    */
  def gramMatrix(
      df: DataFrame,
      vecCol: String,
      dims: Int,
      scale: Int = 1000): DataFrame = {
    val qv = transform(slice(col(vecCol), 1, dims),
      x => floor(x.cast("double") * scale.toDouble).cast("decimal(18,0)"))
    val cells = expr(
      s"""flatten(transform(qv, (xi, i) ->
            transform(slice(qv, i + 1, $dims - i), (xj, k) ->
              struct(i AS i, i + k AS j, xi AS xi, xj AS xj))))""")
    df.select(qv.as("qv"))
      .select(explode(cells).as("c"))
      .select(col("c.i").cast("long").as("i"),
        col("c.j").cast("long").as("j"),
        col("c.xi").as("xi"), col("c.xj").as("xj"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("xi") * col("xj")).cast("decimal(38,0)").as("gq"),
        sum(col("xi")).cast("decimal(28,0)").as("si"),
        sum(col("xj")).cast("decimal(28,0)").as("sj"))
      .select(col("i"), col("j"), col("n"),
        col("gq").cast("double").as("gram_q"),
        expr(s"""(CAST(gq AS DOUBLE)/CAST(n AS DOUBLE)
                  - (CAST(si AS DOUBLE)/CAST(n AS DOUBLE))
                    *(CAST(sj AS DOUBLE)/CAST(n AS DOUBLE)))
                 /(CAST($scale AS DOUBLE)*CAST($scale AS DOUBLE))""")
          .as("cov"))
  }
}
