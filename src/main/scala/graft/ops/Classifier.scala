package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-style linear text classifier over hashed bag-of-words
  * features — the model shape behind production corpus quality
  * filters (CCNet / GPT-3-style "looks like reference text"
  * scoring): every token hashes into one of `NumBuckets` feature
  * buckets, each bucket carries a learned integer weight, and the
  * document score is the plain sum — so scoring is a shuffle-free
  * per-row array fold in the scan projection, embarrassingly parallel
  * at any corpus size.
  *
  * No model files exist in this environment, so the weight table is a
  * deterministic PSEUDO model: W[i] = ((i·2654435761) mod 2003) − 1001
  * (Knuth multiplicative scatter into [−1001, 1001]). The production
  * seam is the `weightOf` function — swap it for a lookup into a
  * broadcast learned (bucket → weight) array and nothing else
  * changes. Integer weights keep the score bit-stable across
  * partitionings and engines (the oracle replicates it term by term).
  */
object Classifier {

  val NumBuckets = 4096L
  val WeightMul = 2654435761L
  val WeightMod = 2003L
  val WeightShift = 1001L

  /** Feature bucket of a token: portable word hash mod D. */
  def bucketOf(w: Column): Column = pmod(TextOps.wordHash(w), lit(NumBuckets))

  /** Pseudo-weight of a bucket (stand-in for a learned table). */
  def weightOf(b: Column): Column =
    pmod(b * lit(WeightMul), lit(WeightMod)) - lit(WeightShift)

  /** Per-document hashed-BoW linear score and keep decision
    * (score ≥ 0). Tokenizes once in its own projection (the lang-id
    * lesson: a lambda-bound subtree referenced N times is evaluated
    * N times without a projection boundary).
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.words(col(textCol)).as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_tokens"),
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + weightOf(bucketOf(w))).as("score_fp"))
      .withColumn("keep", (col("score_fp") >= 0L).cast("long"))

  /** Segment mean for the PAVA minimax: exact integer prefix-sum
    * differences, one division — computed identically cross-engine,
    * so min/max comparisons over these doubles agree everywhere.
    * Shared with the q_isotonic oracle.
    */
  val SegMeanExpr: String = "CAST(kp - exp_ AS DOUBLE)/(kn - exn)"

  /** Isotonic regression (PAVA) of a binary rate over ordered bins —
    * the calibration step that forces "higher score ⇒ no lower rate"
    * before using scores as probabilities. Input: one row per bin
    * with exact integer totals (bin, n, pos), n ≥ 1. Uses the minimax
    * closed form fitted(i) = max_{j≤i} min_{k≥i} mean(pos[j..k]) /
    * mean(n[j..k]) over the (tiny, ≤bins²·bins) triple expansion:
    * prefix sums on the bin frame, a broadcast pair cross, an
    * i-explode, two hash aggregations. Post-scan cost is a function
    * of the BIN count only — constant in the corpus size.
    *
    * @return (bin, n, pos, rate_raw, rate_iso), rate_iso
    *         nondecreasing in bin.
    */
  def isotonicRates(bins: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    val c = bins.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("pos")).over(w))
    val js = c.select(col("bin").as("j"),
      (col("cum_n") - col("n")).as("exn"),
      (col("cum_pos") - col("pos")).as("exp_"))
    val ks = c.select(col("bin").as("k"),
      col("cum_n").as("kn"), col("cum_pos").as("kp"))
    val fit = js.crossJoin(broadcast(ks)).filter(col("j") <= col("k"))
      .withColumn("m", expr(SegMeanExpr))
      .select(col("j"), col("m"),
        explode(sequence(col("j"), col("k"))).as("bin"))
      .groupBy("bin", "j").agg(min(col("m")).as("minm"))
      .groupBy("bin").agg(max(col("minm")).as("rate_iso"))
    bins.join(fit, "bin")
      .select(col("bin"), col("n"), col("pos"),
        expr("CAST(pos AS DOUBLE)/n").as("rate_raw"), col("rate_iso"))
  }

  /** Best 1-D decision stump "predict positive iff x ≤ v" by exact
    * misclassification count — the weak learner / feature-screening
    * primitive. Every distinct value of x is a candidate threshold;
    * err(v) = min(posL, negL) + min(posR, negR) (each side predicts
    * its majority class), all exact longs, so the argmin needs no
    * floating-point tolerance. Ties break to the SMALLEST threshold
    * via a lexicographic struct-min.
    *
    * Scale shape: one scan pre-aggregates to the distinct-value
    * frame (persisted for its two prefix passes); cumulative counts
    * ride [[Quantiles.cumDist]]'s two-phase bucketed prefix sum —
    * parallelism stays bucket-count wide at any data size, never a
    * whole-distribution single-task sort. The closing argmin is a
    * partial-combining struct-min, and the global accuracy readout
    * joins two 1-row broadcasts.
    *
    * @param posCol boolean label; x is quantized by the caller to an
    *               exact long (days, cents).
    * @return 1 row: (n, n_pos, split_x, err, base_err, acc, base_acc)
    */
  def bestStump(df: DataFrame, xCol: Column, posCol: Column): DataFrame = {
    val dist = df
      .select(xCol.cast("long").as("v"),
        when(posCol, 1L).otherwise(0L).as("p"))
      .groupBy("v")
      .agg(count(lit(1)).as("cnt"), sum("p").as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = Quantiles.cumDist(dist, lit(0), col("v"), col("cnt"))
      .select(col("v"), col("cum").as("nl"), col("n"))
    val cp = Quantiles.cumDist(dist, lit(0), col("v"), col("pos"))
      .select(col("v"), col("cum").as("posl"), col("n").as("npos"))
    val best = ca.join(cp, Seq("v"))
      .select(col("v"), col("n"), col("npos"),
        (least(col("posl"), col("nl") - col("posl")) +
          least(col("npos") - col("posl"),
            (col("n") - col("nl")) - (col("npos") - col("posl"))))
          .as("err"))
      .groupBy(col("n"), col("npos"))
      .agg(min(struct(col("err"), col("v"))).as("b"))
      .select(col("n").as("n"), col("npos").as("n_pos"),
        col("b.v").as("split_x"), col("b.err").as("err"),
        least(col("npos"), col("n") - col("npos")).as("base_err"))
    best.select(col("n"), col("n_pos"), col("split_x"), col("err"),
      col("base_err"),
      expr("CAST(n - err AS DOUBLE) / CAST(n AS DOUBLE)").as("acc"),
      expr("CAST(n - base_err AS DOUBLE) / CAST(n AS DOUBLE)")
        .as("base_acc"))
  }

  /** Shared Spark↔oracle text for the Laplace-smoothed token
    * log-probability ln((c+1)/(tl+v)) over grid columns c (class-term
    * count, null when unseen), tl (class token total), v (vocab
    * size).
    */
  val NbLpExpr: String =
    "ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE) / CAST(tl + v AS DOUBLE))"

  /** Shared Spark↔oracle text for a (doc, class) posterior given the
    * in-vocab fold `folded`, the out-of-vocab token count
    * tf_tot − tf_in, and the class prior — additions strictly
    * left-to-right.
    */
  val NbScoreExpr: String =
    """folded
       + CAST(tf_tot - tf_in AS DOUBLE)
         * ln(CAST(1 AS DOUBLE) / CAST(tl + v AS DOUBLE))
       + ln(CAST(n_c AS DOUBLE) / CAST(n_tr AS DOUBLE))"""

  /** Multinomial naive Bayes with Laplace smoothing, trained and
    * scored in one declarative pipeline: class-conditional token
    * counts from the training split, per-doc posterior
    * ln P(cls) + Σ_w tf·ln P(w|cls) over the test split, argmax
    * class per document. The generative counterpart of the
    * hashed-linear [[scoreDocs]] and the exact-anchor
    * [[graft.ops.Similarity]] kNN — and the classic language-ID /
    * topic-routing baseline a corpus pipeline reaches for first.
    *
    * Exactness discipline: all counts are exact longs; every double
    * is either a token-shared ln expression ([[NbLpExpr]],
    * [[NbScoreExpr]]) or a strictly ordered fold over terms sorted
    * by token (w is unique within a (doc, class) group, so the sort
    * fully determines the IEEE addition order). Ties in the class
    * argmax break to the LARGEST class name via lexicographic
    * struct-max — deterministic cross-engine.
    *
    * Scale shape: one tokenize pass (persisted base frame); training
    * counts and test doc-term frequencies are partial-combining hash
    * aggs keyed by strings of vocabulary size, never corpus size.
    * The smoothing grid is vocab × classes (classes is a tiny
    * broadcast); the scoring join carries (doc, w, tf) rows against
    * the grid on w. Class parameters ride 1-row / L-row broadcasts.
    *
    * @param isTest rows where it is true are scored, the rest train.
    * @return (doc_id, actual, pred, best_score) per test doc.
    */
  def naiveBayes(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      classCol: String,
      isTest: Column): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), col(classCol).as("cls"),
        TextOps.words(col(textCol)).as("ws"), isTest.as("is_test"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tok = base.select(col("doc_id"), col("cls"), col("is_test"),
      explode(col("ws")).as("w"))
    val cw = tok.filter(!col("is_test"))
      .groupBy("cls", "w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = cw.select("w").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clsParams = cw.groupBy("cls").agg(sum("c").as("tl"))
      .join(base.filter(!col("is_test"))
        .groupBy("cls").agg(count(lit(1)).as("n_c")), Seq("cls"))
      .crossJoin(broadcast(vocab.agg(count(lit(1)).as("v"))))
      .crossJoin(broadcast(
        base.filter(!col("is_test")).agg(count(lit(1)).as("n_tr"))))
    val grid = vocab.crossJoin(broadcast(clsParams))
      .join(cw, Seq("cls", "w"), "left")
      .select(col("cls"), col("w"), expr(NbLpExpr).as("lp"))
    val dt = tok.filter(col("is_test"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docTot = dt.groupBy("doc_id").agg(sum("tf").as("tf_tot"))
    val matched = dt.join(grid, Seq("w"))
      .groupBy("doc_id", "cls")
      .agg(sum("tf").as("tf_in"),
        sort_array(collect_list(struct(col("w"),
          (col("tf").cast("double") * col("lp")).as("t")))).as("ls"))
    val folded = aggregate(
      transform(col("ls"), x => x.getField("t")),
      lit(0.0d), (a, v) => a + v)
    val scored = base.filter(col("is_test"))
      .select(col("doc_id"), col("cls").as("actual"))
      .crossJoin(broadcast(clsParams))
      .join(matched, Seq("doc_id", "cls"), "left")
      .join(docTot, Seq("doc_id"), "left")
      .select(col("doc_id"), col("actual"), col("cls"),
        col("tl"), col("v"), col("n_c"), col("n_tr"),
        coalesce(col("tf_in"), lit(0L)).as("tf_in"),
        coalesce(col("tf_tot"), lit(0L)).as("tf_tot"),
        coalesce(folded, lit(0.0d)).as("folded"))
      .select(col("doc_id"), col("actual"), col("cls"),
        expr(NbScoreExpr).as("score"))
    scored.groupBy("doc_id", "actual")
      .agg(max(struct(col("score"), col("cls"))).as("b"))
      .select(col("doc_id"), col("actual"), col("b.cls").as("pred"),
        col("b.score").as("best_score"))
  }
}
