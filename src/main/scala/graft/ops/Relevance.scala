package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: TF-IDF term weighting and BM25 ranking —
  * the retrieval half of a training-data pipeline (quality-weighted
  * sampling, query-targeted subcorpus selection, dedup tie-breaking by
  * informativeness).
  *
  * Scale shape: one explode of the token column into (doc, term) and
  * two hash aggregations (tf by (doc, term), df by term) — both
  * map-side-combinable; corpus-level scalars (N, avgdl) are 1-row
  * aggregates broadcast back with a cross join, never a driver
  * collect. No shuffle carries document payloads, only terms and
  * counts.
  *
  * Determinism discipline (oracle is DuckDB): ranking NEVER orders by
  * a floating score — top-k terms order by the integer triple
  * (tf DESC, df ASC, term ASC), so rank boundaries cannot flip on a
  * last-ulp ln() difference between engines; float scores are emitted
  * as value columns only, where the gate's %.10g canonicalization
  * absorbs sub-ulp library differences. Corpus ratios are built from
  * exact integer sums cast to double, not engine-internal AVG.
  */
object Relevance {

  /** (doc_id, term, tf) with tf = occurrence count in the doc. */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.words(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by TF-IDF, with the integer-deterministic
    * ordering described above. Output:
    * (doc_id, term, tf, df, tfidf) where tfidf = tf · ln(N/df),
    * N = total corpus size (all docs, even token-free ones).
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .select(
        col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(col("n").cast("double") / col("df").cast("double"))).as("tfidf"))
  }

  /** Corpus vocabulary: top-k terms by total occurrences (ties broken
    * by term), with document frequency — the input to tokenizer-vocab
    * construction and stopword discovery. TakeOrdered top-k: partial
    * top-k per partition, never a global sort.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    termFreqs(docs, idCol, textCol)
      .groupBy("term")
      .agg(sum(col("tf")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(k)

  /** Inverted index: one row per term with its document frequency and
    * the first `headK` posting-list entries (lowest doc ids, emitted
    * as a comma-joined string so the row is fixed-width). The bounded
    * [[graft.functions.TopKRows]] aggregator keeps the min-k ids with
    * map-side partial merge, so the term shuffle carries ≤ headK ids
    * per (term, partition) — a full `collect_list` would ship every
    * posting of every hot term through the exchange and buffer it
    * unbounded on the reduce side. Doc ids must fit 2^53 (the
    * aggregator's double sort key; ids here are far below).
    */
  def postingLists(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      headK: Int = 8): DataFrame = {
    val minK = graft.functions.TopKRows.topK(headK, asc = true)
    docs
      .select(col(idCol).as("doc_id"), explode(TextOps.words(col(textCol))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(
        count(lit(1)).as("n_docs"),
        minK(col("doc_id").cast("double"), col("doc_id"), lit(0L)).as("tk"))
      .select(col("term"), col("n_docs"),
        array_join(transform(col("tk"), e => e("t1").cast("string")), ",")
          .as("doc_heads"))
  }

  /** Corpus n-gram counts, top-k by total occurrences (ties broken by
    * the n-gram string) — the language-model-style count table
    * (bigram/trigram frequencies) that drives contamination screens,
    * boilerplate discovery, and LM-based quality filters. Overlapping
    * windows, so a w-word doc yields w-n+1 grams. Same shape as
    * [[vocabulary]]: one explode, one map-side-combinable hash agg,
    * TakeOrdered top-k (never a global sort).
    */
  def ngramTopK(
      docs: DataFrame,
      textCol: String,
      n: Int = 2,
      k: Int = 50): DataFrame = {
    require(n >= 1, "n-gram order must be positive")
    docs
      .select(TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("ws")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("ws"), i + j)): _*)))
        .as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-document token Shannon entropy in nats:
    * H = ln(N) − (Σ_t c_t·ln c_t)/N over per-term counts c_t — the
    * "is this text degenerate" quality signal (near-0 entropy = one
    * token repeated; boilerplate and keyword-stuffed spam sit far
    * below prose of the same length). Also emits N and the distinct
    * token count. Token-free documents pin to (0, 0, 0.0).
    *
    * Float determinism: a float sum over a shuffled frame is never
    * partition-stable, so the Σ c·ln c fold runs over the per-doc
    * count list sorted by term — collect_list is per-doc-bounded (a
    * doc's vocabulary), and both engines fold the same values in the
    * same order, so the double is bit-identical up to the ln() ulp the
    * gate's %.10g canonicalization absorbs (same discipline as BM25).
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val agg = termFreqs(docs, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sort_array(collect_list(struct(col("term"), col("tf")))).as("tc"))
    val sumClnC = aggregate(
      transform(col("tc"), x =>
        x.getField("tf").cast("double") * log(x.getField("tf").cast("double"))),
      lit(0.0d), (acc, v) => acc + v)
    val entropy =
      when(col("n_tokens") > 0L,
        log(col("n_tokens").cast("double")) - sumClnC / col("n_tokens").cast("double"))
        .otherwise(lit(0.0d))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct_tokens"),
        coalesce(entropy, lit(0.0d)).as("entropy_nats"))
  }

  /** Corpus-LM document scoring: the average conditional bigram
    * log-probability ln(c(w1,w2)/c(w1·)) over a document's bigram
    * occurrences, with the counts estimated from the corpus itself —
    * the KenLM-style fluency filter of a training pipeline (word-soup
    * and shuffled text score far below prose under the same
    * vocabulary). No smoothing is needed: scoring the corpus against
    * its own counts means every bigram was observed at least once.
    * Documents under two tokens pin to (0, 0.0).
    *
    * Scale shape: one bigram explode feeding three
    * map-side-combinable hash aggs (bigram counts, prefix counts from
    * the bigram table — vocabulary-bounded, not corpus-bounded — and
    * the per-doc rollup); joins carry (doc, w1, w2) triples, never
    * text. The per-doc Σ lp folds over the bigram list sorted by
    * (w1, w2) — duplicates carry identical lp values, so the double
    * accumulation is order-stable across engines and partitionings
    * (same discipline as [[tokenEntropy]]).
    *
    * Corpus-shape note: on Zipfian natural text, pre-aggregating to
    * distinct (doc, w1, w2) counts before the joins (folding c·lp)
    * cuts join and collect rows severalfold and is the better plan.
    * It is NOT done here because it measured 1.6× SLOWER on this
    * benchmark corpus (3.5% bigram repetition: the extra string-keyed
    * shuffle buys no row reduction).
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(
          element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    val agg = bg
      .join(cb, Seq("w1", "w2"))
      .join(cp, Seq("w1"))
      .select(col("doc_id"), col("w1"), col("w2"),
        log(col("cb").cast("double") / col("cp").cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("w1"), col("w2"), col("lp")))).as("ls"))
    val total = aggregate(
      transform(col("ls"), x => x.getField("lp")), lit(0.0d), (a, v) => a + v)
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0L, total / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0d)).as("avg_logprob"))
  }

  /** Frequency-of-frequency spectrum: how many terms appear in
    * exactly d documents — the Zipf-shape fingerprint of a corpus
    * (and the sanity check that dedup/boilerplate removal worked: a
    * boilerplated corpus shows a spike at d ≈ corpus size).
    */
  def frequencySpectrum(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFreqs(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("n_docs"))
      .groupBy("n_docs").agg(count(lit(1)).as("n_terms"))

  /** Okapi BM25 score of every document against a fixed term query:
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Docs matching no query term
    * score 0. dl counts ALL tokens of the doc; avgdl = Σdl/N as exact
    * integer sums divided in double.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // dedupe up front: a repeated term would otherwise double-count
    // through two identical conditional sums (and per-term columns are
    // index-named below, so terms with dots/quotes are safe too)
    val terms = query.distinct
    val lens = docs.select(
      col(idCol).as("doc_id"), size(TextOps.words(col(textCol))).cast("long").as("dl"))
    if (terms.isEmpty)
      return lens.select(col("doc_id"), lit(0.0).as("bm25"))
    val corpus = lens.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val tf = termFreqs(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nD: Column = col("n").cast("double")
    val avgdl: Column = col("sumdl").cast("double") / nD
    val idf: Column =
      log(lit(1.0) + (nD - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfD: Column = col("tf").cast("double")
    val termScore: Column =
      idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    // One conditional sum per query term (each aggregates a single
    // row, so partial-agg merge order can't reorder a float sum), then
    // a FIXED-order addition in query order — bit-deterministic across
    // partitionings and engines, unlike sum() over the term scores.
    def sumCol(t: String, i: Int) = sum(when(col("term") === t, col("s"))).as(s"s_$i")
    val perTerm = tf
      .join(dfreq, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), termScore.as("s"))
      .groupBy("doc_id")
      .agg(
        sumCol(terms.head, 0),
        terms.tail.zipWithIndex.map { case (t, i) => sumCol(t, i + 1) }: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    lens.select(col("doc_id"))
      .join(perTerm, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(total, lit(0.0)).as("bm25"))
  }

  /** Collocation mining: corpus bigrams scored by LIFT — the ratio
    * p(w1,w2) / (p(w1·)·p(·w2)) over bigram events (a monotone
    * transform of PMI that needs no cross-engine `log`, so it stays
    * bit-verifiable). High lift = the pair co-occurs far more than
    * its parts predict: multiword expressions, named entities,
    * template phrases — the standard signal for tokenizer-vocab
    * candidates and boilerplate phrase detection.
    *
    * Scale shape: ONE tokenize+bigram aggregation shuffle; both
    * marginals re-aggregate the (bigram → count) frame itself (its
    * exchange is reused — the three consumers share one canonical
    * subtree), so the corpus text is scanned once. The `minCount`
    * filter cuts the frame BEFORE the marginal joins, and the grand
    * total arrives as a broadcast 1-row frame. Exact long counts;
    * lift is a single closing double expression.
    */
  def collocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    val counts = docs
      .select(TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_xy"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val left = counts.groupBy("w1").agg(sum("c_xy").as("cl"))
    val right = counts.groupBy("w2").agg(sum("c_xy").as("cr"))
    val total = counts.agg(sum("c_xy").as("nb"))
    counts.filter(col("c_xy") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_xy"),
        ((col("c_xy").cast("double") * col("nb").cast("double")) /
          (col("cl").cast("double") * col("cr").cast("double"))).as("lift"))
  }

  /** Tf-weighted document cosine pairs over a document-frequency-cut
    * inverted index — dot products AND norms both live in the pruned
    * vocabulary (terms in ≤ maxDf docs): hub terms carry no
    * discrimination, and dropping them from the geometry is what lets
    * near-dup pairs score high while the pair fan-out stays bounded
    * by the cut. The threshold is the exact integer test
    * 4·dot² ≥ n1·n2 ⇔ cosine ≥ 0.5 (for dot > 0) — row membership
    * can never flip on a float boundary. The df cut applies BEFORE
    * the posting-list aggregation via a pre-counted semi join, so no
    * collect_list buffer is ever unbounded. At 100 TB the dot/norm
    * partials move to DECIMAL; posting lists stay cut-bounded.
    *
    * @return (d1, d2, dot, n1, n2, cosine) for pairs with pruned
    *         cosine ≥ 0.5.
    */
  def tfCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long = 64L): DataFrame = {
    val tf0 = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.words(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val keep = tf0.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("term")
    val tf = tf0.join(keep, Seq("term"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = tf.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val pairs = tf
      .groupBy("term")
      .agg(collect_list(struct(col("doc_id"), col("tf"))).as("post"))
      .select(explode(expr(
        """filter(
             flatten(transform(post, p1 ->
               transform(post, p2 -> named_struct(
                 'd1', p1.doc_id, 'd2', p2.doc_id,
                 'x', p1.tf * p2.tf)))),
             pr -> pr.d1 < pr.d2)""")).as("pr"))
      .select(col("pr.d1").as("d1"), col("pr.d2").as("d2"), col("pr.x"))
      .groupBy("d1", "d2").agg(sum("x").as("dot"))
    pairs
      .join(norms.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("n2", "n1"), "d1")
      .join(norms.withColumnRenamed("doc_id", "d2"), "d2")
      .filter(col("dot") > 0 &&
        lit(4) * col("dot") * col("dot") >= col("n1") * col("n2"))
      .select(col("d1"), col("d2"), col("dot"), col("n1"), col("n2"),
        expr("CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * " +
          "sqrt(CAST(n2 AS DOUBLE)))").as("cosine"))
  }

  /** Zipf power-law fit of the term-frequency distribution: OLS of
    * ln(count) on ln(rank) over the full rank-frequency curve —
    * slope ≈ −1 is Zipf's law; a corpus far off that line is a
    * red flag (boilerplate floods or truncated vocabulary) every
    * corpus-health dashboard checks.
    *
    * Ranks come WITHOUT a global sort: [[Quantiles.cumDist]] on the
    * NEGATED count gives each tied-count block its rank range
    * [cum−block+1, cum] (descending counts), and the per-point rows
    * explode from those ranges. For tied values ln(count) is
    * constant across the block, so the fit is independent of
    * within-block order — rank ranges are all the ordering needed.
    * The explode emits exactly |vocab| rows total; ranges unroll in
    * ≤4096-element chunks so no single row materializes a tie-block
    * (real corpora put ~half the vocabulary in the count=1 block —
    * chunking keeps that block's array bounded).
    *
    * ln runs on exact integer-valued doubles on both engines; the
    * fit itself is [[Regression.olsFit]] (exact integer/decimal
    * sufficient sums over cent-quantized points).
    *
    * @return (n, beta0, beta1, r2) — n = vocabulary size.
    */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val chunk = 4096
    val tc = docs
      .select(explode(TextOps.words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val blocks = Quantiles.cumDist(tc, lit(0), -col("c"))
    val points = blocks
      .select((-col("v")).as("c"), (col("cum") - col("cnt") + 1).as("lo"),
        col("cum").as("hi"))
      .select(col("c"), col("hi"),
        explode(expr(s"sequence(lo, hi, $chunk)")).as("cs"))
      .select(col("c"),
        explode(expr(s"sequence(cs, least(cs + ${chunk - 1}, hi))"))
          .as("r"))
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    Regression.olsFit(points, yCol = "y", xCol = "x", groupCols = Seq.empty)
  }

  /** Positional phrase search: documents containing the EXACT word
    * sequence, with occurrence counts — the inverted-index probe a
    * search engine runs for quoted queries ([[postingLists]] is the
    * index side; this is the consult side). Each phrase term's
    * postings shift left by its offset and equi-join on
    * (doc, position): a row survives all joins iff the terms sit at
    * consecutive positions.
    *
    * Scale shape: ONE tokenize+posexplode pass filtered to the
    * phrase's terms (persisted — it feeds one filter per term), then
    * |phrase|−1 equi-joins on (id, pos) whose sides are only the
    * matching-term postings, orders of magnitude below the corpus.
    * Never a `contains` scan over full text, and never a join keyed
    * on the raw word (which would collide all positions of a hot
    * term before the position test).
    *
    * @return (idCol, n_occ) — documents with ≥ 1 occurrence
    */
  def phraseMatch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val postings = df
      .select(col(idCol).as("id"),
        posexplode(TextOps.words(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = postings.filter(col("w") === phrase.head)
      .select(col("id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(postings.filter(col("w") === w)
          .select(col("id"), (col("pos") - i).as("pos")), Seq("id", "pos"))
    }
    matched.groupBy(col("id").as(idCol)).agg(count(lit(1)).as("n_occ"))
  }
}
