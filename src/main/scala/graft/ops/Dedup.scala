package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpressions

/** Deduplication operators for document corpora, designed for the
  * 100 TB regime:
  *
  *  - `exactByContentHash`: one hash-shuffle on a fixed-width digest
  *    (never on the raw text payload — at scale the shuffle would
  *    otherwise move the whole corpus).
  *  - `jaccardPairs`: exact n-gram Jaccard via an inverted shingle
  *    index — one linear scan→shingle→posting pipeline whose
  *    per-shingle posting lists are grouped and exploded into ordered
  *    candidate pairs (Σ df(s)² candidate rows, not n²; no self-join,
  *    so the lineage is evaluated once). `maxShingleDf` prunes
  *    ubiquitous shingles with a windowed document-frequency cut —
  *    the classic posting-list cut — which bounds both the pair
  *    fan-out per list (≤ cut²) and hot-shingle skew.
  *  - `minHashLshPairs`: MinHash signatures + banded LSH bucketing,
  *    the sub-quadratic scale path. Candidates = pairs sharing a band
  *    bucket; each candidate is then verified with the exact integer
  *    Jaccard test, so precision is exact and only recall depends on
  *    the (numHashes, bands) choice.
  *
  * All hashes are the portable TextOps polynomials, so every operator
  * here is reproducible bit-for-bit in the DuckDB oracle. Thresholds
  * compare integers (2·shared ≥ union for t=0.5) — no float boundaries.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeper = min(id). */
  def exactByKey(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact content dedup grouping on md5(text): the shuffle key is 16
    * bytes regardless of document size.
    */
  def exactByContentHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol).cast("binary")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Docs with ≥3 words, tokenized; the sub-3-word tail can't shingle. */
  private def tokenized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 3)

  /** Default posting-list cut: shingles present in more than this many
    * documents are dropped from the Jaccard universe. A shingle with
    * document frequency d generates ~d²/2 candidate rows in the
    * self-join, so ONE boilerplate phrase shared by a million documents
    * would dominate the entire 100 TB job; with the cut, candidates are
    * bounded by cut·Σdf — linear in corpus size. 256 is far above any
    * discriminative shingle's df and far below boilerplate's.
    */
  val DefaultMaxShingleDf = 256

  /** Exact word-3-gram Jaccard similarity pairs at threshold
    * num/den (default 1/2). Returns (doc_id_a, doc_id_b), a < b.
    *
    * `maxShingleDf` defaults to [[DefaultMaxShingleDf]] — the
    * unbounded form (`None`) is opt-in, for corpora known to carry no
    * boilerplate (it also unbounds the per-shingle posting lists the
    * pair generator collects, so it is strictly a small-corpus mode).
    * Set sizes are recomputed over surviving postings so the
    * threshold stays a true Jaccard over the pruned universe.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 1,
      thresholdDen: Int = 2,
      maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf),
      persistPostings: Boolean = false): DataFrame = {
    val posting = jaccardPostings(df, idCol, textCol, maxShingleDf, persistPostings)
    // Candidate generation GROUPS the posting list per shingle and
    // explodes ordered pairs out of it, instead of self-joining the
    // posting frame on shingle. Same candidate set (all co-posted
    // pairs), but ONE posting pipeline: a self-join evaluates the
    // whole scan→shingle→explode lineage once per side (exchange
    // reuse can't always rescue it — a broadcast build side has no
    // exchange to reuse). List length is bounded by the posting cut,
    // so the per-row pair fan-out is bounded by cut² — the same bound
    // the join shape had on its per-shingle candidate rows.
    posting
      .groupBy(col("s"))
      .agg(collect_list(struct(col("id"), col("n"))).as("docs"))
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      // integer Jaccard test: den*shared >= num*(na+nb-shared)
      .filter(lit(thresholdDen.toLong) * col("shared") >=
        lit(thresholdNum.toLong) * (col("na") + col("nb") - col("shared")))
      .select(col("ida").as("doc_id_a"), col("idb").as("doc_id_b"))
  }

  /** CONTAINMENT near-dup pairs: the asymmetric variant of
    * [[jaccardPairs]] — a pair qualifies when the smaller shingle set
    * is mostly inside the other (`shared/min(|A|,|B|) ≥ num/den`).
    * Jaccard misses subset duplicates by construction (a paragraph
    * quoted inside a much longer page has tiny Jaccard but
    * containment ≈ 1), and containment is the standard complement in
    * web-dedup stacks for exactly that case. Same ONE-pipeline
    * grouped posting-list plan as jaccardPairs, same integer
    * threshold test (den·shared ≥ num·min(na,nb) — no float ratio),
    * same posting cut bounding the candidate fan-out.
    *
    * @return (doc_id_a, doc_id_b, shared, na, nb), a < b
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5,
      maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
    val posting = jaccardPostings(df, idCol, textCol, maxShingleDf,
      persistPostings = false)
    posting
      .groupBy(col("s"))
      .agg(collect_list(struct(col("id"), col("n"))).as("docs"))
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(lit(thresholdDen.toLong) * col("shared") >=
        lit(thresholdNum.toLong) * least(col("na"), col("nb")))
      .select(col("ida").as("doc_id_a"), col("idb").as("doc_id_b"),
        col("shared"), col("na"), col("nb"))
  }

  /** Surviving posting list (id, n, s) — the candidate-generation
    * input of [[jaccardPairs]], exposed so tests can gate the
    * candidate count directly.
    *
    * Posting rows carry the doc's set size so no size-lookup join is
    * needed after pair aggregation. The posting cut is a windowed
    * document-frequency count over the shingle partition — ONE linear
    * pipeline (the old separate distinct-shingle aggregation was a
    * second full shingling pass joined back in), and spill-safe on
    * ubiquitous shingles: a window sorts and spills a 100M-doc
    * boilerplate posting, where an aggregation buffer (e.g.
    * collect_list-then-filter) would hold it in memory whole. Set
    * sizes are then RECOMPUTED over the surviving postings (otherwise
    * `shared` counts pruned shingles out while na/nb still counted
    * them and true near-dups get dropped). persistPostings
    * materializes the result for multi-action pipelines; within a
    * single action it is opt-in, not default.
    */
  private[graft] def jaccardPostings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxShingleDf: Option[Int],
      persistPostings: Boolean): DataFrame = {
    val sh = tokenized(df, idCol, textCol)
      .select(col("id"), ShingleExpressions.distinctWordShingles(col("ws")).as("ss"))
    val posting = maxShingleDf match {
      case None =>
        // unpruned universe: the set size is just the shingle count
        sh.select(col("id"), size(col("ss")).cast("long").as("n"), explode(col("ss")).as("s"))
      case Some(cut) =>
        // posting-list cut: drop shingles present in > cut docs (they
        // generate quadratic candidates and carry no discrimination)
        import org.apache.spark.sql.expressions.Window
        sh.select(col("id"), explode(col("ss")).as("s"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
          .filter(col("df") <= cut)
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
          .select(col("id"), col("n"), col("s"))
    }
    if (persistPostings)
      posting.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else posting
  }

  /** Fixed MinHash parameters: 16 permutations (a·h+b mod p), banded
    * 4×4. Hardcoded so signatures are stable across runs and engines.
    */
  val MinHashP: Long = 2147483647L
  val MinHashAB: Seq[(Long, Long)] = Seq(
    (1610612741L, 805306457L), (402653189L, 201326611L),
    (1572869L, 786433L), (3145739L, 6291469L),
    (12582917L, 25165843L), (50331653L, 100663319L),
    (201326611L, 402653189L), (805306457L, 1610612741L),
    (98317L, 196613L), (393241L, 786433L),
    (1594327L, 3189061L), (6367729L, 12734413L),
    (25468777L, 50937553L), (101875091L, 203750197L),
    (407500297L, 815000593L), (1630001123L, 1111111121L))
  val Bands = 4
  val RowsPerBand = 4

  // (single-pass custom expression computes the whole signature; the
  // per-permutation fold equivalent lives in ShingleExpressions docs)

  /** MinHash+LSH near-duplicate pairs, verified with the exact integer
    * Jaccard test at num/den. Returns (doc_id_a, doc_id_b), a < b.
    *
    * Scale shape: signatures are narrow per-row expressions (no
    * shuffle); bucketing shuffles only (id, band, 4-long key); the
    * verify join touches only candidate pairs.
    */
  /** Per-doc signature frame (id, hs, sig): the distinct shingle-hash
    * set and the MinHash signature — computed ONCE at ingest and
    * meant to be STORED next to the corpus, so later batches dedup
    * against it without re-scanning corpus text
    * (see [[minHashLshIncremental]]).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenized(df, idCol, textCol)
      .select(
        col("id"),
        ShingleExpressions.distinctShingleHashes(col("ws")).as("hs"))
      .withColumn("sig",
        ShingleExpressions.minHashSignature(col("hs"), MinHashAB, MinHashP))

  /** (id, band, bkey) rows — one per banded signature slice. */
  private def bandFrame(sigs: DataFrame): DataFrame =
    sigs.select(
      col("id"),
      explode(array((0 until Bands).map { b =>
        struct(
          lit(b).as("band"),
          array_join(
            transform(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand),
              x => x.cast("string")), "_").as("bkey"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** Exact integer-Jaccard verification of candidate (ida, idb) pairs
    * against the signature frame's hash sets.
    *
    * Verification runs on the distinct shingle-HASH arrays, not the
    * shingle strings: the verify join ships every candidate doc's set
    * through the shuffle twice, and 8-byte hashes are severalfold
    * narrower than word-3-gram strings. Precision is exact up to hash
    * collisions inside one document pair — negligible, and the DuckDB
    * oracle replicates the same hash-set semantics.
    */
  private def verifyPairs(
      cand: DataFrame, sigs: DataFrame, num: Int, den: Int): DataFrame = {
    val sets = sigs.select(col("id"), col("hs"))
    cand
      .join(sets.select(col("id").as("ida"), col("hs").as("hsa")), "ida")
      .join(sets.select(col("id").as("idb"), col("hs").as("hsb")), "idb")
      .withColumn("shared", size(array_intersect(col("hsa"), col("hsb"))).cast("long"))
      .withColumn("na", size(col("hsa")).cast("long"))
      .withColumn("nb", size(col("hsb")).cast("long"))
      .filter(lit(den.toLong) * col("shared") >=
        lit(num.toLong) * (col("na") + col("nb") - col("shared")))
      .select(col("ida").as("doc_id_a"), col("idb").as("doc_id_b"))
  }

  /** One corpus scan per action: the signature frame is (by default)
    * persisted, so candidate generation populates the cache and the
    * two verify joins read it back instead of re-running the
    * scan→tokenize→shingle→MinHash lineage per join side (up to 4
    * evaluations in the old self-join shape — exchange reuse is not
    * guaranteed to dedupe canonically-distinct sides). Candidates come
    * from GROUPED (band, bkey) posting lists — collect the member ids,
    * explode ordered pairs — the same one-pipeline rewrite
    * [[jaccardPairs]] got; id lists are 8 bytes/member, and a bucket's
    * quadratic pair fan-out downstream dominates its buffer cost in
    * any shape. The cached blocks are MEMORY_AND_DISK and are freed by
    * the ContextCleaner once the frame is unreferenced; callers
    * composing multiple actions over the same corpus keep the benefit
    * automatically. `persistSignatures = false` opts out for
    * one-shot-per-lineage pipelines that manage their own caching.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 1,
      thresholdDen: Int = 2,
      persistSignatures: Boolean = true): DataFrame = {
    val sigRaw = signatures(df, idCol, textCol)
    val sig =
      if (persistSignatures)
        sigRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sigRaw
    val cand = bandFrame(sig)
      .groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("id")).as("ids"))
      .select(explode(col("ids")).as("ida"), col("ids"))
      .select(col("ida"), explode(col("ids")).as("idb"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    verifyPairs(cand, sig, thresholdNum, thresholdDen)
  }

  /** Closing estimator expression for [[bbitMinwisePairs]] — token-
    * shared with the oracle: the b = 1, C→1/2 form of Li & König's
    * resemblance estimator, R̂ = 2·A − 1 with A the bit-agreement
    * fraction over the 16 permutations.
    */
  val BbitEstExpr: String =
    "2.0 * (CAST(n_match AS DOUBLE) / 16.0) - 1.0"

  /** b-bit minwise resemblance estimation over the LSH candidate
    * pairs (Li & König 2010, at b = 1): each document keeps only the
    * LOWEST BIT of each of its 16 minhashes, packed into one 16-bit
    * integer, and a candidate pair's agreement count reads as
    * `16 − popcount(xor)`. This replaces [[minHashLshPairs]]' exact
    * hash-set verify payload with TWO BYTES per document — the
    * storage/shuffle ratio that makes sketch-resident dedup indexes
    * feasible at corpus scale (a 16-minhash signature is 128 bytes;
    * the full shingle set is kilobytes). The estimator's variance is
    * the price and it is PRICED, not hidden: `n_match` and the
    * estimate are the output, graded next to the exact-verified pair
    * set so the bill is data.
    *
    * Scale shape: identical to [[minHashLshPairs]] — signatures are
    * per-row expressions, candidates come from grouped (band, bkey)
    * posting lists, and the verify join ships only (id, 16-bit
    * sketch) rows. Cache lifetime is likewise minHashLshPairs':
    * the persisted signature frame has no explicit unpersist — the
    * CALLER owns it through the returned frame's lineage, and the
    * ContextCleaner frees the MEMORY_AND_DISK blocks once that frame
    * is unreferenced; long-lived sessions issuing many one-shot calls
    * should pass `persistSignatures = false`.
    *
    * @return (doc_id_a, doc_id_b, n_match, resemblance_est), a < b,
    *         one row per banded-LSH candidate pair.
    */
  def bbitMinwisePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      persistSignatures: Boolean = true): DataFrame = {
    val sigRaw = signatures(df, idCol, textCol)
    val sig =
      if (persistSignatures)
        sigRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sigRaw
    val bits = sig.select(col("id"),
      MinHashAB.indices.map { j =>
        (element_at(col("sig"), j + 1) % 2L) * lit(1L << j)
      }.reduce(_ + _).as("bits"))
    val cand = bandFrame(sig)
      .groupBy(col("band"), col("bkey"))
      .agg(collect_list(col("id")).as("ids"))
      .select(explode(col("ids")).as("ida"), col("ids"))
      .select(col("ida"), explode(col("ids")).as("idb"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    cand
      .join(bits.select(col("id").as("ida"), col("bits").as("xa")), "ida")
      .join(bits.select(col("id").as("idb"), col("bits").as("xb")), "idb")
      .withColumn("n_match",
        lit(16L) - bit_count(col("xa").bitwiseXOR(col("xb"))).cast("long"))
      .select(col("ida").as("doc_id_a"), col("idb").as("doc_id_b"),
        col("n_match"), expr(BbitEstExpr).as("resemblance_est"))
  }

  /** INCREMENTAL near-dup detection: which docs of a NEW batch
    * duplicate the existing corpus (or each other), given only the
    * corpus's STORED signature frame — the continuously-ingested-
    * corpus shape: at 100 TB the corpus text is never re-scanned and
    * never re-shuffled; only the batch is shingled, and the band join
    * + verify touch signatures alone. Corpus-internal pairs are known
    * from ingest time and are deliberately not re-derived.
    *
    * `corpusSigs` must come from [[signatures]] over ids disjoint
    * from the batch. Returns (doc_id_a, doc_id_b), a < b, each pair
    * involving at least one batch doc.
    */
  def minHashLshIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      corpusSigs: DataFrame,
      thresholdNum: Int = 1,
      thresholdDen: Int = 2): DataFrame = {
    // the union feeds the band join AND both verify joins — persist it
    // so the batch's shingle lineage runs once (corpus sigs are already
    // materialized by contract; blocks freed by the ContextCleaner)
    val newSigs = signatures(newDocs, idCol, textCol)
    val all = corpusSigs.select(col("id"), col("hs"), col("sig"))
      .unionByName(newSigs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bNew = bandFrame(newSigs).select(col("id").as("na"), col("band"), col("bkey"))
    val bAll = bandFrame(all).select(col("id").as("nb"), col("band"), col("bkey"))
    val cand = bNew.join(bAll, Seq("band", "bkey"))
      .filter(col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("ida"),
        greatest(col("na"), col("nb")).as("idb"))
      .distinct()
    verifyPairs(cand, all, thresholdNum, thresholdDen)
  }

  /** EXACT all-pairs Jaccard join at threshold num/den via lossless
    * prefix filtering (the AP-SS / ppjoin family: Bayardo et al.
    * WWW'07, Xiao et al. WWW'08) — the third point in the similarity
    * design space: `jaccardPairs` prunes the UNIVERSE (df cut ⇒
    * approximate at boilerplate scale), `minHashLshPairs` prunes
    * CANDIDATES probabilistically (LSH ⇒ recall < 1), this prunes
    * candidates LOSSLESSLY: with every doc's shingle-hash set sorted
    * by a global rarity order (ascending df, then hash), any pair with
    * J ≥ τ must share a token inside both docs' first
    * |x| − ⌈τ·|x|⌉ + 1 tokens, so joining prefixes only loses nothing.
    *
    * Scale shape: the prefix join's fan-out concentrates on RARE
    * tokens by construction — ubiquitous boilerplate shingles sit at
    * the end of the canonical order and never enter a prefix, which is
    * the same skew-killer the df cut buys, without changing the
    * result. The length filter (min ≥ τ·max) prunes candidates before
    * the distinct; verification ships integer hash arrays only.
    *
    * @return (doc_id_a, doc_id_b, shared, n_union), a < b, exact.
    */
  def allPairsJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      thresholdNum: Int = 7,
      thresholdDen: Int = 10): DataFrame = {
    require(thresholdNum > 0 && thresholdDen >= thresholdNum,
      "threshold must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val num = thresholdNum.toLong
    val den = thresholdDen.toLong
    val base = tokenized(df, idCol, textCol)
      .select(col("id"), ShingleExpressions.distinctShingleHashes(col("ws")).as("hs"))
    val toks = base.select(
      col("id"), size(col("hs")).cast("long").as("n"), explode(col("hs")).as("h"))
    val prefix = toks
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      // p = n − ⌈num·n/den⌉ + 1 (exact integer ceil-div)
      .filter(col("pos") <= col("n") -
        ((lit(num) * col("n") + lit(den - 1L)) / lit(den)).cast("long") + 1L)
      .select(col("id"), col("n"), col("h"))
    val cand = prefix.select(col("id").as("ida"), col("n").as("na"), col("h"))
      .join(prefix.select(col("id").as("idb"), col("n").as("nb"), col("h")), "h")
      .filter(col("ida") < col("idb"))
      // length filter: J ≥ τ forces min ≥ τ·max
      .filter(lit(den) * least(col("na"), col("nb")) >=
        lit(num) * greatest(col("na"), col("nb")))
      .select("ida", "idb").distinct()
    val sets = base.select(col("id"), col("hs"))
    cand
      .join(sets.select(col("id").as("ida"), col("hs").as("hsa")), "ida")
      .join(sets.select(col("id").as("idb"), col("hs").as("hsb")), "idb")
      .withColumn("shared", size(array_intersect(col("hsa"), col("hsb"))).cast("long"))
      .withColumn("n_union",
        size(col("hsa")).cast("long") + size(col("hsb")).cast("long") - col("shared"))
      .filter(lit(den) * col("shared") >= lit(num) * col("n_union"))
      .select(col("ida").as("doc_id_a"), col("idb").as("doc_id_b"),
        col("shared"), col("n_union"))
  }

  /** SimHash signatures (+ top-16-bit blocking key) per document. */
  def simHashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      TextOps.simHash32(col(textCol)).as("simhash"),
      shiftright(TextOps.simHash32(col(textCol)), 16).as("simhash_bucket"))

  /** SimHash near-duplicate PAIRS within Hamming distance `maxDist`,
    * found EXACTLY (no missed pairs) without an all-pairs comparison —
    * the Manku/Jain/Sarma web-crawl dedup shape: split the fingerprint
    * into `maxDist + 1` bit-bands; two fingerprints within distance d
    * differ in at most d bands, so by pigeonhole they agree on at
    * least one band. Candidates = pairs sharing any (band, band-bits)
    * key; each candidate is then verified with an exact popcount on
    * the XOR, so precision AND recall are both exact — banding only
    * bounds the comparison count.
    *
    * Scale shape: the fingerprint rides along with the band explode,
    * so candidate pairs verify inline — no join back to the corpus and
    * the shuffle carries (id, 8-byte fingerprint) only. Candidate
    * volume is Σ_buckets |bucket|²; with a 32-bit fingerprint the band
    * keys are 8-bit and a billion-doc corpus would flood the buckets —
    * at that scale widen the fingerprint (64-bit, 16-bit bands, same
    * operator shape) and run AFTER exact dedup so identical texts
    * (identical fingerprints) don't concentrate in one bucket.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    val width = 32 / nBands
    val mask = (1L << width) - 1
    val sigs = df.select(col(idCol).as("id"), TextOps.simHash32(col(textCol)).as("sh"))
    val bands = sigs.select(col("id"), col("sh"), explode(array(
      (0 until nBands).map(b => struct(
        lit(b).as("band"),
        shiftright(col("sh"), b * width).bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_id_a"), col("b.id").as("doc_id_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .distinct() // a close pair can agree on several bands
      .withColumn("dist", bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("doc_id_a"), col("doc_id_b"), col("dist"))
  }

  /** Cross-document passage-level duplication stats: each document is
    * cut into NON-OVERLAPPING `window`-word passages (full windows
    * only — the ragged tail can't be compared fairly), each passage
    * md5-hashed, and a passage counts as duplicated when its hash
    * occurs in more than one document. Per document: total passages
    * and duplicated passages — the "how much of this doc is copied
    * from elsewhere" signal used to drop boilerplate-heavy pages that
    * whole-document dedup misses (a doc 40% template + 60% fresh is
    * no near-dup of anything, yet 40% of it is junk).
    *
    * Scale shape: one explode into (doc, passage-hash) — the shuffle
    * key is a 16-byte digest, never passage text — aggregated FIRST to
    * distinct (digest, doc, occurrences) rows. The per-digest document
    * count is a count window OVER that same aggregate (partitioned by
    * digest), so the scan→explode→digest lineage is SINGLE-consumer by
    * construction — no self-join, no reliance on exchange reuse, no
    * persist; only slim digest rows shuffle after the explode. All
    * outputs are integers.
    */
  def passageDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16): DataFrame = {
    require(window >= 1, "passage window must be positive")
    val p = df
      .select(col(idCol).as("id"), TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= window)
      .select(col("id"),
        explode(transform(
          sequence(lit(0L), floor(size(col("ws")) / lit(window)).cast("long") - 1L),
          i => concat_ws(" ",
            slice(col("ws"), (i * window + 1L).cast("int"), lit(window)))))
          .as("passage"))
      .select(col("id"), md5(col("passage").cast("binary")).as("ph"))
    // (digest, doc) pairs with occurrence counts; nd = how many docs
    // share the digest, read as a count window over the SAME frame so
    // the explode lineage has exactly one consumer (the former
    // aggregate+join twin re-tokenized the corpus once more whenever
    // exchange reuse failed to dedupe the branches)
    val pairs = p.groupBy(col("ph"), col("id")).agg(count(lit(1)).as("occ"))
    val per = pairs
      .withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ph"))))
      .groupBy(col("id"))
      .agg(
        sum(col("occ")).as("n_passages"),
        sum(when(col("nd") > 1L, col("occ")).otherwise(0L)).as("n_dup"))
    df.select(col(idCol).as("id"))
      .join(per, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_passages"))
  }

  /** C4-style corpus-global LINE dedup (Raffel et al. 2020): every
    * newline-delimited line that occurs more than once in the corpus
    * is kept only at its FIRST occurrence (ordered by (doc id, line
    * position) — deterministic under any partitioning) and dropped
    * everywhere else; documents are reassembled from their surviving
    * lines in original order.
    *
    * Returns (idCol, n_kept, n_dropped, clean_text). Documents whose
    * lines all lose keep an empty clean_text rather than vanishing —
    * the caller decides whether to drop empties.
    *
    * Scale shape: one explode, one shuffle partitioned by the line
    * value carrying (line, doc, pos) — the line text must cross the
    * wire once anyway for reassembly — then one hash agg back on doc
    * id. First-occurrence election is a row_number over the line
    * partition; line-frequency groups are tiny (a handful of docs
    * share a line), so the per-group sort is bounded — no global sort
    * anywhere. A corpus with pathological boilerplate (one line in
    * millions of docs) would skew the line partition; salt the
    * election the way [[Skew.saltedSumCount]] does (min-of-mins) if
    * that regime appears.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df
      .select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "line")))
    val elected = lines.withColumn("rn",
      row_number().over(Window.partitionBy(col("line")).orderBy(col("id"), col("pos"))))
    elected.groupBy(col("id"))
      .agg(
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") =!= 1, 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
      .select(col("id").as(idCol), col("n_kept"), col("n_dropped"), col("clean_text"))
  }

  /** Near-duplicate pairs under Hamming distance over a 64-bit
    * signature packed as two unsigned 32-bit halves (the
    * [[Multimodal.perceptualHash]] layout) — the image analog of
    * [[simHashPairs]]. Pigeonhole blocking: 4 disjoint 16-bit bands;
    * any pair within distance ≤ 3 must agree exactly on at least one
    * band, so recall is EXACT for maxDist ≤ 3 while candidates stay
    * Σ|bucket|² over band-key buckets, never all pairs. Verification
    * is the codegen'd `bit_count(xor)` popcount on the halves.
    *
    * Scale shape: one signature frame feeds the grouped posting-list
    * pair generation (the [[jaccardPairs]] rewrite — no self-join of
    * the signature lineage); distinct() collapses pairs that
    * co-bucket in several bands.
    *
    * @return (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist
    */
  def hammingPairs64(
      df: DataFrame,
      idCol: String,
      loCol: String,
      hiCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4 bands of 16 bits give exact recall only to distance 3")
    val bands = df
      .select(col(idCol).as("id"), col(loCol).as("lo"), col(hiCol).as("hi"))
      .select(col("id"), col("lo"), col("hi"), explode(array(
        (0 until 4).map { b =>
          val src = if (b < 2) col("lo") else col("hi")
          struct(lit(b).as("b"),
            shiftright(src, (b % 2) * 16).bitwiseAND(lit(65535L))
              .as("bkey"))
        }: _*)).as("band"))
      .select(col("id"), col("lo"), col("hi"),
        col("band.b").as("b"), col("band.bkey").as("bkey"))
    bands
      .groupBy(col("b"), col("bkey"))
      .agg(collect_list(struct(col("id"), col("lo"), col("hi"))).as("docs"))
      .select(explode(col("docs")).as("x"), col("docs"))
      .select(col("x"), explode(col("docs")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (bit_count(col("x.lo").bitwiseXOR(col("y.lo"))) +
          bit_count(col("x.hi").bitwiseXOR(col("y.hi"))))
          .cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** C4-style boilerplate scrub: drop every line that occurs in more
    * than `maxDf` distinct documents OF THE SAME GROUP (domain /
    * source) — navigation chrome, license banners, cookie notices.
    * Unlike [[lineDedup]] (which keeps one global winner per line),
    * boilerplate removal drops ALL copies including the first: a
    * line shared across a domain's pages is template, not content.
    *
    * Shape: one posexplode to (group, line) rows, one hash agg to
    * per-(group, line) distinct-doc counts (`count(distinct id)`
    * plans as a two-phase partial agg on (group, line, id) — never a
    * global sort), one equi-join back, one per-document rebuild agg.
    * The shuffles carry line text once each way; at 100 TB, swap the
    * join key for a line digest the same way [[passageDupStats]]
    * ships md5 bytes.
    *
    * @return (idCol, group, n_kept, n_dropped, clean_text)
    */
  def boilerplateScrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      maxDf: Int = 1): DataFrame = {
    require(maxDf >= 1, "maxDf must keep at least singleton lines")
    val lines = df
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = lines.groupBy(col("grp"), col("line"))
      .agg(count_distinct(col("id")).as("ndocs"))
    lines.join(dfreq, Seq("grp", "line"))
      .groupBy(col("id"), col("grp"))
      .agg(
        sum(when(col("ndocs") <= maxDf, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("ndocs") > maxDf, 1L).otherwise(0L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("ndocs") <= maxDf,
              struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
      .select(col("id").as(idCol), col("grp"),
        col("n_kept"), col("n_dropped"), col("clean_text"))
  }
}
