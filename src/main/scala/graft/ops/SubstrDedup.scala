package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpressions

/** Exact duplicated-substring detection — the distributed analog of
  * suffix-array "ExactSubstr" dedup (Lee et al. 2022, Deduplicating
  * Training Data Makes Language Models Better): find character spans
  * that occur verbatim in MORE THAN ONE document and measure how much
  * of each document such spans cover, so a curation pass can cut the
  * boilerplate (licenses, navigation chrome, quoted headers) that
  * document-level near-dup misses entirely.
  *
  * A suffix array is inherently sequential; the distributed
  * reformulation uses CONTENT-DEFINED ANCHORS. Every k-char window
  * whose md5 starts with a fixed hex nibble is an anchor (rate 1/16).
  * Because anchoring depends only on window CONTENT, the two copies of
  * a shared span anchor at the SAME offsets inside the span no matter
  * how the surrounding documents align — the same self-synchronizing
  * property content-defined chunking gives backup dedup. Matching is
  * then a plain equi-join world: group anchors on the window digest,
  * keep digests seen in ≥ 2 distinct docs, and merge each doc's
  * surviving [pos, pos+k) intervals into maximal spans.
  *
  * Precision is exact up to md5 collisions (the same contract as
  * `Dedup.exactByContentHash`). Recall is spans that contain at least
  * one anchor window: a duplicated span of length L holds L−k+1
  * windows, each an anchor with the uniform 1/16 of the md5 nibble, so
  * misses decay geometrically in L (≥ 99% of spans of length k+70 are
  * caught; widen the anchor rate for shorter spans).
  *
  * 100 TB shape: one narrow scan computes windows and hashes per
  * document (no self-join, no suffix sort); the only shuffles carry
  * (digest, doc_id, pos) rows — 16-byte keys, never text — and the
  * duplicate-digest cut rides the same aggregation. Window hashing is
  * O(n·k) md5 work per doc in a tight codegen'd loop; a
  * rolling-polynomial hash would make it O(n), but md5 keeps every
  * byte of the pipeline bit-reproducible in the DuckDB oracle, the
  * same tradeoff the rest of the dedup family makes.
  */
object SubstrDedup {

  /** Anchor rows (doc_id, pos, dg) for every content-defined anchor:
    * 1-based window start, md5 hex digest of the k-char window.
    * `nibble` is the hex char that anchors a window (rate 1/16).
    *
    * The window scan is a custom codegen'd expression
    * ([[ShingleExpressions.ContentAnchors]]): the declarative
    * higher-order formulation walked an interpreted expression tree
    * and built a struct per window — 15/16 of them immediately
    * discarded — which dominated the whole pipeline (same finding as
    * the shingle expressions).
    */
  def anchors(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nibble: Char = '0'): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(ShingleExpressions.contentAnchors(col(textCol), k, nibble))
          .as("a"))
      .select(col("doc_id"), col("a.pos").as("pos"), col("a.dg").as("dg"))

  /** Maximal duplicated spans per document: anchors whose window
    * content occurs in ≥ 2 distinct documents, merged into islands
    * wherever their [pos, pos+k) intervals touch or overlap.
    * Returns (doc_id, span_start, span_end, n_anchors) with span_end
    * exclusive. All arithmetic is integer → bit-stable under any
    * partitioning.
    *
    * One pass over the anchor stream: a single digest-keyed hash
    * aggregation carries both the distinct-doc count and the
    * (doc, pos) occurrence list, and survivors explode back to rows —
    * no join back onto the anchor lineage, which would re-run the
    * scan→window→md5 subtree on the second consumer. The per-digest
    * list is bounded by the digest's document frequency (boilerplate
    * digests are exactly the interesting ones, and even those are ≤
    * one entry per containing doc).
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nibble: Char = '0'): DataFrame = {
    val a = anchors(docs, idCol, textCol, k, nibble)
    val hits = a.groupBy("dg")
      .agg(countDistinct(col("doc_id")).as("nd"),
        collect_list(struct(col("doc_id"), col("pos"))).as("occ"))
      .filter(col("nd") >= 2)
      .select(explode(col("occ")).as("o"))
      .select(col("o.doc_id").as("doc_id"), col("o.pos").as("pos"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + k)
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("new_island",
        when(prevEnd.isNull || col("pos") > prevEnd, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(
          byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_anchors"))
      .select("doc_id", "span_start", "span_end", "n_anchors")
  }

  /** Per-document duplication load: how many maximal cross-doc spans,
    * how many characters they cover, and how many anchors witnessed
    * them — the rank signal for "mostly boilerplate" document cuts.
    */
  def dupStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nibble: Char = '0'): DataFrame =
    dupSpans(docs, idCol, textCol, k, nibble)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("dup_chars"),
        sum(col("n_anchors")).as("n_dup_anchors"))

  /** APPLY the dedup: every document with its duplicated spans cut
    * out (ExactSubstr's removal step). Returns (doc_id, scrubbed).
    *
    * The spans collapse to one small sorted array per doc (maximal
    * islands are disjoint, and there are at most len/k of them), so
    * the cut is a per-row fold over that array — kept segment before
    * each span, then the tail — and docs with no spans pass through
    * untouched via the left join. No shuffle carries text except the
    * final join of the span arrays back onto the corpus, which is the
    * join any span-consuming rewrite must pay.
    */
  def scrubSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nibble: Char = '0'): DataFrame = {
    val spanArr = dupSpans(docs, idCol, textCol, k, nibble)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("sps"))
    val text = col(textCol)
    val cut = aggregate(
      col("sps"),
      struct(lit("").as("acc"), lit(1L).as("last")),
      (st, sp) => struct(
        concat(st.getField("acc"),
          text.substr(st.getField("last").cast("int"),
            (sp.getField("span_start") - st.getField("last")).cast("int")))
          .as("acc"),
        sp.getField("span_end").as("last")),
      st => concat(st.getField("acc"),
        text.substr(st.getField("last").cast("int"),
          (length(text).cast("long") - st.getField("last") + 1L).cast("int"))))
    docs
      .join(spanArr, docs(idCol) === spanArr("doc_id"), "left")
      .select(docs(idCol).as("doc_id"),
        when(col("sps").isNull, text).otherwise(cut).as("scrubbed"))
  }
}
