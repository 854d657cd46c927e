package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
  * maximal spans between stopwords/punctuation; each word scores
  * degree/frequency (degree = Σ length of phrases it appears in,
  * frequency = occurrence count), and a phrase scores the sum of its
  * word scores. Scores ride as FIXED-POINT integers
  * (`(scale·deg) div freq` — the [[Graphs.resourceAllocation]]
  * discipline), so the whole pipeline is exact integer folds and the
  * ranking hash-verifies cross-engine; ties break on the phrase text.
  *
  * Scale shape: two explodes (phrase→occurrences, phrase→words), two
  * hash aggregations, one vocabulary join — no windows, no sorts
  * except the final global top-k (TakeOrdered). The phrase frame is
  * persisted (it feeds both the word-score and phrase-count passes).
  * On natural text phrases are bounded by inter-stopword spans
  * (words, not documents); the synthetic corpus's stopword-free runs
  * make phrases document-sized — the worst case for the phrase-keyed
  * shuffle, documented rather than hidden (key by digest and rejoin
  * a representative if it ever dominates).
  *
  * Extends the reference's text surface (SURVEY.md §2.8 has only
  * length/regex ops) toward corpus keyword profiling.
  */
object Rake {

  /** Delimiter profile: the "en" stopword set shared with language
    * ID, so the oracle regex is built from the same literals. */
  val Stopwords: Seq[String] = TextOps.StopwordProfiles.head._2

  val StopRe: String = "\\b(" + Stopwords.mkString("|") + ")\\b"

  /** Candidate-phrase string: lowercase, punctuation runs and
    * stopwords both become the `|` delimiter. */
  def phraseString(text: Column): Column =
    regexp_replace(
      regexp_replace(lower(coalesce(text, lit(""))), "[^a-z ]+", "|"),
      StopRe, "|")

  /** Top-k RAKE keywords over a corpus.
    *
    * @return (phrase, n, score1000) — n = occurrence count,
    *         score1000 = Σ_w (1000·deg(w)) div freq(w)
    */
  def keywords(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val phrases = df
      .select(explode(split(phraseString(col(textCol)), "\\|")).as("p0"))
      .select(trim(col("p0")).as("phrase"))
      .filter(col("phrase") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = phrases
      .select(filter(split(col("phrase"), " "), w => w =!= "").as("wp"))
      .select(explode(col("wp")).as("w"),
        size(col("wp")).cast("long").as("nw"))
    val wscore = occ.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("nw").as("deg"))
      .select(col("w"), expr("(1000 * deg) div freq").as("s1000"))
    val pdist = phrases.groupBy("phrase").agg(count(lit(1)).as("n"))
    pdist
      .select(col("phrase"), col("n"),
        explode(filter(split(col("phrase"), " "), w => w =!= "")).as("w"))
      .join(wscore, Seq("w"))
      .groupBy("phrase", "n")
      .agg(sum(col("s1000")).as("score1000"))
      .orderBy(col("score1000").desc, col("phrase"))
      .limit(topK)
  }
}
