package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL decomposition, per-domain corpus
  * statistics, and domain blocklist filtering — the C4/RefinedWeb-style
  * source-level hygiene pass that runs before any per-document scoring
  * (a domain-level decision removes millions of documents with one
  * broadcast join, where a per-document classifier would pay a full
  * corpus scan).
  *
  * Scale shape: `host`/`registeredDomain` are codegen'd built-ins
  * (`parse_url` + array ops) evaluated inline in the scan projection;
  * `domainStats` shuffles one short string key per document; the
  * blocklist filter is a broadcast LEFT ANTI join (the blocklist is
  * always tiny relative to the corpus). The corpus-share column is
  * integer parts-per-million — no float division, so results are
  * bit-stable across partitionings and replicable in the oracle.
  */
object Web {

  /** Lower-cased URL authority (host[:port] stripped to host). */
  def host(url: Column): Column =
    lower(parse_url(url, lit("HOST")))

  /** Approximate registered domain: the last two dot-labels of the
    * host. A production pass would consult the public-suffix list
    * (where "co.uk" counts as one label); the two-label rule is the
    * deterministic, list-free approximation and the operator seam is
    * the same.
    */
  def registeredDomain(hostCol: Column): Column =
    concat_ws(".", slice(split(hostCol, "\\."), -2, 2))

  /** Per-registered-domain corpus stats: document count, total
    * characters, and integer parts-per-million share of the corpus
    * document count. One hash aggregation on the domain string plus a
    * broadcast 1-row total — no second scan, no float division.
    */
  def domainStats(df: DataFrame, urlCol: String, charsCol: String): DataFrame = {
    val base = df.select(
      registeredDomain(host(col(urlCol))).as("domain"),
      col(charsCol).cast("long").as("__chars"))
    val total = base.agg(count(lit(1)).as("__n"))
    base.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("__chars")).as("n_chars"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("(n_docs * CAST(1000000 AS BIGINT)) div __n"))
      .drop("__n")
  }

  /** Drop documents whose registered domain appears in `blocked`
    * (1-column frame `domain`): broadcast LEFT ANTI join, so the
    * corpus is scanned once and never shuffled.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String, blocked: DataFrame): DataFrame =
    df.withColumn("__dom", registeredDomain(host(col(urlCol))))
      .join(broadcast(blocked.select(col("domain").as("__dom"))), Seq("__dom"), "left_anti")
      .drop("__dom")

  /** Keep at most `maxDocs` documents per registered domain — the
    * RefinedWeb-style anti-concentration cap that stops one boilerplate
    * host from dominating the mixture. Keeps the `maxDocs` LOWEST
    * `idCol` values per domain (deterministic under any partitioning)
    * and returns the input columns plus `domain`.
    *
    * Scale shape: one shuffle on the domain key; the per-domain
    * election is a row_number (per-group sort bounded by the domain's
    * doc count). A corpus where single domains reach billions of rows
    * should elect via [[graft.functions.TopKRows]] instead — the
    * bounded mergeable heap keeps the shuffle at O(domains · maxDocs);
    * the window form is the right default below that regime.
    */
  def capPerDomain(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      maxDocs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("domain", registeredDomain(host(col(urlCol))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col(idCol))))
      .filter(col("__rn") <= maxDocs)
      .drop("__rn")
  }

  /** URL canonicalization — the normalization that makes URL-keyed
    * dedup actually deduplicate (crawls disagree on case, default
    * ports, tracking params, fragments, and trailing slashes for the
    * same resource). Fixed rule order:
    *
    *  1. drop the `#fragment`;
    *  2. lowercase the `scheme://host[:port]` prefix (the path and
    *     query stay case-sensitive — they ARE significant);
    *  3. drop an explicit `:443` default port;
    *  4. strip non-leading `&utm_*` tracking parameters;
    *  5. strip one trailing `/`.
    *
    * Pure per-row string projection (zero shuffles, codegen'd
    * built-ins) over the Java∩RE2 regex subset the [[Redact]] pass
    * established — every regex and replacement runs byte-identically
    * in DuckDB, no backreferences anywhere. A leading `?utm_` param
    * is out of scope for the regex rule (stripping it would need
    * separator rewriting — a backreference — so the contract is the
    * conventional "tracking params are appended" one).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase the scheme://authority prefix only
    val prefix = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", 0)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, length(noFrag)))
    val noPort = regexp_replace(lowered, ":443/", "/")
    val noUtm = regexp_replace(noPort, "&utm_[^&#]*", "")
    regexp_replace(noUtm, "/$", "")
  }
}
