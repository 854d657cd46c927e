package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for text corpora: emails, URLs, and phone-shaped
  * digit runs are replaced with stable tokens before training-data
  * release. Pure `regexp_replace` chains — codegen'd, single pass per
  * pattern, no UDFs — so the operator is a narrow projection that
  * fuses into whatever scan precedes it.
  *
  * Pattern notes: kept within the common subset of Java regex (Spark)
  * and RE2 (DuckDB oracle) — character classes, bounded repetition,
  * optional prefix; no lookarounds, no backreferences. Replacement
  * order matters and is fixed: emails first (their local parts may
  * contain digit runs), then URLs (paths may contain digit runs),
  * then phones — so later patterns never see text the earlier ones
  * already claimed.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"

  /** Phone-shaped runs must carry calling-number STRUCTURE — a `+`
    * country prefix (E.164, 7–16 chars) or NANP 3-3-4 dash groups —
    * not merely 8+ digits: a bare digit-run rule would also swallow
    * timestamps, ISBNs, and numeric ids, which is lossy for training
    * text. Dash-dates (2024-01-01) don't match either alternative
    * (4-digit lead group, 2-digit tail). Undashed domestic numbers
    * ("4155550199") are indistinguishable from ids by shape and are
    * deliberately NOT matched.
    */
  val PhoneRe = "\\+[0-9][0-9\\-]{5,14}[0-9]|[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(text, lit("")), lit(EmailRe), lit("<EMAIL>")),
        lit(UrlRe), lit("<URL>")),
      lit(PhoneRe), lit("<PHONE>"))

  def emailCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(EmailRe)).cast("long")

  def urlCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(UrlRe)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(PhoneRe)).cast("long")
}
