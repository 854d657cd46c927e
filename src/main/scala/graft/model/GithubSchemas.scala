package graft.model

import org.apache.spark.sql.types._

/** Schemas for the GitHub ETL data model.
  *
  * Input: the enriched pull-request document — a GitHub PR object with
  * three nested child arrays attached by the extractor (reference
  * main.py:231-239; shapes documented by mock_github_api.py:45-258).
  *
  * Output: the four relational tables, authoritative DDL in the
  * reference's data.yml:6-86 (BigQuery INTEGER → LongType since GitHub
  * ids exceed 2^31; TIMESTAMP → TimestampType, session TZ UTC;
  * STRING REPEATED → ArrayType(StringType)).
  */
object GithubSchemas {

  /** Raw enriched-PR input (fields the transform actually reads;
    * unknown extra API fields are simply absent from the schema and
    * ignored on read).
    */
  val rawPullRequest: StructType = StructType(Seq(
    StructField("number", LongType),
    StructField("title", StringType),
    StructField("state", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("merged_at", StringType),
    StructField("labels", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("commit_data", ArrayType(StructType(Seq(
      StructField("sha", StringType),
      StructField("commit", StructType(Seq(
        StructField("author", StructType(Seq(
          StructField("name", StringType),
          StructField("email", StringType),
          StructField("date", StringType))))))),
      StructField("files", ArrayType(StructType(Seq(
        StructField("filename", StringType),
        StructField("additions", LongType),
        StructField("deletions", LongType),
        StructField("status", StringType))))))))),
    StructField("reviewer_data", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(StructField("login", StringType)))),
      StructField("state", StringType),
      StructField("submitted_at", StringType))))),
    StructField("comment_data", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(StructField("login", StringType)))),
      StructField("body", StringType),
      StructField("created_at", StringType),
      StructField("pull_request_review_id", LongType)))))
  ))

  val pullRequests: StructType = StructType(Seq(
    StructField("pull_request_id", LongType),
    StructField("current_status", StringType),
    StructField("date_created", TimestampType),
    StructField("date_modified", TimestampType),
    StructField("target_repository", StringType),
    StructField("bug_id", LongType),
    StructField("date_landed", TimestampType),
    StructField("date_approved", TimestampType),
    StructField("labels", ArrayType(StringType)),
    StructField("snapshot_date", DateType)))

  val commits: StructType = StructType(Seq(
    StructField("pull_request_id", LongType),
    StructField("target_repository", StringType),
    StructField("commit_sha", StringType),
    StructField("date_created", TimestampType),
    StructField("author_username", StringType),
    StructField("author_email", StringType),
    StructField("filename", StringType),
    StructField("lines_removed", LongType),
    StructField("lines_added", LongType),
    StructField("snapshot_date", DateType)))

  val reviewers: StructType = StructType(Seq(
    StructField("pull_request_id", LongType),
    StructField("target_repository", StringType),
    StructField("date_reviewed", TimestampType),
    StructField("reviewer_email", StringType),
    StructField("reviewer_username", StringType),
    StructField("status", StringType),
    StructField("snapshot_date", DateType)))

  val comments: StructType = StructType(Seq(
    StructField("pull_request_id", LongType),
    StructField("target_repository", StringType),
    StructField("comment_id", LongType),
    StructField("date_created", TimestampType),
    StructField("author_email", StringType),
    StructField("author_username", StringType),
    StructField("character_count", LongType),
    StructField("status", StringType),
    StructField("snapshot_date", DateType)))
}
