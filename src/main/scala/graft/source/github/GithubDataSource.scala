package graft.source.github

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 GitHub connector: `spark.read.format("github")`.
  *
  * Options:
  *  - `repos` (required): comma-separated "owner/repo" list — one
  *    input partition per repo (parallelism across repos; fetches
  *    within a repo stay sequential because GitHub rate limits are
  *    per-token, main.py:213-241);
  *  - `apiUrl`, `chunkSize`, and either `token` or
  *    `appId`+`privateKey` (App auth; each partition mints its own
  *    installation token and refreshes it before every page fetch,
  *    mirroring main.py:213-215).
  *
  * Emits rows `(repo string, value string)` where `value` is one
  * enriched PR document; apply
  * `from_json(value, GithubSchemas.rawPullRequest)` to get the typed
  * form (that projection plus GithubTransform is what
  * [[graft.jobs.EtlJob]] runs).
  */
class GithubDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "github"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GithubDataSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GithubTable(properties.asScala.toMap)
}

object GithubDataSource {
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class GithubTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"github(${properties.getOrElse("repos", "")})"
  override def schema(): StructType = GithubDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GithubScanBuilder(properties ++ options.asScala)
}

class GithubScanBuilder(options: Map[String, String]) extends ScanBuilder {
  override def build(): Scan = new GithubScan(options)
}

final case class GithubPartition(repo: String) extends InputPartition

class GithubScan(options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = GithubDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val repos = options.getOrElse("repos",
      throw new IllegalArgumentException("github source requires 'repos' option"))
    repos.split(",").map(_.trim).filter(_.nonEmpty)
      .map(GithubPartition(_): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GithubReaderFactory(options)
}

class GithubReaderFactory(options: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val repo = partition.asInstanceOf[GithubPartition].repo
    new GithubPartitionReader(repo, options)
  }
}

/** Streams one repo's enriched PR docs. Runs on an executor: it
  * builds its own HTTP client and token manager from the serialized
  * options (per-partition credential scope, refreshed per page).
  */
class GithubPartitionReader(repo: String, options: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val opts = GithubSource.Options(
    apiUrl = options.getOrElse("apiurl", "https://api.github.com"),
    chunkSize = options.get("chunksize").flatMap(_.toIntOption).getOrElse(100),
    appId = options.get("appid"),
    privateKeyPem = options.get("privatekey"),
    token = options.get("token"))

  private lazy val iter: Iterator[String] = {
    val (extractor, refreshAuth) = GithubSource.openExtractor(repo, opts)
    extractor.pages(repo, opts.chunkSize, refreshAuth).flatten
  }

  private var current: String = _
  override def next(): Boolean =
    if (iter.hasNext) { current = iter.next(); true } else false
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(repo), UTF8String.fromString(current))
  override def close(): Unit = ()
}
