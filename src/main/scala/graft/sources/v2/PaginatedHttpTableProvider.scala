package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{HttpFetch, PaginatedJsonSource}

/** DataSourceV2 connector for the paginated-JSON HTTP endpoint — the
  * scale path for SURVEY.md S3. Where the driver-side loop
  * ([[graft.sources.PaginatedJsonSource]]) serializes page fetches, this
  * plans one input partition per page RANGE, so a 1000-executor cluster
  * fetches pages concurrently and ingest bandwidth scales with the
  * cluster, not the driver.
  *
  * Output schema is deliberately raw — `(arrival_idx long, page int,
  * raw string)` — one row per results-array element, JSON untouched.
  * Parsing stays declarative on top (`from_json` with the caller's
  * schema), keeping the connector free of schema inference and letting
  * Catalyst prune/push down the parsed columns. Page bodies are decoded
  * with the same element splitter as the driver-side source.
  *
  * Options: `url` (required), `pages` (total page count, default 301),
  * `limit` (rows per page, default 1000), `pagesPerPartition` (default
  * 8), `token` (optional Bearer), `timeoutSeconds`.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.PaginatedHttpTableProvider")
  *     .option("url", base).option("pages", 4).option("limit", 1000)
  *     .load()
  * }}}
  */
class PaginatedHttpTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PaginatedHttpTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PaginatedHttpTable(new CaseInsensitiveStringMap(properties))
}

object PaginatedHttpTable {
  val schema: StructType = StructType(Seq(
    StructField("arrival_idx", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("raw", StringType, nullable = false)))
}

class PaginatedHttpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paginated-http(${options.get("url")})"
  override def schema(): StructType = PaginatedHttpTable.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PaginatedHttpScan(
      url = Option(opts.get("url")).getOrElse(
        throw new IllegalArgumentException("option 'url' is required")),
      pages = opts.getInt("pages", 301),
      limit = opts.getInt("limit", 1000),
      pagesPerPartition = opts.getInt("pagesPerPartition", 8),
      token = Option(opts.get("token")),
      timeoutSeconds = opts.getInt("timeoutSeconds", 10))
}

case class PageRangePartition(startPage: Int, endPageExclusive: Int)
    extends InputPartition

class PaginatedHttpScan(url: String, pages: Int, limit: Int,
                        pagesPerPartition: Int, token: Option[String],
                        timeoutSeconds: Int)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PaginatedHttpTable.schema
  override def toBatch: Batch = this
  override def description(): String = s"PaginatedHttpScan($url, pages=$pages)"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages by pagesPerPartition).map(p =>
      PageRangePartition(p, math.min(p + pagesPerPartition, pages)): InputPartition
    ).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PageRangeReaderFactory(url, limit, token, timeoutSeconds)
}

class PageRangeReaderFactory(url: String, limit: Int, token: Option[String],
                             timeoutSeconds: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[PageRangePartition]
    new PageRangeReader(url, limit, token, timeoutSeconds, range)
  }
}

/** Executor-side reader: fetch the partition's pages lazily, one row per
  * results element. A short page (< limit rows) marks end-of-data, so
  * later pages in this partition are skipped (ranges beyond the real
  * page count fetch exactly one empty/short page then stop).
  */
class PageRangeReader(url: String, limit: Int, token: Option[String],
                      timeoutSeconds: Int, range: PageRangePartition)
    extends PartitionReader[InternalRow] {
  private val fetch = new HttpFetch(timeoutSeconds, token)
  private var page = range.startPage
  private var exhausted = false
  private var current: Iterator[(Long, Int, String)] = Iterator.empty

  private def loadNextPage(): Unit = {
    if (page >= range.endPageExclusive) { exhausted = true; return }
    val body = fetch.getString(s"$url?page=$page&limit=$limit")
    val elems = PaginatedJsonSource.pageElements(body)
    current = elems.iterator.zipWithIndex.map { case (e, pos) =>
      (page.toLong * limit + pos, page, e)
    }
    if (elems.size < limit) exhausted = true // short page: no pages after this
    page += 1
  }

  override def next(): Boolean = {
    while (!current.hasNext && !exhausted) loadNextPage()
    current.hasNext
  }

  override def get(): InternalRow = {
    val (idx, p, raw) = current.next()
    InternalRow(idx, p, UTF8String.fromString(raw))
  }

  override def close(): Unit = ()
}
