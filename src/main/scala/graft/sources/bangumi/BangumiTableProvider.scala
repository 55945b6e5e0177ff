package graft.sources.bangumi

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.bangumi.BangumiSchemas

/** DataSource V2 read connector for the Bangumi collections API — the one
  * genuinely custom physical component of the rebuild (SURVEY §2.1 S1–S3,
  * §4): the reference's nested category loop becomes the partition plan.
  *
  * - one `InputPartition` per (subject_type, collection_type) category
  *   (S3's 3×4 grid), so a 1000-executor cluster fetches categories in
  *   parallel with no shared state;
  * - count probes (S1) run at planning time and *drop empty categories* —
  *   the reference's cardinality-based partition prune that Catalyst can't
  *   know about — and feed `SupportsReportStatistics` so joins over the
  *   scan can pick broadcast strategies;
  * - equality/IN filters on the two enum columns push into the scan
  *   (`SupportsPushDownFilters`) exactly like the reference passes them as
  *   API query params;
  * - pagination, retry ×3 with backoff (R1), token-bucket politeness
  *   pacing (R2) and a 3-consecutive-failures circuit breaker (R3) live in
  *   the `PartitionReader`.
  *
  * Usage:
  * `spark.read.format("graft.sources.bangumi.BangumiTableProvider")
  *   .option("client", "fixture").load()`
  * Output: (subject_type int, collection_type int, value string-JSON) —
  * parsing to typed columns stays declarative in
  * [[graft.bangumi.BangumiTransforms.parseItems]].
  */
class BangumiTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BangumiTableProvider.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BangumiTable(new CaseInsensitiveStringMap(properties))
}

object BangumiTableProvider {
  val schema: StructType = StructType(Seq(
    StructField("subject_type", IntegerType, nullable = false),
    StructField("collection_type", IntegerType, nullable = false),
    StructField("value", StringType)))

  def clientFor(options: CaseInsensitiveStringMap): BangumiClient =
    options.getOrDefault("client", "fixture") match {
      case "fixture" =>
        new FixtureBangumiClient(options.getInt("pageFailEvery", 0))
      case "http" =>
        // live wire: .option("baseUrl", …).option("username", …); retries /
        // backoff tunable for tests (production defaults = the reference's)
        new HttpBangumiClient(
          Option(options.get("baseUrl")).getOrElse(
            throw new IllegalArgumentException("client=http needs baseUrl")),
          Option(options.get("username")).getOrElse(
            throw new IllegalArgumentException("client=http needs username")),
          maxRetries = options.getInt("maxRetries", 3),
          backoffMillis = options.getLong("backoffMillis", 1000L),
          timeoutSeconds = options.getLong("timeoutSeconds", 30L))
      case other =>
        throw new IllegalArgumentException(
          s"unknown bangumi client '$other' ('fixture' or 'http')")
    }
}

class BangumiTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "bangumi_collections"
  override def schema(): StructType = BangumiTableProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new BangumiScanBuilder(o)
}

class BangumiScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {

  private var stFilter: Option[Set[Int]] = None
  private var ctFilter: Option[Set[Int]] = None
  private var pushed: Array[Filter] = Array.empty

  private def intersect(cur: Option[Set[Int]], add: Set[Int]): Option[Set[Int]] =
    Some(cur.fold(add)(_ intersect add))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("subject_type", _: Number) => true
      case EqualTo("collection_type", _: Number) => true
      case In("subject_type", vs) => vs.forall(_.isInstanceOf[Number])
      case In("collection_type", vs) => vs.forall(_.isInstanceOf[Number])
      case _ => false
    }
    accepted.foreach {
      case EqualTo("subject_type", v: Number) =>
        stFilter = intersect(stFilter, Set(v.intValue))
      case EqualTo("collection_type", v: Number) =>
        ctFilter = intersect(ctFilter, Set(v.intValue))
      case In("subject_type", vs) =>
        stFilter = intersect(stFilter, vs.map(_.asInstanceOf[Number].intValue).toSet)
      case In("collection_type", vs) =>
        ctFilter = intersect(ctFilter, vs.map(_.asInstanceOf[Number].intValue).toSet)
      case _ =>
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new BangumiScan(options, stFilter, ctFilter)
}

case class BangumiInputPartition(subjectType: Int, collectionType: Int,
    total: Long) extends InputPartition

class BangumiScan(
    options: CaseInsensitiveStringMap,
    stFilter: Option[Set[Int]],
    ctFilter: Option[Set[Int]]) extends Scan with Batch with SupportsReportStatistics {

  private val pageSize = options.getInt("pageSize", 100)
  private val probeIntervalMs = options.getLong("probeIntervalMs", 0L)

  override def readSchema(): StructType = BangumiTableProvider.schema
  override def toBatch: Batch = this

  /** The category grid, pruned by pushed filters and by S1 count probes. */
  private lazy val partitions: Array[BangumiInputPartition] = {
    val client = BangumiTableProvider.clientFor(options)
    val probeLimiter = new RateLimiter(probeIntervalMs)
    val grid = for {
      st <- BangumiSchemas.subjectTypes if stFilter.forall(_.contains(st))
      ct <- BangumiSchemas.collectionTypes if ctFilter.forall(_.contains(ct))
    } yield {
      probeLimiter.acquire()
      val total = Retry.withBackoff(3, 100L)(client.fetchTotal(st, ct))
      BangumiInputPartition(st, ct, total)
    }
    grid.filter(_.total > 0).toArray // P5: empty-category prune
  }

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new BangumiReaderFactory(options.asCaseSensitiveMap().asScala.toMap, pageSize)

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = partitions.map(_.total).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(rows * 512L)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }
}

class BangumiReaderFactory(optionsMap: Map[String, String], pageSize: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[BangumiInputPartition]
    val opts = new CaseInsensitiveStringMap(optionsMap.asJava)
    new BangumiPartitionReader(BangumiTableProvider.clientFor(opts), part,
      pageSize, opts.getLong("pageIntervalMs", 0L))
  }
}

/** Paginates one category; R1 retry per page, R2 pacing, R3 circuit breaker
  * (stop the partition after 3 consecutive failed pages, keeping rows
  * already read — log-and-continue semantics).
  */
class BangumiPartitionReader(
    client: BangumiClient,
    part: BangumiInputPartition,
    pageSize: Int,
    pageIntervalMs: Long) extends PartitionReader[InternalRow] {

  private val limiter = new RateLimiter(pageIntervalMs)
  private var offset = 0L
  private var consecutiveFailures = 0
  private var page: Iterator[String] = Iterator.empty
  private var exhausted = false
  private var current: String = _

  private def fetchNextPage(): Unit = {
    while (!page.hasNext && !exhausted && offset < part.total) {
      limiter.acquire()
      try {
        val rows = Retry.withBackoff(3, 100L)(
          client.fetchPage(part.subjectType, part.collectionType, offset, pageSize))
        consecutiveFailures = 0
        if (rows.isEmpty) exhausted = true
        else {
          page = rows.iterator
          offset += rows.size
        }
      } catch {
        case e: Exception =>
          consecutiveFailures += 1
          offset += pageSize // skip the failed page (reference :245-253)
          if (consecutiveFailures >= 3) {
            exhausted = true // circuit breaker
          }
      }
    }
  }

  override def next(): Boolean = {
    if (!page.hasNext) fetchNextPage()
    if (page.hasNext) { current = page.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow(part.subjectType, part.collectionType,
      UTF8String.fromString(current))

  override def close(): Unit = ()
}
