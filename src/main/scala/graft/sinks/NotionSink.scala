package graft.sinks

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.sources.bangumi.{RateLimiter, Retry}

/** Property-typed key-value sink modeled on the Notion database API
  * (SURVEY §2.2 K4–K7, §2.9 I3–I4; reference
  * `/root/reference/notion_data_ingestion.py`).
  *
  * The reference's per-row HTTPS POST loop (`iterrows` + one request/row)
  * becomes `foreachPartition` with a pooled client per executor, batched
  * rate-limited writes, per-row error isolation (R4 — failed rows counted,
  * pipeline continues), and `LongAccumulator` success/error counters (A5).
  * The upsert decision (insert vs update vs soft delete) is made
  * distributively by joining against the read-back key snapshot (S5/J4)
  * instead of a driver-side dict.
  */
object NotionSink {

  /** Transport interface; production = HTTP, tests = [[InMemoryNotionApi]].
    * Implementations must be thread-safe (one instance per executor). */
  trait NotionApi extends Serializable {
    /** K4 prelude: ensure the parent page exists — pass-through when an id
      * is already configured (the reference's `create_page` short-circuit,
      * `notion_data_ingestion.py:48-80`), else create a workspace-parented
      * page carrying only a title and return its id for [[createDatabase]]
      * to hang the database under. */
    def ensureParentPage(existing: Option[String], title: String): String
    /** K4: idempotent DDL — declare the typed property schema. */
    def createDatabase(name: String, properties: Map[String, String]): String
    /** S5: read back existing (subject_id → page_id). */
    def existingRecords(): Map[Long, String]
    /** K5: insert one row of typed properties. Throws on failure. */
    def insert(key: Long, properties: Map[String, String]): Unit
    /** Upsert branch: replace properties of an existing page. */
    def update(pageId: String, properties: Map[String, String]): Unit
    /** K6/I3: logical delete — `is_active=false`. */
    def softDelete(pageId: String): Unit
  }

  /** StructType → Notion property-type declaration (K4; reference schema at
    * `notion_data_ingestion.py:106-119`). */
  def propertySchema(schema: StructType, titleCol: String): Map[String, String] =
    schema.fields.map { f =>
      val t = f.dataType match {
        case _ if f.name == titleCol => "title"
        case _: NumericType => "number"
        case BooleanType => "checkbox"
        case TimestampType | DateType => "date"
        case _ => "rich_text"
      }
      f.name -> t
    }.toMap

  /** F11 int/float split (reference `notion_data_ingestion.py:273-278`):
    * an integral float renders as an integer (`5`, not `5.0`). */
  private def numString(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** F8/F11/F12: per-value property formatting — text truncated to 2000
    * chars, numbers passed through (integral floats as ints), timestamps
    * ISO-8601. Nulls omitted (P7). */
  def formatProperties(row: Row, schema: StructType): Map[String, String] =
    schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else {
        val v = f.dataType match {
          case TimestampType =>
            val ts = row.getTimestamp(i).toLocalDateTime
            ts.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
          case DoubleType => numString(row.getDouble(i))
          case FloatType => numString(row.getFloat(i).toDouble)
          case _: NumericType => row.get(i).toString
          case BooleanType => row.get(i).toString
          case _ => row.get(i).toString.take(2000)
        }
        Some(f.name -> v)
      }
    }.toMap

  case class WriteReport(inserted: Long, updated: Long, softDeleted: Long,
      errors: Long)

  /** Merge-write `df` (keyed by `keyCol`) into the sink: new keys insert,
    * existing keys update, keys present only in the sink soft-delete.
    * `minIntervalMs` paces requests per partition (R2: the reference's
    * API budget is ~3 req/s).
    */
  def upsert(
      df: DataFrame,
      keyCol: String,
      api: NotionApi,
      minIntervalMs: Long = 0L): WriteReport = {
    val spark = df.sparkSession
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    // the join below appends __key/__page_id; an input column with either
    // name would make the join ambiguous and the insert/update split wrong
    require(!schema.fieldNames.exists(Set("__key", "__page_id")),
      "input frame must not contain reserved columns __key/__page_id")

    // S5/J4: sink snapshot is small relative to the frame — broadcast it.
    val existing = api.existingRecords()
    val existingDf = spark.createDataFrame(
      existing.toSeq.map { case (k, p) => Row(k, p) }.asJava,
      StructType(Seq(StructField("__key", LongType),
        StructField("__page_id", StringType))))

    val okAcc = spark.sparkContext.longAccumulator("notion.ok")
    val updAcc = spark.sparkContext.longAccumulator("notion.updated")
    val errAcc = spark.sparkContext.longAccumulator("notion.errors")

    val joined =
      df.join(broadcast(existingDf), col(keyCol) === col("__key"), "left_outer")
    val joinedKeyIdx = joined.schema.fieldIndex("__key")
    val pageIdIdx = joined.schema.fieldIndex("__page_id")
    joined
      .foreachPartition { rows: Iterator[Row] =>
        val limiter = new RateLimiter(minIntervalMs)
        rows.foreach { row =>
          limiter.acquire()
          try {
            if (row.isNullAt(joinedKeyIdx)) { // no __key → insert
              Retry.withBackoff(3, 100L) {
                api.insert(row.getLong(keyIdx),
                  formatProperties(row, schema))
              }
              okAcc.add(1)
            } else {
              Retry.withBackoff(3, 100L) {
                api.update(row.getString(pageIdIdx),
                  formatProperties(row, schema))
              }
              updAcc.add(1)
            }
          } catch {
            case _: Exception => errAcc.add(1) // R4: log-and-continue
          }
        }
      }

    // I3: soft-delete sink keys absent from the frame — J2 anti join, with
    // the PATCH loop run in foreachPartition like the insert/update lanes
    // (nothing materializes on the driver: a mass-deletion sync stays
    // distributed). Same R4 envelope: retry, then count-and-continue.
    val delAcc = spark.sparkContext.longAccumulator("notion.deleted")
    val delErrAcc = spark.sparkContext.longAccumulator("notion.deleteErrors")
    existingDf
      .join(df.select(col(keyCol).as("__k2")), col("__key") === col("__k2"),
        "left_anti")
      .foreachPartition { rows: Iterator[Row] =>
        val limiter = new RateLimiter(minIntervalMs)
        rows.foreach { r =>
          limiter.acquire()
          try {
            Retry.withBackoff(3, 100L)(api.softDelete(r.getString(1)))
            delAcc.add(1)
          } catch { case _: Exception => delErrAcc.add(1) }
        }
      }
    WriteReport(okAcc.value, updAcc.value, delAcc.value,
      errAcc.value + delErrAcc.value)
  }

  object InMemoryNotionApi {
    // Stores live in JVM statics keyed by store id: Spark serializes the
    // closure-captured api instance per task, and copies must still see one
    // shared store within the local[] JVM (mirrors "HTTP client per
    // executor, remote state shared" topology of the real sink).
    private[sinks] val stores =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, (Long, Map[String, String], Boolean)]]()
    private[sinks] val ids =
      new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  }

  /** In-memory fake for tests (and the offline build): page_id →
    * (key, properties, is_active). `failEveryNth` injects transient R4
    * faults (absorbed by the retry envelope); `failKeys` fails EVERY
    * insert attempt for those keys — a permanent mid-batch outage the
    * retry budget cannot mask, for replay-idempotence tests. */
  class InMemoryNotionApi(
      storeId: String = java.util.UUID.randomUUID().toString,
      failEveryNth: Int = 0,
      failKeys: Set[Long] = Set.empty) extends NotionApi {

    def pages: ConcurrentHashMap[String, (Long, Map[String, String], Boolean)] =
      InMemoryNotionApi.stores.computeIfAbsent(storeId,
        _ => new ConcurrentHashMap())

    private def nextId: Long = InMemoryNotionApi.ids
      .computeIfAbsent(storeId, _ => new java.util.concurrent.atomic.AtomicLong())
      .incrementAndGet()

    private val calls = new java.util.concurrent.atomic.AtomicLong()
    private def maybeFail(): Unit =
      if (failEveryNth > 0 && calls.incrementAndGet() % failEveryNth == 0)
        throw new RuntimeException("injected sink failure")

    override def ensureParentPage(existing: Option[String], title: String): String =
      existing.getOrElse(s"parent-page-$nextId")
    override def createDatabase(name: String, properties: Map[String, String]): String =
      s"db-$name"
    override def existingRecords(): Map[Long, String] =
      pages.asScala.collect { case (pid, (k, _, _)) => k -> pid }.toMap
    override def insert(key: Long, properties: Map[String, String]): Unit = {
      if (failKeys(key))
        throw new RuntimeException(s"injected permanent failure for $key")
      maybeFail()
      pages.put(s"page-$nextId", (key, properties, true))
    }
    override def update(pageId: String, properties: Map[String, String]): Unit = {
      maybeFail()
      val cur = pages.get(pageId)
      require(cur != null, s"unknown page $pageId")
      pages.put(pageId, (cur._1, properties, cur._3))
    }
    override def softDelete(pageId: String): Unit = {
      val cur = pages.get(pageId)
      require(cur != null, s"unknown page $pageId")
      pages.put(pageId, (cur._1, cur._2, false))
    }
  }
}
