package graft.bangumi

import org.apache.spark.sql.types._

/** Schemas for the Bangumi collection-item data model (FIXTURES.md §1;
  * reference field dictionary: Documentation.docx §4.2/§4.3, projections at
  * `/root/reference/bangumi_data_ingestion.py:409-461`).
  *
  * `infobox` is NOT part of the typed schema: its `value` field is
  * polymorphic (string | list | dict) and is extracted as a raw JSON string,
  * then flattened by the custom expression
  * [[graft.functions.InfoboxToMap]] (SURVEY §2.8 F1).
  */
object BangumiSchemas {

  val tagType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("count", IntegerType)))

  val subjectType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("name_cn", StringType),
    StructField("score", DoubleType),
    StructField("rank", IntegerType),
    StructField("collection_total", LongType),
    StructField("eps", IntegerType),
    StructField("volumes", IntegerType),
    StructField("date", StringType),
    StructField("type", IntegerType),
    StructField("short_summary", StringType),
    StructField("tags", ArrayType(tagType))))

  /** One collection item as returned by the paginated collections endpoint.
    * `created_at`/`updated_at` stay strings here; timestamp normalization
    * (F7, wall-clock semantics) happens in the transform layer.
    */
  val itemSchema: StructType = StructType(Seq(
    StructField("subject_id", LongType),
    StructField("subject_type", IntegerType),
    StructField("type", IntegerType), // collection type
    StructField("ep_status", IntegerType),
    StructField("vol_status", IntegerType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("subject", subjectType)))

  /** Enum dictionaries (`bangumi_data_ingestion.py:26-41`; docx §6.1). */
  val subjectTypeLabels: Map[Int, String] = Map(
    1 -> "书籍/Books", 2 -> "动画/Anime", 3 -> "音乐/Music",
    4 -> "游戏/Games", 6 -> "三次元/Real")

  val collectionTypeLabels: Map[Int, String] = Map(
    1 -> "想看/Want", 2 -> "看过/Watched", 3 -> "在看/Watching",
    4 -> "搁置/On-hold", 5 -> "抛弃/Dropped")

  /** The category grid the reference collects (`:44-45`). */
  val subjectTypes: Seq[Int] = Seq(1, 2, 3)
  val collectionTypes: Seq[Int] = Seq(1, 2, 3, 4)
}
