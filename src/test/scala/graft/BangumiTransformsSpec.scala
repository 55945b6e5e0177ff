package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.bangumi.{BangumiTransforms, Fixtures}

/** Golden tests over the bundled fixture corpus (FIXTURES.md §1/§2). */
class BangumiTransformsSpec extends AnyFunSuite with SparkSpec {

  private lazy val items = Fixtures.items(spark).cache()
  private lazy val raw = BangumiTransforms.rawProjection(items, "graft")
  private lazy val analytics = BangumiTransforms.analyticsProjection(items)

  private def rawRow(id: Long, at: Int = 0): Row =
    raw.filter(raw("subject_id") === id).collect()(at)

  private def anRow(id: Long): Row =
    analytics.filter(analytics("subject_id") === id).collect()(0)

  test("raw projection has the 21 documented columns") {
    assert(raw.columns.toSeq === Seq(
      "user_id", "subject_id", "subject_type", "collection_type",
      "created_at", "updated_at", "ep_status", "vol_status", "name",
      "name_cn", "score", "rank", "collection_total", "eps", "volumes",
      "date", "type", "short_summary", "tags", "tags_raw", "infobox_raw"))
  }

  test("analytics projection has the 27 documented columns") {
    assert(analytics.columns.length === 27)
    assert(analytics.columns.take(11).toSeq === Seq("subject_id",
      "subject_type", "collection_type", "name_cn", "score", "rank",
      "collection_total", "created_at", "updated_at", "eps", "air_date"))
    assert(analytics.columns.last === "all_tags")
  }

  test("timestamps keep source wall clock (offset stripped, not converted)") {
    // 2024-05-01T12:34:56+08:00 → naive 12:34:56, NOT 04:34:56 UTC
    val r = rawRow(101)
    assert(r.getAs[Timestamp]("created_at") ===
      Timestamp.valueOf("2024-05-01 12:34:56"))
  }

  test("garbage timestamps coerce to null") {
    assert(rawRow(103).getAs[Timestamp]("created_at") === null)
  }

  test("short_summary truncated to 500 code points (Python [:500] parity)") {
    val s = rawRow(105).getAs[String]("short_summary")
    assert(s.codePointCount(0, s.length) === 500)
  }

  test("name_cn falls back through empty string AND null (Python or)") {
    assert(anRow(102).getAs[String]("name_cn") === "Frieren") // was ""
    assert(anRow(103).getAs[String]("name_cn") === "三体") // was null
  }

  test("bilingual infobox fallback: 監督 feeds director") {
    assert(anRow(102).getAs[String]("director") === "斎藤圭一郎")
    assert(anRow(102).getAs[String]("studio") === "MADHOUSE")
  }

  test("top-5 tag pivot is positional and null-padded") {
    val r = anRow(101)
    assert(r.getAs[String]("tag_1_name") === "芳文社")
    assert(r.getAs[Int]("tag_1_count") === 2300)
    assert(r.getAs[String]("tag_5_name") === "吉他")
    val few = anRow(103) // one tag only
    assert(few.getAs[String]("tag_1_name") === "科幻")
    assert(few.getAs[String]("tag_2_name") === null)
  }

  test("all_tags filters falsy names and joins; empty → null") {
    assert(anRow(101).getAs[String]("all_tags") ===
      "芳文社, 音乐, 摇滚, 京都, 吉他, 青春")
    assert(anRow(105).getAs[String]("all_tags") === null)
  }

  test("blank infobox keys / blank values dropped from infobox_raw") {
    val ib = rawRow(104).getAs[String]("infobox_raw")
    assert(ib.contains("发售日"))
    assert(!ib.contains("dropped"))
    assert(!ib.contains("厂牌"))
  }

  test("empty tags/infobox → null raw JSON columns") {
    val r = rawRow(105)
    assert(r.getAs[String]("tags_raw") === null)
    assert(r.getAs[String]("infobox_raw") === null)
  }

  test("quality metrics flag the duplicate subject_id") {
    val m = BangumiTransforms.qualityMetrics(raw).collect()(0)
    assert(m.getAs[Long]("n_rows") === 7)
    assert(m.getAs[Long]("n_dup_rows") === 1) // id 101 twice
    assert(m.getAs[Long]("n_null_created") === 2) // garbage + null
  }

  test("category summary carries enum labels") {
    val s = BangumiTransforms.categorySummary(analytics)
    val anime = s.filter(s("subject_type") === 2 && s("collection_type") === 2)
      .collect()(0)
    assert(anime.getAs[String]("subject_type_label") === "动画/Anime")
    assert(anime.getAs[String]("collection_type_label") === "看过/Watched")
    assert(anime.getAs[Long]("fetched_items") === 2)
  }
}
