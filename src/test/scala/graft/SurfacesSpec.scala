package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.bangumi.{BangumiTransforms, Fixtures}

/** Remaining I/O + SQL surfaces: CSV export (K1/K2 contract) and the
  * spark.sql text dialect over registered views + custom functions. */
class SurfacesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("CSV export round-trips the analytics frame (UTF-8, CJK intact)") {
    val analytics = BangumiTransforms.analyticsProjection(Fixtures.items(spark))
      .drop("created_at", "updated_at") // CSV has no timestamp contract
    val out = Files.createTempDirectory("graft-csv").toString + "/analytics"
    analytics.write.option("header", "true").option("encoding", "UTF-8")
      .csv(out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === analytics.count())
    assert(back.filter($"name_cn" === "孤独摇滚！").count() === 2)
  }

  test("the engine is queryable through SQL text, including custom functions") {
    graft.functions.GraftFunctions.register(spark)
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val revenue = spark.sql(
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |GROUP BY n_name ORDER BY revenue DESC LIMIT 3""".stripMargin)
    assert(revenue.count() === 3)

    val flat = spark.sql(
      """SELECT infobox_to_map('[{"key":"导演","value":"斎藤圭一郎"}]') AS m,
        |       size(rolling_chunks('some text to chunk into pieces', 4, 3)) AS n""".stripMargin)
      .head()
    assert(flat.getMap[String, String](0).get("导演").contains("斎藤圭一郎"))
    assert(flat.getInt(1) > 0)
  }
}
