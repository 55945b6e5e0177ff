package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: key algebra, degenerate inputs, and the physical
  * payoff — a conjunctive box predicate must prune row groups in BOTH
  * dimensions against a z-clustered copy where an unclustered copy of the
  * same rows reads everything. */
class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def withDirs[A](n: Int)(body: Seq[Path] => A): A = {
    val dirs = (1 to n).map(_ => Files.createTempDirectory("graft_layout"))
    try body(dirs)
    finally dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("interleaveBits places x at odd, y at even bit positions") {
    // x=5 (101), y=3 (011), 3 bits:
    //   b0: x→bit1, y→bit0; b1: y→bit2; b2: x→bit5  ⇒ 100111 = 39
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(col("x"), col("y"), 3).as("z"))
      .head()
    assert(row.getLong(0) === 39L)
  }

  test("interleaveBitsN roundtrips: z-value decodes back to the input tuple") {
    // independent Scala decoder: bit b of dim i sits at position b*d+(d-1-i)
    def decode(z: Long, d: Int, bits: Int): Seq[Long] =
      (0 until d).map { i =>
        (0 until bits).map { b =>
          ((z >> (b * d + (d - 1 - i))) & 1L) << b
        }.reduce(_ | _)
      }
    val rnd = new scala.util.Random(42)
    val d = 3; val bits = 7
    val tuples = Seq.fill(200)(
      (rnd.nextInt(1 << bits).toLong, rnd.nextInt(1 << bits).toLong,
        rnd.nextInt(1 << bits).toLong))
    val got = tuples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.interleaveBitsN(
          Seq(col("a"), col("b"), col("c")), bits).as("z"))
      .collect()
    got.foreach { r =>
      assert(decode(r.getLong(3), d, bits) ===
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    // the 2-D form is the N-dim form at d=2
    val two = Seq((5L, 3L)).toDF("x", "y").select(
      Layout.interleaveBits(col("x"), col("y"), 3).as("a"),
      Layout.interleaveBitsN(Seq(col("x"), col("y")), 3).as("b")).head()
    assert(two.getLong(0) === two.getLong(1))
  }

  test("zorderKey: nulls get null keys, constant dimension degrades sanely") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 7L), (2L, 7L), (null, 7L)).toDF("x", "y")
    val keyed = Layout.zorderKey(df, "x", "y", 8).collect()
    assert(keyed.count(_.isNullAt(2)) === 1)
    // y is constant ⇒ its quantized value is 0 everywhere ⇒ zkey is just
    // x's bits spread to odd positions: x-lo = 0 and 1 ⇒ keys 0 and 2
    val keys = keyed.filter(!_.isNullAt(2)).map(_.getLong(2)).sorted
    assert(keys.toSeq === Seq(0L, 2L))
  }

  test("zorderKey handles negative bounds: shift against lo, not zero") {
    // lo = -4: values rebase to [0, 8); bits=3 needs no truncation, so the
    // key is the exact interleave of (x+4, y+4)
    val df = Seq((-4L, 3L), (3L, -4L), (0L, 0L)).toDF("x", "y")
    val keys = Layout.zorderKey(df, "x", "y", 3)
      .orderBy("x").collect().map(_.getLong(2))
    // (-4,3)→(0,7): y bits to even slots = 010101 = 21
    // (0,0)→(4,4): x bit2→pos5=32, y bit2→pos4=16 ⇒ 48
    // (3,-4)→(7,0): x=111 at odd slots = 101010 = 42
    assert(keys.toSeq === Seq(21L, 48L, 42L))
  }

  test("fileStats + readPruned: planning-time file pruning over the z-order layout") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    withDirs(1) { case Seq(zdir) =>
      Layout.zorderWrite(li, "l_partkey", "l_suppkey", zdir.toString,
        numFiles = 16, bits = 8)
      val stats = Layout.fileStats(spark, zdir.toString,
        Seq("l_partkey", "l_suppkey"))
      assert(stats.count() === 16) // one row per file: layout-sized
      val box = Seq(("l_partkey", 100L, 349L), ("l_suppkey", 10L, 21L))
      val pruned = Layout.readPruned(spark, zdir.toString, stats, box)
      val allFiles = spark.read.parquet(zdir.toString).inputFiles.length
      assert(pruned.inputFiles.length < allFiles / 2,
        s"planning-time pruning should drop most files: " +
          s"${pruned.inputFiles.length} of $allFiles")
      // superset-then-filter equals the full scan: pruning never drops hits
      val p = col("l_partkey").between(100, 349) &&
        col("l_suppkey").between(10, 21)
      val got = pruned.filter(p).collect().map(_.toString).sorted
      val want = spark.read.parquet(zdir.toString).filter(p)
        .collect().map(_.toString).sorted
      assert(got.sameElements(want) && got.nonEmpty)
      // an impossible box prunes everything without erroring
      assert(Layout.readPruned(spark, zdir.toString, stats,
        Seq(("l_partkey", -10L, -1L))).count() === 0)
    }
  }

  test("z-ordered layout prunes a 2-D box in both dimensions; unclustered reads all") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val total = li.count()
    withDirs(2) { case Seq(zdir, udir) =>
      Layout.zorderWrite(li, "l_partkey", "l_suppkey", zdir.toString,
        numFiles = 16, bits = 8)
      // same rows, same file count, no clustering: the control layout
      li.repartition(16).write.mode("overwrite").parquet(udir.toString)

      def boxScanRows(path: String): (Long, Array[String]) = {
        val f = spark.read.parquet(path)
          .filter(col("l_partkey").between(100, 349) &&
            col("l_suppkey").between(10, 21))
        val rows = f.collect().map(_.toString).sorted
        val scan = f.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }.head
        assert(scan.metadata("PushedFilters").contains("l_partkey"),
          s"box filter not pushed: ${scan.metadata("PushedFilters")}")
        (scan.metrics("numOutputRows").value, rows)
      }
      val (zRows, zRes) = boxScanRows(zdir.toString)
      val (uRows, uRes) = boxScanRows(udir.toString)
      assert(zRes.sameElements(uRes), "layouts must return identical rows")
      assert(zRes.nonEmpty, "box must select something")
      assert(uRows === total, "unclustered control must read every row")
      info(s"box scan read $zRows rows z-ordered vs $uRows unclustered")
      assert(zRows * 2 < uRows,
        s"z-order should skip most row groups: read $zRows of $uRows")
    }
  }

  test("bucketedTable lays out ONE sorted file per bucket and round-trips rows") {
    withDirs(1) { case Seq(dir) =>
      val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      val back = Layout.bucketedTable(df, "graft_test_bkt", dir.toString,
        "k", 8, Seq("k"))
      assert(back.count() === 1000L)
      // the repartition-before-write must collapse the tasks×buckets
      // small-file explosion to exactly one data file per bucket
      val files = Files.list(dir).iterator()
      val data = Iterator.continually(files)
        .takeWhile(_.hasNext).map(_.next().getFileName.toString)
        .filter(f => f.endsWith(".parquet") && !f.startsWith("_")).toSeq
      assert(data.size === 8, s"expected 8 bucket files, got: $data")
      // overwrite is idempotent — same name, fresh rows win
      val back2 = Layout.bucketedTable(df.limit(10), "graft_test_bkt",
        dir.toString, "k", 8, Seq("k"))
      assert(back2.count() === 10L)
      spark.sql("DROP TABLE IF EXISTS graft_test_bkt")
    }
  }

  test("two same-bucketed tables join with ZERO exchanges (the q173 plan)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    withDirs(2) { case Seq(d1, d2) =>
      val fact = (1L to 2000L).map(i => (i % 97, i.toDouble)).toDF("k", "x")
      val dim = (0L until 97L).map(i => (i, s"g${i % 5}")).toDF("k", "g")
      val ft = Layout.bucketedTable(fact, "graft_test_fact", d1.toString,
        "k", 8, Seq("k"))
      val dt = Layout.bucketedTable(dim, "graft_test_dim", d2.toString,
        "k", 8, Seq("k"))
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = ft.join(dt, "k")
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"bucketed join must not exchange:\n${joined.queryExecution.executedPlan}")
        assert(joined.count() === 2000L)
      }
      spark.sql("DROP TABLE IF EXISTS graft_test_fact")
      spark.sql("DROP TABLE IF EXISTS graft_test_dim")
    }
  }
}
