package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Skew controls: salted aggregation equivalence and bucketed co-located
  * joins (shuffle elimination visible in the plan). */
class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted two-phase aggregation equals direct groupBy") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"),
      Map("qty" -> col("l_quantity")), numSalts = 8)
      .select(col("l_returnflag"), round(col("qty"), 2).as("qty"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("saltedJoin equals the plain join and joins on (key, salt)") {
    import org.apache.spark.sql.functions.{lit, when}
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val spark2 = spark
      import spark2.implicits._
      // 10k rows, 80% on one key
      val fact = spark.range(10000).select(
        when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
      val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "label")
      val salted = Skew.saltedJoin(fact, dim, "k", numSalts = 8)
      val plan = salted.queryExecution.executedPlan
      val got = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val plain = fact.join(dim, "k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.sorted.toSeq === plain.sorted.toSeq)
      // placement: the join key set includes the salt, so the hot key's
      // rows hash to 8 distinct reducer keys
      assert(plan.toString.contains("__salt"),
        s"salt missing from the join plan:\n${plan.toString.take(800)}")
    }
  }

  test("autoSalts derives ceil(hot/avg) from the profile and the auto forms equal the plain ops") {
    val spark2 = spark
    import spark2.implicits._
    // 1000 rows: ids not divisible by 5 (800) key to 0; the 200 multiples
    // of 5 key to id % 100 ∈ {0, 5, …, 95} (20 keys, key 0 gaining the 10
    // multiples of 100) → hot = 810, n_keys = 20,
    // recommended = ceil(810 · 20 / 1000) = 17
    val fact = spark.range(1000).select(
      when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
      col("id").as("v"))
    assert(Skew.autoSalts(fact, Seq("k")) === 17)
    // the clamp engages
    assert(Skew.autoSalts(fact, Seq("k"), maxSalts = 16) === 16)
    // a uniform relation derives salt 1 (no salting): every key once
    val uniform = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    assert(Skew.autoSalts(uniform, Seq("k")) === 1)
    // output identity: auto join == plain join, auto agg == plain groupBy
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "label")
    val auto = Skew.saltedJoinAuto(fact, dim, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = fact.join(dim, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(auto === plain)
    val aggAuto = Skew.saltedAggregateAuto(fact, Seq("k"),
      Map("sv" -> col("v"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val aggPlain = fact.groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n_rows")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(aggAuto === aggPlain)
  }

  test("salted operators accept map-typed columns (xxhash64 can't hash maps)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{lit, map, sum => fsum}
    val fact = spark.range(100).select(
      (col("id") % 3).as("k"), col("id").as("v"),
      map(lit("a"), col("id").cast("string")).as("props"))
    val dim = (0L until 3L).map(i => (i, s"d$i")).toDF("k", "label")
    // both operators must plan and run — the map column is hashed through
    // its canonical key-sorted entry list instead of failing analysis
    val joined = Skew.saltedJoin(fact, dim, "k", numSalts = 4)
    assert(joined.count() === 100)
    val agg = Skew.saltedAggregate(fact, Seq("k"),
      Map("sv" -> col("v")), numSalts = 4)
    val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = fact.groupBy("k").agg(fsum("v").as("sv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("rowSalt: logically-equal maps salt identically regardless of entry order") {
    import org.apache.spark.sql.functions.{lit, map}
    // the same logical map built in two different entry orders — a retry
    // of a nondeterministically-ordered upstream can produce exactly this
    val a = spark.range(20).select(col("id"),
      map(lit("x"), col("id").cast("string"),
        lit("y"), lit("c")).as("props"))
    val b = spark.range(20).select(col("id"),
      map(lit("y"), lit("c"),
        lit("x"), col("id").cast("string")).as("props"))
    val sa = a.withColumn("s", Skew.rowSalt(a, 16)).select("id", "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sb = b.withColumn("s", Skew.rowSalt(b, 16)).select("id", "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sa === sb)
    // nested maps are excluded from the salt input, not rendered unstably:
    // a schema of ONLY nested-map columns still plans (constant salt)
    val nested = spark.range(5).select(
      org.apache.spark.sql.functions.array(
        map(lit("k"), lit("v"))).as("nm"))
    val s = nested.withColumn("s", Skew.rowSalt(nested, 16))
      .select("s").distinct().collect()
    assert(s.length === 1)
  }

  test("AQE splits the zipfian hot key at join time (skew=true in the final plan)") {
    withSQLConf(Skew.skewDemoConfs: _*) {
      val df = Skew.zipfianJoinDemo(spark, 200000L, 200)
      val rows = df.collect() // materialize → AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split join in the final plan:\n${plan.take(1200)}")
      // and the answer is still exact: the hot key holds exactly half
      val byLabel = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel("k0") >= 100000L) // 100k even ids + hash stragglers
      assert(rows.map(_.getLong(1)).sum === 200000L)
    }
  }

  test("selective dim filter injects a runtime bloom filter into the fact side") {
    withSQLConf(Skew.runtimeFilterDemoConfs: _*) {
      val dir = "/root/testdata/sf0.01"
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact scan:\n${plan.take(1500)}")
      // and it sits BELOW the fact side's exchange — pruning pre-shuffle
      val shuffleIdx = plan.indexOf("Exchange hashpartitioning(l_orderkey")
      val probeIdx = plan.indexOf("might_contain")
      assert(shuffleIdx >= 0 && probeIdx > shuffleIdx,
        "the probe must filter rows before they are shuffled")
      // the filter prunes candidates, never results: same count without it
      withSQLConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        assert(li.join(ord, col("l_orderkey") === col("o_orderkey")).count() === n)
      }
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Skew.Bucketing.writeBucketed(
      Tables.load(spark, dir, "orders"), "orders_bkt", "o_orderkey", 4)
    Skew.Bucketing.writeBucketed(
      Tables.load(spark, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_bkt", "o_orderkey", 4)
    // force the shuffle-join path (tiny test tables would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Skew.Bucketing.table(spark, "orders_bkt")
        .join(Skew.Bucketing.table(spark, "lineitem_bkt"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("keySkewProfile: uniform keys read flat; a hot key is named and sized") {
    import spark.implicits._
    // uniform: 4 keys × 25 rows — entropy ratio 1.0, salts 1
    val flat = (0 until 100).map(i => (i % 4).toLong).toDF("k")
    val f = Skew.keySkewProfile(flat, "k").head()
    assert((f.getLong(0), f.getLong(1)) === ((4L, 100L)))
    assert(f.getDouble(6 - 2) === 0.25, "max_key_frac")
    assert(f.getDouble(5) === 1.0, "uniform input must read entropy 1.0")
    assert(f.getLong(6) === 1L, "no salting recommended on flat keys")
    // hot: key 9 holds 60 of 100 rows over 5 keys → ⌈0.6·5⌉ = 3 salts
    val hot = ((0 until 60).map(_ => 9L) ++ (0 until 40).map(i => (i % 4).toLong))
      .toDF("k")
    val h = Skew.keySkewProfile(hot, "k").head()
    assert(h.getLong(2) === 9L && h.getLong(3) === 60L)
    assert(h.getDouble(4) === 0.6)
    assert(h.getDouble(5) < 1.0, "skew must depress the entropy ratio")
    assert(h.getLong(6) === 3L, "salt factor levels the hot reducer")
  }

  test("keySkewProfile ties on count resolve by key, not partition order") {
    import spark.implicits._
    val tied = Seq(1L, 1L, 2L, 2L).toDF("k").repartition(4)
    assert(Skew.keySkewProfile(tied, "k").head().getLong(2) === 2L)
  }
}
