package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Sampling, Scrub}

/** Unit coverage for the corpus-hygiene operators: contamination detection,
  * deterministic sampling, PII scrubbing, boilerplate-line removal. */
class CorpusSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- benchmark contamination ----------------------------------------

  test("benchmarkOverlap counts shared distinct shingles and applies the floor") {
    val corpus = Seq(
      (10L, "a b c d e f"), // shares 3-grams "a b c".."d e f" with bench doc 1
      (11L, "a b c x y z"), // shares only "a b c"
      (12L, "p q r s t u") // shares nothing
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val hits = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", 3, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(10L -> 4L)) // "a b c","b c d","c d e","d e f"
  }

  test("benchmarkOverlap broadcasts the benchmark side") {
    val corpus = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", 3, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- deterministic sampling -----------------------------------------

  private def corpusDocs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratifiedFixedK equals the window/row_number formulation") {
    val viaAgg = Sampling.stratifiedFixedK(corpusDocs, "lang", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(Sampling.sampleKey($"doc_id"), $"doc_id")
    val viaWindow = corpusDocs
      .select($"lang", $"doc_id", row_number().over(w).as("sample_rank"))
      .filter($"sample_rank" <= 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("stratifiedFixedK ranks are contiguous from 1 within each stratum") {
    val byLang = Sampling.stratifiedFixedK(corpusDocs, "lang", "doc_id", 5)
      .collect().groupBy(_.getString(0))
    byLang.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
    }
  }

  test("stratifiedByFraction is a deterministic subset with sane rates") {
    val sampled = Sampling.stratifiedByFraction(
      corpusDocs, "lang", "doc_id", Map("en" -> 0.5), 0.125)
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedByFraction(
        corpusDocs, "lang", "doc_id", Map("en" -> 0.5), 0.125)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2) // rerun-stable
    val all = corpusDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(all) && ids1.nonEmpty && ids1.size < all.size)
  }

  test("fraction thresholds hit the exact hex grid and the edges") {
    assert(Sampling.fractionThreshold(0.5) === "8000000000000000")
    assert(Sampling.fractionThreshold(0.25) === "4000000000000000")
    assert(Sampling.fractionThreshold(0.0) === "0000000000000000")
    // fraction 1.0 must keep every row: every md5 sorts below "ffff...f"
    // only if the threshold exceeds any hex string — clamp keeps 2^64-1
    assert(Sampling.fractionThreshold(1.0) === "ffffffffffffffff")
  }

  // ---- PII redaction ---------------------------------------------------

  test("capPerHost: per-host cap, unparseable URLs filtered, domain extraction") {
    import graft.operators.Scrub
    val d = (1 to 20).map { i =>
      val url =
        if (i % 7 == 0) "not a url"
        else if (i % 2 == 0) s"https://a.big.example.org/p/$i"
        else s"http://small.example.net/$i"
      (i.toLong, url)
    }.toDF("doc_id", "url")
    val capped = Scrub.capPerHost(d, "url", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // two real hosts, ≤3 docs each; the 2 unparseable rows contribute none
    assert(capped.map(_._1).distinct.sorted.toSeq ===
      Seq("a.big.example.org", "small.example.net"))
    assert(capped.groupBy(_._1).forall(_._2.length === 3))
    assert(capped.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq === Seq(1, 2, 3)))
    // registrable domain = last two labels
    val dom = d.select(Scrub.registrableDomain(
        Scrub.urlHost($"url")).as("dm"))
      .filter($"dm".isNotNull).distinct().collect().map(_.getString(0)).sorted
    assert(dom.toSeq === Seq("example.net", "example.org"))
  }

  test("redactPii replaces emails, phones, and IPs with typed tags") {
    val df = Seq(
      (1L, "mail bob.smith+x@sub.example.org now"),
      (2L, "call 415-555-0123 or visit 10.0.255.3 today"),
      (3L, "no pii here at all"),
      (4L, "a@b.co and 1.2.3.4 and 800-555-1234")
    ).toDF("id", "t")
    val out = df.select($"id", Scrub.redactPii($"t").as("r"),
        Scrub.countMatches($"t", Scrub.EmailPattern).as("ne"),
        Scrub.countMatches($"t", Scrub.PhonePattern).as("np"),
        Scrub.countMatches($"t", Scrub.IpPattern).as("ni"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) === (("mail [EMAIL] now", 1, 0, 0)))
    assert(out(2L) === (("call [PHONE] or visit [IP] today", 0, 1, 1)))
    assert(out(3L) === (("no pii here at all", 0, 0, 0)))
    assert(out(4L) === (("[EMAIL] and [IP] and [PHONE]", 1, 1, 1)))
  }

  test("redactPii is idempotent") {
    val df = Seq((1L, "x a@b.co 1.2.3.4 415-555-0123 y")).toDF("id", "t")
    val once = df.select(Scrub.redactPii($"t").as("r"))
    val twice = once.select(Scrub.redactPii($"r").as("r"))
    assert(once.collect().head.getString(0) === twice.collect().head.getString(0))
  }

  // ---- boilerplate line removal ---------------------------------------

  test("dropBoilerplateLines drops corpus-frequent lines, keeps order") {
    val footer = "all rights reserved"
    val df = Seq(
      (1L, s"alpha body one\n$footer\nclosing one"),
      (2L, s"$footer\nbeta body two"),
      (3L, s"gamma body three\n$footer"),
      (4L, footer) // every line is boilerplate → doc drops out
    ).toDF("doc_id", "text")
    val out = Scrub.dropBoilerplateLines(df, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out === Map(
      1L -> ((2L, "alpha body one\nclosing one")),
      2L -> ((1L, "beta body two")),
      3L -> ((1L, "gamma body three"))))
  }

  test("dropBoilerplateLines keeps within-doc repeats below the doc-freq cap") {
    // the same line twice in ONE doc is df=1, not df=2 — must survive
    val df = Seq(
      (1L, "dup line\nmiddle\ndup line"),
      (2L, "other content")
    ).toDF("doc_id", "text")
    val out = Scrub.dropBoilerplateLines(df, "doc_id", "text", maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "dup line\nmiddle\ndup line")
  }

  test("dropBoilerplateLines does not force the hot-line broadcast") {
    // The hot-line relation is bounded only by corpus content; a forced
    // broadcast() hint would OOM the driver at crawl scale. With the
    // auto-broadcast threshold disabled, a hint-free plan must fall back to
    // a non-broadcast anti join — and produce the same result.
    val df = Seq(
      (1L, "alpha\nshared\nomega"), (2L, "shared\nbeta"), (3L, "shared\ngamma")
    ).toDF("doc_id", "text")
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val out = Scrub.dropBoilerplateLines(df, "doc_id", "text", maxDocFreq = 2)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      val rows = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(rows === Map(1L -> "alpha\nomega", 2L -> "beta", 3L -> "gamma"))
    }
  }

  // ---- sequence packing -------------------------------------------------

  /** From-scratch greedy fold over (id, n_tokens), independent of the
    * operator's implementation: per pmod-bucket, ascending id, a doc joins
    * the open pack unless it would exceed the budget. */
  private def refPack(docs: Seq[(Long, Int)], budget: Int, nBuckets: Int)
      : Set[(Long, Long, Int, Int)] =
    docs.groupBy { case (id, _) => java.lang.Math.floorMod(id, nBuckets.toLong) }
      .toSeq.flatMap { case (bucket, ds) =>
        var acc = 0L
        var pack = 0
        ds.sortBy(_._1).map { case (id, n) =>
          if (pack == 0 || acc + n > budget) { pack += 1; acc = n.toLong }
          else acc += n
          (id, bucket, pack, n)
        }
      }.toSet

  /** Text with exactly `n` whitespace tokens. */
  private def nTokenText(n: org.apache.spark.sql.Column) =
    concat_ws(" ", transform(sequence(lit(1), n), _ => lit("w")))

  test("packGreedy matches an independent fold: overflow, oversized, " +
      "exact-fit boundary, negative ids") {
    val budget = 10
    val nBuckets = 3
    val docs = Seq(
      // bucket 0 (ids 0,3,6,9,12): 5+5 = exact budget fit, then overflow
      (0L, 5), (3L, 5), (6L, 2), (9L, 3), (12L, 6),
      // bucket 1: FIRST doc oversized (30 > budget) → own pack, restart after
      (-2L, 30), (1L, 5), (4L, 3), (7L, 11), (10L, 1), (13L, 4),
      // bucket 2: negative id via pmod; mid-stream oversized doc
      (-7L, 4), (2L, 12), (5L, 6)
    )
    val df = docs.toDF("doc_id", "n")
      .select($"doc_id", nTokenText($"n").as("text"))
    val got = Packing.packGreedy(df, "doc_id", "text", budget, nBuckets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got === refPack(docs, budget, nBuckets))
    // spot-check the cases the test exists for
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(0L)._3 === byId(3L)._3, "exact budget fit must share a pack")
    assert(byId(6L)._3 === byId(3L)._3 + 1, "next doc after exact fit overflows")
    assert(byId(-2L)._2 === 1L && byId(-2L)._3 === 1, "pmod bucket, own pack")
    assert(byId(1L)._3 === 2, "doc after an oversized opener starts pack 2")
    assert(byId(2L)._3 === 2 && byId(5L)._3 === 3,
      "mid-stream oversized doc isolates itself")
  }

  test("packGreedy is a single-shuffle plan") {
    val df = corpusDocs
    val plan = Packing.packGreedy(df, "doc_id", "text", 256, 8)
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges === 1, plan)
  }

  test("concatBlocks: hand-computed block layout, boundary docs, partial tail") {
    // single bucket (nBuckets=1), blockSize=10; doc token stream in id order:
    //   id 1: 4  → tokens [0,4)   → block 0
    //   id 2: 6  → tokens [4,10)  → block 0 (exactly fills it)
    //   id 3: 25 → tokens [10,35) → blocks 1,2,3 (crosses two boundaries)
    //   id 4: 3  → tokens [35,38) → block 3 (partial tail: 8 tokens)
    val df = Seq((1L, 4), (2L, 6), (3L, 25), (4L, 3)).toDF("doc_id", "n")
      .select($"doc_id", nTokenText($"n").as("text"))
    val got = Packing.concatBlocks(df, "doc_id", "text", 10, 1)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (0, 2L, 10L, 1L, 2L), // docs 1+2 fill block 0 exactly
      (1, 1L, 10L, 3L, 3L), // doc 3 alone spans blocks 1-3
      (2, 1L, 10L, 3L, 3L),
      (3, 2L, 8L, 3L, 4L))) // tail block: rest of doc 3 + doc 4, 8 tokens
    // occupancy conservation: block tokens sum to the corpus token count
    assert(got.map(_._3).sum === 38L)
  }

  test("bpePairCounts: hand-computed pair table, punct split, 1-char words") {
    // pre-tokens: "low low lower" -> low×2, lower×1; "l!" -> l (1 char,
    // no pairs) + ! (1 char); CJK chars are single non-alnum tokens
    val df = Seq((1L, "low low lower"), (2L, "l!")).toDF("doc_id", "text")
    val got = operators.TextAnalysis.bpePairCounts(df, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // pairs: low -> lo,ow (×2); lower -> lo,ow,we,er (×1)
    assert(got === Seq(
      ("lo", 3L, 1), ("ow", 3L, 2), ("er", 1L, 3), ("we", 1L, 4)))
  }

  test("continuationCounts: distinct predecessors vs raw occurrences") {
    // bigrams: (a b) (b a) (a b) | (c b) -> b follows {a, c} = 2 distinct,
    // 3 occurrences; a follows {b} = 1/1
    val df = Seq((1L, "a b a b"), (2L, "c b")).toDF("doc_id", "text")
    val got = operators.TextAnalysis.continuationCounts(df, "text", 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got === Seq(("b", 2L, 3L, 1), ("a", 1L, 1L, 2)))
  }

  test("hashSplit: exhaustive partition, rerun-stable, growth-stable") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val small = spark.range(200).toDF("id")
    val a = operators.Sampling.hashSplit(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every row lands in exactly one split; proportions are sane
    assert(a.size === 200)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val nTrain = a.values.count(_ == "train")
    assert(nTrain > 120 && nTrain < 200, s"train share off: $nTrain/200")
    // leak-proofness: growing the corpus never moves an existing row
    val big = spark.range(400).toDF("id")
    val b = operators.Sampling.hashSplit(big, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, s) => assert(b(id) === s, s"row $id moved") }
    // degenerate fractions rejected
    intercept[IllegalArgumentException] {
      operators.Sampling.hashSplit(small, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("mixturePlan: alpha=1 keeps natural shares, alpha=0 flattens, cap binds") {
    // strata: a=800 docs, b=150, c=50
    val df = spark.range(1000).toDF("id").select($"id",
      when($"id" < 800, "a").when($"id" < 950, "b").otherwise("c").as("src"))
    def plan(alpha: Double, target: Long) =
      operators.Sampling.mixturePlan(df, "src", alpha, target)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap

    // alpha=1: temp shares == raw shares; fractions proportional to target
    val p1 = plan(1.0, 100)
    assert(p1("a") === ((800L, 0.8, 0.8, 0.1)))
    assert(p1("b") === ((150L, 0.15, 0.15, 0.1)))
    assert(p1("c") === ((50L, 0.05, 0.05, 0.1)))

    // alpha=0: every stratum weighted equally (share^0 = 1 -> 1/3 each);
    // the tail stratum upsamples hardest
    val p0 = plan(0.0, 99)
    assert(p0.values.forall(v => math.abs(v._3 - 1.0 / 3) < 1e-5))
    assert(p0("c")._4 > p0("a")._4)

    // cap: a target larger than a stratum can supply clamps to 1.0
    val pc = plan(0.0, 3000)
    assert(pc("c")._4 === 1.0)
  }
}
