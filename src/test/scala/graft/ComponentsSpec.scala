package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected components: both algorithms (min-label propagation and
  * alternating large-star/small-star) must agree with a local union-find
  * reference on deterministic pseudo-random graphs, including the shapes
  * that stress each algorithm differently (long chains stress propagation's
  * round count; dense cliques stress star contraction's edge rewiring).
  */
class ComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Local union-find ground truth: node -> component min. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("src", "dst")
    val truth = unionFind(edges)
    for ((name, algo) <- Seq(
        "labelPropagation" -> Components.labelPropagation(df, "src", "dst"),
        "alternatingStars" -> Components.alternatingStars(df, "src", "dst"))) {
      val got = algo.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth, s"$name vs union-find on ${edges.take(8)}…")
    }
  }

  test("chain graph (worst case for propagation diameter)") {
    run((0L until 40L).map(i => (i, i + 1)))
  }

  test("reversed chain + duplicate and self edges") {
    run((0L until 20L).map(i => (i + 1, i)) ++ Seq((5L, 5L), (3L, 4L), (4L, 3L)))
  }

  test("two cliques and a bridge") {
    val c1 = for (a <- 0L to 5L; b <- 0L to 5L if a < b) yield (a, b)
    val c2 = for (a <- 10L to 15L; b <- 10L to 15L if a < b) yield (a, b)
    run(c1 ++ c2 ++ Seq((5L, 10L)))
  }

  test("many small components") {
    run((0L until 30L by 3L).flatMap(i => Seq((i, i + 1), (i + 1, i + 2))))
  }

  test("deterministic random graphs match union-find") {
    val rnd = new scala.util.Random(7L)
    (0 until 3).foreach { _ =>
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      run(edges)
    }
  }

  test("single edge and empty edge set") {
    run(Seq((7L, 3L)))
    assert(Components.alternatingStars(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").isEmpty)
    assert(Components.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").isEmpty)
  }

  test("dedupClusters tags singletons with their own id") {
    val docs = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val edges = Seq((3L, 9L), (9L, 4L)).toDF("a", "b")
    val got = Components.dedupClusters(docs, "doc_id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 9L -> 3L))
  }

  test("pageRank: cycle is uniform; dangling graph matches scalar replay") {
    // a→b→c→a: perfectly symmetric, every node holds exactly 1/3
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val uni = Components.pageRank(cyc, "s", "d").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(uni === Map("a" -> 0.33333333, "b" -> 0.33333333,
      "c" -> 0.33333333))

    // a→{b,c}, b→c, c dangling — replay the same 12dp-rounded power
    // iteration with scalar doubles as the independent reference
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    val got = Components.pageRank(edges.toDF("s", "d"), "s", "d").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = Map("a" -> 1 / 3.0, "b" -> 1 / 3.0, "c" -> 1 / 3.0)
    for (_ <- 1 to 10) {
      val dang = pr("c")
      def contrib(v: String) = edges.collect {
        case (u, `v`) => pr(u) / out(u)
      }.sum
      pr = pr.keys.map(v =>
        v -> r((1.0 - 0.85) / 3 + 0.85 * (contrib(v) + dang / 3), 12)).toMap
    }
    assert(got.map(t => t._1 -> t._2).toMap === pr.map { case (k, v) => k -> r(v, 8) })
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-6, "rank mass conserves")
    assert(got.sortBy(_._3).map(_._1) === Seq("c", "b", "a"),
      "c receives from both and the dangling refund — it must rank first")
  }

  test("triangleStats: hand graphs — clique, star, canonicalization") {
    def stats(edges: Seq[(String, String)]) = {
      val row = Components.triangleStats(
        edges.toDF("s", "d"), "s", "d").head()
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4))
    }
    // K4: 4 nodes, 6 edges, 4 triangles, 12 wedges, clustering 1.0
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    assert(stats(k4) === ((4L, 6L, 4L, 12L, 1.0)))
    // star: hub with 4 leaves — 6 wedges, zero triangles
    val star = Seq("x1", "x2", "x3", "x4").map(("hub", _))
    assert(stats(star) === ((5L, 4L, 0L, 6L, 0.0)))
    // duplicates, reversed duplicates, self-loops all canonicalize away
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("c", "c"),
      ("b", "c"), ("a", "c"))
    assert(stats(messy) === ((3L, 3L, 1L, 3L, 1.0)))
  }

  test("triangleStats matches a brute-force reference on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (1 to 220).map { _ =>
      (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")
    }
    val canon = edges.collect { case (a, b) if a != b =>
      if (a < b) (a, b) else (b, a)
    }.toSet
    val adj = canon.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ref = canon.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty[String]).count(c => b < c && canon((b, c)))
    }.sum // for each edge (a,b), third vertices c with a<b<c and both edges
    val got = Components.triangleStats(edges.toDF("s", "d"), "s", "d")
      .head()
    assert(got.getLong(2) === ref.toLong,
      s"degree-ordered count must equal the canonical brute force ($ref)")
    assert(got.getLong(1) === canon.size.toLong)
  }
}
