package graft.sources.bangumi

/** Transport abstraction for the Bangumi collections API
  * (`/root/reference/bangumi_data_ingestion.py:105-258`). The DSv2 connector
  * only sees this interface; production would implement it over HTTP with
  * the same retry/throttle envelope, tests and offline runs use
  * [[FixtureBangumiClient]].
  */
trait BangumiClient extends Serializable {

  /** S1: count probe — the `limit=1` call that reads only `total`. */
  def fetchTotal(subjectType: Int, collectionType: Int): Long

  /** S2: one page of collection items as raw JSON lines.
    * @return items at [offset, offset+limit) — empty when exhausted. */
  def fetchPage(subjectType: Int, collectionType: Int, offset: Long,
      limit: Int): Seq[String]
}

/** Deterministic throttle (R2 — the reference sleeps 0.5 s/page and
  * 0.3 s/probe). FIXED-DELAY pacing: the clock restarts at the actual
  * wake time, so consecutive `acquire` returns are always ≥ the interval
  * apart even when a sleep oversleeps — pacing from the ideal timeline
  * (`last + interval`) would let an overshoot compress the next gap,
  * bursting two requests closer than the contract allows. */
final class RateLimiter(minIntervalMillis: Long) extends Serializable {
  @volatile private var last = 0L
  def acquire(): Unit = synchronized {
    val wait = last + minIntervalMillis - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    last = System.currentTimeMillis()
  }
}

/** R1: bounded retry with exponential backoff (3 tries, factor 1.0 — the
  * reference's `Retry(total=3, backoff_factor=1.0)`). */
object Retry {
  def withBackoff[T](tries: Int = 3, backoffMillis: Long = 1000L)(f: => T): T = {
    var attempt = 0
    var delay = backoffMillis
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= tries) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Serves the bundled fixture corpus, partitioned by category, with real
  * pagination semantics (so the connector's paging loop is exercised).
  * `failEveryNthPage` > 0 injects transient faults to exercise R1/R3.
  */
class FixtureBangumiClient(pageFailEvery: Int = 0) extends BangumiClient {

  @transient private lazy val byCategory: Map[(Int, Int), IndexedSeq[String]] = {
    val in = getClass.getResourceAsStream("/bangumi/items.jsonl")
    require(in != null, "bangumi fixture resource missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    lines.groupBy { l =>
      // cheap top-level field sniff; the fixture writer controls the format
      val st = """"subject_type":\s*(\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt).getOrElse(0)
      val ct = """"type":\s*(\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt).getOrElse(0)
      (st, ct)
    }
  }

  @transient private var calls = 0

  override def fetchTotal(st: Int, ct: Int): Long =
    byCategory.getOrElse((st, ct), Vector.empty).size.toLong

  override def fetchPage(st: Int, ct: Int, offset: Long, limit: Int): Seq[String] = {
    calls += 1
    if (pageFailEvery > 0 && calls % pageFailEvery == 0)
      throw new RuntimeException("injected transient page failure")
    byCategory.getOrElse((st, ct), Vector.empty)
      .slice(offset.toInt, offset.toInt + limit)
  }
}
