package graft.sources.bangumi

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Live-wire [[BangumiClient]] over `java.net.http` — the production
  * transport behind the same trait the DSv2 connector already uses
  * (reference `/root/reference/bangumi_data_ingestion.py:66-100`: one pooled
  * session with `Retry(total=3, backoff_factor=1.0,
  * status_forcelist=[429,500,502,503,504])` and 30 s connect/read timeouts).
  *
  * Topology at scale: instances are constructed per `PartitionReader` (one
  * per (subject_type, collection_type) input partition), so each executor
  * task owns one keep-alive HTTP/2 connection pool — the JVM analogue of the
  * reference's `HTTPAdapter(pool_connections=10)`. The client itself is
  * `@transient lazy`: the object that ships in the serialized partition is
  * just the endpoint config.
  *
  * Retry envelope: connection errors and the retryable status set both back
  * off as `backoffMillis * 2^attempt` (the reference's `backoff_factor`
  * semantics); any other non-2xx status is a permanent error and throws
  * immediately — the reader's circuit breaker (R3) counts those.
  */
class HttpBangumiClient(
    baseUrl: String,
    username: String,
    maxRetries: Int = 3,
    backoffMillis: Long = 1000L,
    timeoutSeconds: Long = 30L) extends BangumiClient {

  import HttpBangumiClient._

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  private def collectionsUri(st: Int, ct: Int, offset: Long, limit: Int): URI = {
    val user = URLEncoder.encode(username, StandardCharsets.UTF_8)
    URI.create(s"$baseUrl/v0/users/$user/collections" +
      s"?subject_type=$st&type=$ct&limit=$limit&offset=$offset")
  }

  /** GET with the reference's retry envelope; returns the response body. */
  private def get(uri: URI): String = {
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("User-Agent", UserAgent)
      .header("Accept", "application/json")
      .GET()
      .build()
    var attempt = 0
    while (true) {
      val failure: Option[String] =
        try {
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 == 2) return resp.body()
          else if (RetryableStatuses(resp.statusCode()))
            Some(s"status ${resp.statusCode()}")
          else throw new RuntimeException(
            s"bangumi GET $uri failed permanently: HTTP ${resp.statusCode()}")
        } catch {
          case e: java.io.IOException => Some(e.toString)
        }
      attempt += 1
      if (attempt >= maxRetries)
        throw new RuntimeException(
          s"bangumi GET $uri failed after $maxRetries attempts: ${failure.get}")
      Thread.sleep(backoffMillis * (1L << (attempt - 1)))
    }
    throw new IllegalStateException("unreachable")
  }

  override def fetchTotal(st: Int, ct: Int): Long = {
    val body = get(collectionsUri(st, ct, offset = 0, limit = 1))
    val root = mapper.readTree(body)
    if (root.hasNonNull("total")) root.get("total").asLong(0L) else 0L
  }

  override def fetchPage(st: Int, ct: Int, offset: Long, limit: Int): Seq[String] = {
    val body = get(collectionsUri(st, ct, offset, limit))
    val root = mapper.readTree(body)
    val data = root.get("data")
    if (data == null || !data.isArray) Seq.empty
    else data.elements().asScala.map(mapper.writeValueAsString).toVector
  }
}

object HttpBangumiClient {
  /** Statuses worth retrying — the reference's `status_forcelist`. */
  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)
  val UserAgent = "graft-spark/0.1 (analytics engine)"
}
