package graft.backend.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.GraftError

/** Thrown for non-2xx responses; carries the status for adapter-side
  * conflict/not-found mapping (the reference's `RestClientException`
  * contract, `rest_client.py:254-295`). */
final case class RestError(status: Int, body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(300)}") {
  def isNotFound: Boolean = status == 404
  def isConflict: Boolean = status == 409
}

/** Minimal pooled JSON/HTTP client with the reference's retry envelope
  * (`java/.../rest/RestClient.java:73-315`): connect 10 s / read 30 s
  * timeouts, ≤3 retries with exponential backoff `delay·2^(n-1)` from 1 s,
  * and 4xx never retried (`RestClient.java:273-275`). Driver-side only —
  * catalog RPCs never ship to executors (SURVEY.md §3).
  *
  * Config keys (via [[RestClient.fromConfig]]): `connect_timeout_ms`
  * (10000), `read_timeout_ms` (30000), `max_retries` (3),
  * `retry_base_delay_ms` (1000), `token`. Backend-specific defaults may
  * override these: Unity passes `read_timeout_ms=300000`, matching the
  * reference's documented 5-minute Unity default (`docs/src/unity.md:19`)
  * against the 30 s shared default here.
  */
class RestClient(
    baseUri: String,
    headers: Map[String, String] = Map.empty,
    connectTimeoutMs: Long = 10000,
    readTimeoutMs: Long = 30000,
    maxRetries: Int = 3,
    baseDelayMs: Long = 1000) {

  private val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .build()

  def get(path: String, params: Map[String, String] = Map.empty): JValue =
    execute("GET", path, params, None)

  def post(path: String, body: JValue): JValue =
    execute("POST", path, Map.empty, Some(body))

  def delete(path: String, params: Map[String, String] = Map.empty): JValue =
    execute("DELETE", path, params, None)

  def patch(path: String, body: JValue): JValue =
    execute("PATCH", path, Map.empty, Some(body))

  def head(path: String): Boolean =
    try { execute("HEAD", path, Map.empty, None); true }
    catch { case e: RestError if e.isNotFound => false }

  private def url(path: String, params: Map[String, String]): URI = {
    val q = if (params.isEmpty) ""
      else params.map { case (k, v) =>
        s"${URLEncoder.encode(k, StandardCharsets.UTF_8)}=${URLEncoder.encode(v, StandardCharsets.UTF_8)}"
      }.mkString("?", "&", "")
    URI.create(baseUri.stripSuffix("/") + path + q)
  }

  private def execute(method: String, path: String, params: Map[String, String],
      body: Option[JValue]): JValue = {
    var attempt = 0
    var lastErr: Exception = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
      attempt += 1
      try {
        val b = HttpRequest.newBuilder(url(path, params))
          .timeout(Duration.ofMillis(readTimeoutMs))
          .header("Content-Type", "application/json")
        headers.foreach { case (k, v) => b.header(k, v) }
        val req = body match {
          case Some(j) => b.method(method,
            HttpRequest.BodyPublishers.ofString(JsonMethods.compact(JsonMethods.render(j))))
          case None => b.method(method, HttpRequest.BodyPublishers.noBody())
        }
        val resp = http.send(req.build(), HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) {
          val text = resp.body()
          return if (text == null || text.isEmpty) JNothing
                 else JsonMethods.parse(text)
        }
        val err = RestError(code, Option(resp.body()).getOrElse(""))
        // 4xx are client errors: fail fast, never retry
        if (code >= 400 && code < 500) throw err
        lastErr = err
      } catch {
        case e: RestError if e.status >= 400 && e.status < 500 => throw e
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
    }
    throw GraftError.ServiceUnavailable(
      s"$method $path failed after $maxRetries retries", lastErr)
  }
}

object RestClient {
  /** Build from backend config props (uri/endpoint + auth token + timeouts). */
  def fromConfig(props: Map[String, String], uriKeys: Seq[String]): RestClient = {
    val uri = uriKeys.flatMap(props.get).headOption.getOrElse(
      throw GraftError.InvalidInput(s"missing REST endpoint (one of $uriKeys)"))
    val auth = props.get("token").map(t => Map("Authorization" -> s"Bearer $t"))
      .getOrElse(Map.empty[String, String])
    new RestClient(uri, auth,
      props.get("connect_timeout_ms").map(_.toLong).getOrElse(10000),
      props.get("read_timeout_ms").map(_.toLong).getOrElse(30000),
      props.get("max_retries").map(_.toInt).getOrElse(3),
      props.get("retry_base_delay_ms").map(_.toLong).getOrElse(1000))
  }
}
