package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP GET used by the ingest sources: Bearer auth + per-request
  * timeout, mirroring the reference's `requests.get(..., headers=...,
  * timeout=10)` (main.py:65-66). Non-2xx responses raise — callers
  * decide between retry (paginated source, main.py:113-116) and
  * empty-relation fallback (CSV sources, main.py:71-73).
  */
class HttpFetch(timeoutSeconds: Int = 10, bearerToken: Option[String] = None)
    extends Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      // requests.get follows redirects; HttpClient's default is NEVER
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  def get(url: String): Array[Byte] = {
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET()
    bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  def getString(url: String): String =
    new String(get(url), java.nio.charset.StandardCharsets.UTF_8)
}
