package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.harvest.Source.TransientFetchException
import graft.harvest.Validate

/** Live SPARQL-protocol HTTP layer (EP2/EP3): the real replacement for the
  * reference's SPARQLWrapper calls (/root/reference/harvest.py:102-113,
  * 116-158) on plain JDK `java.net.http` + the Jackson shipped with Spark —
  * zero extra dependencies.
  *
  * Query text reproduces harvest.py:69-88 (page query) and :92-101 (count
  * query): same prefixes, same OPTIONAL fan-out semantics. One deliberate
  * divergence: the reference orders by ?concept alone, which is NOT a
  * total order once OPTIONALs fan out multi-valued properties — ties may
  * be returned in different orders by independent LIMIT/OFFSET queries,
  * and unlike the reference's sequential loop this source fetches pages
  * concurrently. Ordering by all four variables makes pagination
  * deterministic. Transport errors map onto the engine's
  * retry taxonomy: HTTP 502 (the only code the reference retries,
  * harvest.py:150) and connection-refused (an endpoint process briefly
  * down mid-restart) → [[TransientFetchException]]; DNS failures,
  * timeouts, other HTTP statuses, and other I/O errors fail fast — a
  * hung or misconfigured endpoint must not cost retries × timeout per
  * page on every executor.
  *
  * The sandbox has no egress, so tests exercise this against a local
  * in-process HTTP server (SparqlHttpSpec) — the client itself is the
  * production code path.
  */
object SparqlHttp {

  /** harvest.py:69-88 — page query with OPTIONAL properties and stable
    * ordering; LIMIT/OFFSET appended for batching. */
  def pageQuery(collectionUri: String, limit: Option[Long] = None,
                offset: Option[Long] = None): String = {
    Validate.validateCollectionUri(collectionUri)
    val base = s"""
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX dc: <http://purl.org/dc/terms/>
    PREFIX owl: <http://www.w3.org/2002/07/owl#>

    SELECT DISTINCT ?concept ?prefLabel ?altLabel ?definition
    WHERE {
        <$collectionUri> skos:member ?concept .
        OPTIONAL { ?concept skos:prefLabel ?prefLabel }
        OPTIONAL { ?concept skos:altLabel ?altLabel }
        OPTIONAL { ?concept skos:definition ?definition }
    }
    ORDER BY ?concept ?prefLabel ?altLabel ?definition
    """
    base + limit.map(l => s"\nLIMIT $l").getOrElse("") +
      offset.map(o => s"\nOFFSET $o").getOrElse("")
  }

  /** harvest.py:92-101 — COUNT(DISTINCT ?concept) for partition planning. */
  def countQuery(collectionUri: String): String = {
    Validate.validateCollectionUri(collectionUri)
    s"""
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    SELECT (COUNT(DISTINCT ?concept) AS ?count)
    WHERE {
        <$collectionUri> skos:member ?concept .
    }
    """
  }
}

/** One client per endpoint; serializable so partition readers can carry it
  * to executors (the underlying HttpClient is rebuilt per JVM). */
class SparqlHttpClient(val endpoint: String, timeoutMs: Long = 30000) extends Serializable {

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  /** SPARQL protocol: POST application/x-www-form-urlencoded `query=`,
    * Accept sparql-results+json (what SPARQLWrapper's JSON mode asks for). */
  def execute(query: String): JsonNode = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Accept", "application/sparql-results+json")
      .POST(HttpRequest.BodyPublishers.ofString(
        "query=" + URLEncoder.encode(query, StandardCharsets.UTF_8)))
      .build()
    val resp =
      try http.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.net.http.HttpTimeoutException =>
          throw new RuntimeException(
            s"SPARQL request timed out after ${timeoutMs}ms (not retried): $endpoint", e)
        case e: java.net.ConnectException =>
          val dns = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).exists {
            case _: java.nio.channels.UnresolvedAddressException => true
            case _: java.net.UnknownHostException => true
            case _ => false
          }
          if (dns) throw new RuntimeException(
            s"SPARQL endpoint hostname does not resolve (not retried): $endpoint", e)
          // refused: the endpoint process is briefly down/restarting — the
          // one transport failure that is plausibly transient
          else throw new TransientFetchException(
            s"SPARQL endpoint connection refused: ${e.getMessage}", e)
        case e: java.nio.channels.UnresolvedAddressException =>
          // some JDKs surface DNS failure unwrapped (not inside
          // ConnectException) — same fail-fast classification either way
          throw new RuntimeException(
            s"SPARQL endpoint hostname does not resolve (not retried): $endpoint", e)
        case e: java.io.IOException =>
          // a reset mid-request is the in-flight half of the same
          // "endpoint briefly down/restarting" case as connection-refused
          // — retryable; every other I/O failure fails fast
          val msg = Option(e.getMessage).getOrElse("")
          if (msg.toLowerCase.contains("connection reset"))
            throw new TransientFetchException(
              s"SPARQL endpoint reset the connection: $msg", e)
          else throw new RuntimeException(
            s"SPARQL transport failure (not retried): $msg", e)
      }
    resp.statusCode() match {
      case 200 => mapper.readTree(resp.body())
      case 502 => // the one code the reference retries (harvest.py:150)
        throw new TransientFetchException(s"502 Proxy Error from $endpoint")
      case s => throw new RuntimeException(s"SPARQL query failed: HTTP $s from $endpoint")
    }
  }

  /** EP3: one page of bindings as (concept, prefLabel, altLabel,
    * definition) with nulls for unbound OPTIONALs — the exact row shape of
    * harvest.py:74-82. */
  def fetchBindings(collectionUri: String, limit: Option[Long] = None,
                    offset: Option[Long] = None): Seq[Array[String]] = {
    val root = execute(SparqlHttp.pageQuery(collectionUri, limit, offset))
    val bindings = root.path("results").path("bindings")
    (0 until bindings.size()).map { i =>
      val b = bindings.get(i)
      def v(name: String): String = {
        val n = b.path(name).path("value")
        if (n.isMissingNode || n.isNull) null else n.asText()
      }
      Array(v("concept"), v("prefLabel"), v("altLabel"), v("definition"))
    }
  }

  /** EP2: collection member count (drives page-partition planning). */
  def memberCount(collectionUri: String): Long = {
    val root = execute(SparqlHttp.countQuery(collectionUri))
    val bindings = root.path("results").path("bindings")
    if (bindings.size() == 0 || bindings.get(0).path("count").isMissingNode)
      throw new RuntimeException("Could not retrieve member count from SPARQL endpoint.")
    bindings.get(0).path("count").path("value").asText().toLong
  }
}
