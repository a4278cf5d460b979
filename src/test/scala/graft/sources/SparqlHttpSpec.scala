package graft.sources

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.harvest.Source

/** The live SPARQL HTTP path (EP2/EP3 + A1/A2) against an in-process stub
  * endpoint: pagination via DSv2 partitions, count-driven planning, JSON
  * decoding with OPTIONAL nulls, and 502 retry semantics. */
class SparqlHttpSpec extends SparkSpec {

  private val Collection = "https://vocab.example.org/collection/C1"
  private val Total = 2500

  /** Serve the reference-shaped corpus: concept i has prefLabel unless
    * i%7==0, altLabel unless i%3==0, definition unless i%5==0 —
    * SPARQL-results+JSON, honoring LIMIT/OFFSET from the query text. */
  private def bindingJson(i: Int): String = {
    def field(name: String, v: String) =
      s""""$name": {"type": "literal", "value": "$v"}"""
    val parts = Seq(
      Some(s""""concept": {"type": "uri", "value": "https://vocab.example.org/term/$i"}"""),
      if (i % 7 != 0) Some(field("prefLabel", s"label $i")) else None,
      if (i % 3 != 0) Some(field("altLabel", s"alt $i")) else None,
      if (i % 5 != 0) Some(field("definition", s"def $i")) else None).flatten
    parts.mkString("{", ", ", "}")
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/sparql-results+json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Start a stub endpoint; `failFirst` makes every distinct page fail with
    * 502 on its first attempt (exercising the in-reader retry); `fanout`
    * gives concept 10 that many extra altLabel rows, so the page query's
    * row total exceeds the DISTINCT-concept count (the H5 OPTIONAL
    * fan-out) — by more than a page when fanout > pageSize. */
  private def withServer(failFirst: Boolean = false, fanout: Int = 0)
                        (body: String => Unit): Unit = {
    val corpus: IndexedSeq[String] = (0 until Total).flatMap { i =>
      val extra = if (i == 10) (0 until fanout).map(k =>
        s"""{"concept": {"type": "uri", "value": "https://vocab.example.org/term/10"},
           | "altLabel": {"type": "literal", "value": "alt 10 bis $k"}}""".stripMargin)
      else Seq.empty
      bindingJson(i) +: extra
    }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    server.createContext("/sparql", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val query = URLDecoder.decode(form.stripPrefix("query="), StandardCharsets.UTF_8)
      if (failFirst) {
        val n = attempts.computeIfAbsent(query, _ => new AtomicInteger()).incrementAndGet()
        if (n == 1) { respond(ex, 502, "Proxy Error"); return }
      }
      if (query.contains("COUNT(DISTINCT")) {
        respond(ex, 200,
          s"""{"head": {"vars": ["count"]}, "results": {"bindings": [
             |  {"count": {"type": "literal", "value": "$Total"}}]}}""".stripMargin)
      } else {
        val limit = "LIMIT (\\d+)".r.findFirstMatchIn(query).map(_.group(1).toInt).getOrElse(corpus.length)
        val offset = "OFFSET (\\d+)".r.findFirstMatchIn(query).map(_.group(1).toInt).getOrElse(0)
        val rows = corpus.slice(offset, math.min(offset + limit, corpus.length))
        respond(ex, 200,
          s"""{"head": {"vars": ["concept","prefLabel","altLabel","definition"]},
             | "results": {"bindings": [${rows.mkString(", ")}]}}""".stripMargin)
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
    finally server.stop(0)
  }

  test("memberCount runs the reference's COUNT query (EP2)") {
    withServer() { url =>
      assert(new SparqlHttpClient(url).memberCount(Collection) == Total)
    }
  }

  test("fetchBindings decodes one page with OPTIONAL nulls (EP3)") {
    withServer() { url =>
      val rows = new SparqlHttpClient(url).fetchBindings(Collection, Some(10), Some(20))
      assert(rows.length == 10)
      assert(rows.head(0) == "https://vocab.example.org/term/20")
      assert(rows.head(2) == "alt 20") // 20 % 3 != 0
      assert(rows(1)(1) == null) // 21 % 7 = 0 → prefLabel unbound
      assert(rows(1)(2) == null) // 21 % 3 = 0 → altLabel unbound
      assert(rows(1)(3) == "def 21") // 21 % 5 != 0 → definition bound
      assert(rows(5)(3) == null) // 25 % 5 = 0 → definition unbound
    }
  }

  test("DSv2 read plans pages from the endpoint count and fetches in parallel (A1/EP2/EP3)") {
    withServer() { url =>
      val df = spark.read.format("graft-bindings")
        .option("endpoint", url)
        .option("collection", Collection)
        .option("pageSize", 500)
        .load()
      assert(df.rdd.getNumPartitions == 6) // ceil(2500 / 500) + 1 fan-out tail page
      assert(df.count() == Total) // tail page past the data comes back empty
      val row22 = df.filter(org.apache.spark.sql.functions.col("concept")
        .endsWith("/term/22")).head()
      assert(row22.getString(1) == "label 22")
      assert(row22.getString(3) == "def 22") // 22: all three OPTIONALs bound
      // null fan-in: every multiple of 7 lacks a prefLabel
      assert(df.filter("prefLabel IS NULL").count() == (0 until Total).count(_ % 7 == 0))
    }
  }

  test("OPTIONAL fan-out rows beyond the concept count land in the tail page (H5)") {
    withServer(fanout = 1) { url =>
      val df = spark.read.format("graft-bindings")
        .option("endpoint", url)
        .option("collection", Collection)
        .option("pageSize", 500)
        .load()
      // member count is 2500 DISTINCT concepts but the page query returns
      // 2501 rows; the tail page (beyond the counted offsets) drains it —
      // the reference's own page loop would drop that row
      assert(df.count() == Total + 1)
      assert(df.filter(org.apache.spark.sql.functions.col("altLabel") === "alt 10 bis 0").count() == 1)
    }
  }

  test("tail partition drains fan-out larger than the planned tail page") {
    withServer(fanout = 600) { url =>
      val df = spark.read.format("graft-bindings")
        .option("endpoint", url)
        .option("collection", Collection)
        .option("pageSize", 500)
        .load()
      // planned offsets cover 2500 + one 500-row tail page = 3000 rows,
      // but the corpus has 3100: the drain-tail reader keeps paging until
      // the endpoint returns a short page, so nothing is dropped
      assert(df.count() == Total + 600)
      assert(df.filter(org.apache.spark.sql.functions.col("altLabel")
        .startsWith("alt 10 bis")).count() == 600)
    }
  }

  test("502 responses retry with backoff and then succeed (A2)") {
    withServer(failFirst = true) { url =>
      val df = spark.read.format("graft-bindings")
        .option("endpoint", url)
        .option("collection", Collection)
        .option("pageSize", 1000)
        .load()
      assert(df.count() == Total) // every page 502s once, retry recovers
    }
  }

  test("non-502 HTTP errors fail fast, unreachable endpoints are transient (A2)") {
    withServer() { url =>
      val client = new SparqlHttpClient(url.stripSuffix("/sparql") + "/nope")
      val e = intercept[RuntimeException](client.memberCount(Collection))
      assert(e.getMessage.contains("404"))
    }
    // connection refused → transient (lets withRetry ride out restarts)
    val dead = new SparqlHttpClient("http://127.0.0.1:1/sparql", timeoutMs = 500)
    intercept[Source.TransientFetchException](dead.memberCount(Collection))
    // DNS failure → fail fast (a misconfigured endpoint must not burn
    // retries × timeout on every executor)
    val noHost = new SparqlHttpClient("http://no-such-host.invalid/sparql", timeoutMs = 2000)
    val dnsErr = intercept[RuntimeException](noHost.memberCount(Collection))
    assert(!dnsErr.isInstanceOf[Source.TransientFetchException])
    assert(dnsErr.getMessage.contains("not retried"))
  }
}
