package graft.harvest

import graft.SparkSpec
import org.apache.spark.sql.Row
import java.util.concurrent.ConcurrentHashMap

/** Flaky in-memory page server: fails the FIRST attempt for every odd page
  * with a transient error (the reference's HTTP-502 case, harvest.py:150).
  * JVM-static so executor threads in local mode share it. */
object FlakyPages {
  val attempts = new ConcurrentHashMap[Long, Integer]()
  val total = 25
  def fetch(offset: Long, limit: Int): Seq[Row] = {
    val n = attempts.merge(offset, 1, (a, b) => a + b)
    if ((offset / limit) % 2 == 1 && n == 1)
      throw new Source.TransientFetchException(s"502 at offset $offset")
    (offset until math.min(offset + limit, total.toLong)).map(i =>
      Row(s"https://v.example/t/$i", s"label $i", null, null))
  }
}

class SourceSpec extends SparkSpec {

  test("paginated source fetches all pages in parallel with retry (A1/A2)") {
    FlakyPages.attempts.clear()
    val df = Source.paginated(spark, FlakyPages.total, 10, Schemas.bindings,
      FlakyPages.fetch, maxRetries = 3, baseDelayMs = 1)
    assert(df.count() === 25)
    assert(df.rdd.getNumPartitions >= 1)
    assert(FlakyPages.attempts.get(10L) === 2) // odd page retried exactly once
  }

  test("retry gives up after maxRetries (A2)") {
    var calls = 0
    val e = intercept[Source.TransientFetchException] {
      Source.withRetry(maxRetries = 2, baseDelayMs = 1) {
        calls += 1; throw new Source.TransientFetchException("always 502")
      }
    }
    assert(calls === 3) // initial + 2 retries
    assert(e.getMessage.contains("502"))
  }

  test("validateCollectionUri: fail-fast on bad scheme, warn on foreign host (A18)") {
    intercept[IllegalArgumentException] { Validate.validateCollectionUri("ftp://x") }
    intercept[IllegalArgumentException] { Validate.validateCollectionUri("") }
    assert(Validate.validateCollectionUri("http://vocab.nerc.ac.uk/collection/P01/current/").isEmpty)
    assert(Validate.validateCollectionUri("https://other.example/x").nonEmpty)
  }

  test("validateCollectionUri: rejects SPARQL-IRI breakout characters (A18)") {
    // each would escape the <...> literal in the generated page query
    Seq(
      "http://vocab.nerc.ac.uk/x> . ?s ?p ?o . <http://e",
      "http://vocab.nerc.ac.uk/x<y",
      "http://vocab.nerc.ac.uk/a b",
      "http://vocab.nerc.ac.uk/a\tb",
      "http://vocab.nerc.ac.uk/a\nb",
      "http://vocab.nerc.ac.uk/a\"b",
      "http://vocab.nerc.ac.uk/a\\b",
      "http://vocab.nerc.ac.uk/a\u0007b",
      "http://vocab.nerc.ac.uk/a{b}",
      "http://vocab.nerc.ac.uk/a|b",
      "http://vocab.nerc.ac.uk/a^b"
    ).foreach { uri =>
      val e = intercept[IllegalArgumentException] { Validate.validateCollectionUri(uri) }
      assert(e.getMessage.contains("IRI"), s"for URI: $uri")
    }
    // percent-encoded forms of the same characters are fine
    assert(Validate.validateCollectionUri(
      "http://vocab.nerc.ac.uk/a%20b%3Ec").isEmpty)
    // IRI-legal sub-delims (apostrophe) must NOT be rejected
    assert(Validate.validateCollectionUri(
      "http://vocab.nerc.ac.uk/collection/d'amico/").isEmpty)
  }
}
