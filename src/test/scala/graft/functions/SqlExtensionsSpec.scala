package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path: the
  * extensions object must inject working SQL functions into a session's
  * FunctionRegistry (exercised here via the same `registerFunctions` hook
  * session bootstrap calls, since the suite-wide session already exists). */
class SqlExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects rolling_hash and uri_valid into the registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)

    val r = spark.sql(
      """SELECT rolling_hash('abcdef') AS h,
                uri_valid('https://vocab.nerc.ac.uk/collection/P01/current/') AS ok,
                uri_valid('ftp://not-a-web-uri') AS bad""").head()
    assert(r.getLong(0) !== 0L)
    assert(r.getBoolean(1))
    assert(!r.getBoolean(2))
  }

  test("GraftExtensions injects dot_q (SQL surface of the ANN kernel)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    val r = spark.sql(
      "SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) === 32L)
  }

  test("GraftExtensions injects the per-row sketch kernels (simhash64, minhash_sig)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    val r = spark.sql(
      """SELECT simhash64('alpha beta gamma') AS sh,
               simhash64('gamma beta alpha') AS sh2,
               minhash_sig('a b c d e') AS sig,
               minhash_sig('a b') AS short""").head()
    assert(r.getLong(0) === r.getLong(1)) // order-invariant sketch
    assert(r.getSeq[Long](2).length === 64)
    assert(r.isNullAt(3)) // < k tokens -> null
    val t = spark.sql(
      "SELECT top_bigram_count('x y x y x') AS t, top_bigram_count('solo') AS n").head()
    assert(t.getInt(0) === 2 && t.isNullAt(1))
  }

  test("dot_q coerces int-literal arrays (parity with the HOF formulation)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    assert(spark.sql("SELECT dot_q(array(1, 2), array(3, 4)) AS d").head().getLong(0) === 11L)
  }

  test("wrong-arity SQL calls raise analysis errors, not builder crashes") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    intercept[AnalysisException] { spark.sql("SELECT dot_q(array(1L))").collect() }
    intercept[AnalysisException] { spark.sql("SELECT minhash_sig('x', 5)").collect() }
  }

  test("injected rolling_hash rejects non-string input at analysis time") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    intercept[AnalysisException] { spark.sql("SELECT rolling_hash(123)").collect() }
  }
}
