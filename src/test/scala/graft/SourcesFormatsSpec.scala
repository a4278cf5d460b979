package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** B1: source/sink formats beyond parquet — CSV and JSON round-trips with
  * explicit schemas (no inference, per the determinism contract). */
class SourcesFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip with explicit schema and header") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val orders = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.count() === orders.count())
    assert(back.agg(sum($"o_orderkey")).head.getLong(0) ===
      orders.agg(sum($"o_orderkey")).head.getLong(0))
  }

  test("orc round-trip with predicate pushdown into the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_shipdate")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter($"l_quantity" < 10)
    assert(back.count() === li.filter($"l_quantity" < 10).count())
    assert(back.count() > 0)
    // the filter must reach the ORC scan, not run as a post-scan filter only
    val scan = back.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan(l_quantity"))
  }

  test("json lines round-trip with explicit schema, nulls preserved") {
    val dir = Files.createTempDirectory("graft_json").toString
    val df = Seq(("https://v.example/1", Some("p"), None: Option[String]),
        ("https://v.example/2", None, Some("d")))
      .toDF("concept", "prefLabel", "definition")
    df.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("concept STRING, prefLabel STRING, definition STRING").json(dir)
    assert(back.count() === 2)
    assert(back.filter($"prefLabel".isNull).count() === 1)
    // harvest Source reads .json paths with the bindings schema
    val asBindings = harvest.Source.readBindings(spark, dir + "/part-00000*.json")
    assert(asBindings.columns.toSeq === Seq("concept", "prefLabel", "altLabel", "definition"))
  }
}
