package graft.sources

import graft.SparkSpec

class BindingsPageSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 source plans one input partition per page (A1)") {
    val df = spark.read.format("graft-bindings")
      .option("totalCount", 2500).option("pageSize", 1000).load()
    assert(df.rdd.getNumPartitions === 3) // ceil(2500/1000)
    assert(df.count() === 2500)
    assert(df.schema.fieldNames.toSeq === Seq("concept", "prefLabel", "altLabel", "definition"))
  }

  test("DSv2 source rows have OPTIONAL-style nulls and feed the harvest pipeline") {
    val df = spark.read.format("graft-bindings").option("totalCount", 100).load()
    assert(df.filter($"prefLabel".isNull).count() === 15) // every 7th of 100
    val eav = graft.harvest.Transform.meltAll(
      graft.harvest.Transform.filterValidBindings(df))
    assert(eav.count() > 100) // pref + alt + def rows
  }

  test("tail partition is truncated to the remaining rows") {
    val df = spark.read.format("graft-bindings")
      .option("totalCount", 1001).option("pageSize", 500).load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 1001)
  }

  test("column pruning reaches the DSv2 scan: projected reads materialize only requested columns") {
    // prune to a NON-leading column: a wrong index mapping cannot hide
    // behind position 0
    val df = spark.read.format("graft-bindings")
      .option("totalCount", 50).option("pageSize", 20).load()
      .select("definition")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.output.map(_.name) === Seq("definition"))
    assert(df.count() === 50)
    // pruned values must match the UNPRUNED read's same column
    val full = spark.read.format("graft-bindings")
      .option("totalCount", 50).option("pageSize", 20).load()
    def vals(rows: Array[org.apache.spark.sql.Row], i: Int) =
      rows.map(r => Option(r.getString(i))).sortBy(_.getOrElse("")).toSeq
    assert(vals(df.collect(), 0) === vals(full.collect(), 3))
  }
}
