package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical-plan pins for the TPC-H battery — the plan properties the
  * hash gate cannot see (a correct-but-recomputed or unpushed plan
  * hashes identically). */
class TpchPlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame) = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def scansOf(df: DataFrame, table: String): Seq[FileSourceScanExec] =
    finalPlan(df).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(s"$table.parquet")) => s
    }

  test("q21 scans lineitem exactly once (the window rewrite's whole point)") {
    // the first formulation referenced the per-supplier aggregate twice
    // and Spark recomputed the entire fact subtree — two lineitem scans
    assert(scansOf(TpchQueries.q21SoleLateSupplier(spark, sfDir), "lineitem").size === 1)
  }

  test("q2 picks the min-cost supplier in one lineitem pass (no join-back)") {
    assert(scansOf(TpchQueries.q2MinCostSupplier(spark, sfDir), "lineitem").size === 1)
  }

  test("q19 pushes the disjunctive predicate into both parquet scans") {
    val df = TpchQueries.q19Disjunctive(spark, sfDir)
    val li = scansOf(df, "lineitem")
    val pt = scansOf(df, "part")
    assert(li.size === 1 && pt.size === 1)
    // quantity ranges reach the lineitem scan, brand/size reach part
    assert(li.head.metadata("PushedFilters").contains("Or("))
    assert(pt.head.metadata("PushedFilters").contains("Or("))
  }

  test("q10 aggregates the fact stream before the customer attribute join") {
    // the revenue aggregate's grouping key is o_custkey alone — if the
    // customer join ran first, the aggregate would carry c_name etc.
    val plan = finalPlan(TpchQueries.q10ReturnedItems(spark, sfDir))
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    val revAgg = aggs.filter(_.groupingExpressions.exists(_.toString.contains("o_custkey")))
    assert(revAgg.nonEmpty)
    assert(revAgg.forall(!_.groupingExpressions.exists(_.toString.contains("c_name"))))
  }
}
