package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, DynamicPruningExpression}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Structural physical-plan assertions for the no-vacuous-gate queries
  * (b07_keyset_page, b03_dpp_join, b03_runtime_filter). These used to
  * substring-match `executedPlan.toString` — correct today, but a plan-
  * string format change (Spark upgrade, DSv1→DSv2 parquet flip) would
  * fail a CORRECT plan. Here the walk visits the actual plan nodes,
  * unwrapping AQE containers (whose `children` is Nil, so a plain
  * TreeNode.collect would see nothing), and reads the scan's own
  * pushdown surface for BOTH parquet paths: DSv1 `FileSourceScanExec`
  * (its `metadata("PushedFilters")` is the only public form) and DSv2
  * `BatchScanExec` (the scan description carries the pushed filters). */
object PlanAudit {

  /** Every node of the executed plan, descending through AQE wrappers
    * and reused/planned subqueries as well as ordinary children. */
  def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val below = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other =>
        other.children ++ other.subqueries
    }
    plan +: below.flatMap(allNodes)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] =
    allNodes(df.queryExecution.executedPlan)

  /** One pushed-filter description per scan node, spelling-tolerant:
    * DSv1 emits `LessThan(c_acctbal,…)` source-Filter names, DSv2
    * emits `c_acctbal < …` — callers match case-insensitively on the
    * normalized (lowercase, space-free) text. */
  def pushedFilterDescs(df: DataFrame): Seq[String] = nodes(df).collect {
    case f: FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "")
    case b: BatchScanExec => b.scan.description()
  }

  /** True iff some parquet scan's pushed filters mention `column` under
    * a strict less-than, in either the DSv1 or DSv2 spelling. */
  def hasPushedLessThan(df: DataFrame, column: String): Boolean =
    pushedFilterDescs(df).map(_.toLowerCase.replace(" ", "")).exists(d =>
      d.contains(s"lessthan($column") || d.contains(s"$column<"))

  /** True iff some scan carries a runtime dynamic-partition-pruning
    * predicate (DSv1 partitionFilters / DSv2 runtimeFilters). */
  def hasDynamicPruning(df: DataFrame): Boolean = nodes(df).exists {
    case f: FileSourceScanExec =>
      f.partitionFilters.exists(_.exists(_.isInstanceOf[DynamicPruningExpression]))
    case b: BatchScanExec =>
      b.runtimeFilters.exists(_.exists(_.isInstanceOf[DynamicPruningExpression]))
    case _ => false
  }

  /** True iff any node evaluates a bloom-filter membership probe — the
    * InjectRuntimeFilter rewrite's physical footprint. */
  def hasBloomProbe(df: DataFrame): Boolean = nodes(df).exists(
    _.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))

  /** True iff the plan contains a per-row nested-loop join shape
    * (BroadcastNestedLoopJoin / CartesianProduct) — what a CORRELATED
    * lateral degrades to when decorrelation fails. Gate queries that
    * promise the decorrelated ranked-join shape assert the negation. */
  def hasNestedLoop(df: DataFrame): Boolean = nodes(df).exists {
    case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
    case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
    case _ => false
  }

  /** All shuffle exchanges of the executed (post-AQE) plan — the nodes a
    * partitioning-strategy pin counts (DescentPlanSpec,
    * BucketedLayoutSpec). Only meaningful AFTER an action has run. */
  def shuffleExchanges(df: DataFrame): Seq[SparkPlan] = nodes(df).collect {
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
  }

  /** Parquet scans that read a BUCKETED layout (the catalog bucket spec
    * recognized AND exploited — Spark clears `bucketedScan` when it
    * decides not to use the layout). */
  def bucketedScans(df: DataFrame): Seq[FileSourceScanExec] = nodes(df).collect {
    case f: FileSourceScanExec if f.bucketedScan => f
  }

  /** True iff NO shuffle exchange sits above any bucketed scan — the
    * bucket-local join form: the bucketed side's HashPartitioning comes
    * straight from the layout, so only the probe side exchanges (r13,
    * VERDICT r12 #1). */
  def noExchangeAboveBucketedScan(df: DataFrame): Boolean =
    shuffleExchanges(df).forall(ex => allNodes(ex).collect {
      case f: FileSourceScanExec if f.bucketedScan => f
    }.isEmpty)

  /** True iff AQE's OptimizeSkewedJoin engaged on an EXECUTED plan: a
    * sort-merge/shuffled-hash join flagged isSkewJoin, or a shuffle
    * read whose partition specs split one reducer partition into
    * partial ranges (the skew split's physical footprint). Only
    * meaningful AFTER an action has run the DataFrame — AQE decides
    * from runtime shuffle statistics, so there is nothing to assert at
    * plan time (unlike [[hasBloomProbe]]). */
  def hasSkewJoin(df: DataFrame): Boolean = nodes(df).exists {
    case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
      smj.isSkewJoin
    case shj: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
      shj.isSkewJoin
    case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
      r.partitionSpecs.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
    case _ => false
  }
}
