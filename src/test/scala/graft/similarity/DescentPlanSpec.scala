package graft.similarity

import graft.SparkSpec
import graft.plans.PlanAudit
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r12 plan pin: the one-exchange-per-round descent claim.
  *
  * [[Similarity.hnswUpperBeam]]/[[Similarity.hnswBaseDescend]] rely on a
  * specific optimizer behavior: after `repartition(query_id)`, BOTH the
  * `dropDuplicates("query_id", "vec_id")` aggregation (HashPartitioning
  * on query_id satisfies ClusteredDistribution over a superset of keys)
  * AND the per-query ranking window reuse that partitioning, and the
  * broadcast scoring joins preserve it — so a round plans exactly ONE
  * shuffle exchange. The r11 shape paid two-to-three (a distinct keyed
  * by both columns, then the window re-shuffled by query_id). If a Spark
  * upgrade stops satisfying the distribution this way, this spec fires
  * before the bench does.
  */
class DescentPlanSpec extends SparkSpec {
  import spark.implicits._

  test("repartition(query) -> dropDuplicates(query, vec) -> broadcast score " +
    "join -> per-query window plans exactly ONE shuffle exchange (r12)") {
    val pool = (1L to 200L).flatMap(q => (1L to 30L).map(v => (q % 10, v)))
      .toDF("query_id", "vec_id")
    val e = (1L to 40L).map(v => (v, v.toDouble / 40.0)).toDF("vec_id", "norm")
    val qs = (0L to 9L).map(q => (q, q.toDouble)).toDF("query_id", "qnorm")
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    val round = pool
      .repartition($"query_id")
      .dropDuplicates("query_id", "vec_id")
      .join(broadcast(e), Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .select($"query_id", $"vec_id", ($"norm" * $"qnorm").as("cosine"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"query_id", $"vec_id")
    round.collect() // executed plan (post-AQE) is what the audit walks
    val shuffles = PlanAudit.allNodes(round.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size === 1,
      s"descent round planned ${shuffles.size} shuffles, expected 1:\n" +
        round.queryExecution.executedPlan)
  }
}
