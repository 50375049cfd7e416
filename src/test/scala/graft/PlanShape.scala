package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Canonical physical-plan SHAPE of a query — the operator tree reduced
  * to what matters for scale regression detection and nothing that
  * churns run-to-run:
  *
  *  - node class names (join STRATEGY is the class: BroadcastHashJoin vs
  *    SortMergeJoin vs ShuffledHashJoin vs BroadcastNestedLoopJoin);
  *  - join TYPE (Inner/LeftOuter/LeftSemi/...) on join nodes;
  *  - exchange partitioning kind (hash/range/single/round-robin) on
  *    shuffle exchanges;
  *
  * but NOT expressions, literals, file paths, sizes, or statistics — so
  * the fingerprint is stable across fixture regeneration and timing, and
  * changes exactly when Catalyst picks a different operator tree (the
  * regressions that today only surface as bench deltas: a dimension join
  * falling off broadcast, an extra exchange appearing, a window sort
  * materializing).
  *
  * Taken from `queryExecution.sparkPlan` — the physical plan BEFORE the
  * execution preparations (no WholeStageCodegen wrappers, no AQE
  * re-planning), which is the deterministic output of Catalyst's
  * strategies for a fixed fixture.
  */
object PlanShape {

  private def strip(p: SparkPlan): String =
    p.getClass.getSimpleName.stripSuffix("Exec")

  private def label(p: SparkPlan): String = p match {
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
      s"Exchange[${e.outputPartitioning.getClass.getSimpleName}]"
    case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      "BroadcastExchange"
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      s"${strip(j)}[${j.joinType}]"
    case _ => strip(p)
  }

  def canonical(df: DataFrame): String = {
    def walk(p: SparkPlan): String =
      if (p.children.isEmpty) label(p)
      else s"${label(p)}(${p.children.map(walk).mkString(",")})"
    walk(df.queryExecution.sparkPlan)
  }
}
