package graft.gb

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkTestBase

/** Plan-shape assertions for the Green Button denormalize pipeline — the
  * scale properties SCALE.md documents, pinned as tests. Inspected on the
  * EXECUTED adaptive plan: the permissive-skip anti-join statically plans
  * as a sort-merge join and AQE converts it to broadcast at runtime once
  * the violation set's true (tiny) size is known — the static initial plan
  * is not the plan that runs.
  */
class GbPlanShapeSpec extends SparkTestBase {

  private def executedPlans(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    def walk(p: SparkPlan): Seq[String] =
      p.toString +: p.collect {
        case s: QueryStageExec => walk(s.plan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      }.flatten
    df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    }.getOrElse(Seq(df.queryExecution.executedPlan.toString))
  }

  test("denormalize runs on broadcast joins only: no sort-merge, no cartesian") {
    val ts = GreenButton.timeseries(spark,
      "/root/reference/test_files/*.xml", Permissive)
    val plans = executedPlans(ts)
    assert(plans.exists(_.contains("BroadcastHashJoin")),
      "expected broadcast joins for entry metadata")
    assert(!plans.exists(_.contains("SortMergeJoin")),
      s"a join ran as sort-merge:\n${plans.mkString("\n----\n")}")
    assert(!plans.exists(p => p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin")),
      "non-equi join sneaked into denormalize")
  }
}
