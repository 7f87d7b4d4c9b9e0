package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Runtime skew handling: beyond the manual salting in operators.SkewJoin,
  * AQE re-plans a sort-merge join at runtime and SPLITS oversized
  * partitions (OptimizeSkewedJoin). This proves the engine's config path
  * actually triggers it — the complement to SkewJoinSpec's static salting:
  * at 100 TB you salt the joins you know are skewed and let AQE catch the
  * ones you don't.
  */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 50k of 60k rows; a wide INCOMPRESSIBLE payload (hash
      // hex) keeps the hot partition over the skew threshold after the
      // shuffle codec runs
      val big = spark.range(0, 60000).select(
        when(col("id") < 50000, lit(0L)).otherwise(pmod(col("id"), lit(97)))
          .as("k"),
        sha2(col("id").cast("string"), 256).as("payload"))
      val small = spark.range(0, 97).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // no aggregation on the join key downstream: OptimizeSkewedJoin only
      // splits when nothing above the join requires its hash partitioning.
      // The global agg reads payload so column pruning can't shrink the
      // shuffled hot partition below the skew threshold.
      // sum(length(payload)) — unlike count, it can't be constant-folded
      // away, so the wide column really crosses the shuffle
      val agg = big.join(small, Seq("k"))
        .agg(sum(length(col("payload"))).as("n"))
      // collect() (NOT head(): head clones a limited QueryExecution, so the
      // plan inspected below would never have executed)
      assert(agg.collect().head.getLong(0) == 60000L * 64)
      val adaptive = agg.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan")
      // the skew-split SMJ lives INSIDE a materialized query stage; the
      // outer plan's toString doesn't recurse into stage plans, so walk them
      def allPlans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p.toString +: p.collect {
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allPlans(s.plan)
        }.flatten
      val plans = allPlans(adaptive.get.executedPlan)
      assert(plans.exists(_.contains("skew=true")),
        s"expected a skew-split join in:\n${plans.mkString("\n----\n")}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
