package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Partition-layout proofs: writing the corpus partitioned by a filter
  * column makes subsequent scans prune at plan time (PartitionFilters), and
  * filters on ordinary columns still push to the reader (PushedFilters).
  */
class PartitionPruningSpec extends SparkTestBase {

  test("partitionBy(lang) write → scan prunes partitions for lang filter") {
    val tmp = java.nio.file.Files.createTempDirectory("docs_part").toString
    Tables.load(spark, sfDir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)

    val pruned = spark.read.parquet(tmp).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(lang"), plan)
    // only the en partition directory is listed
    val allLangs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    assert(allLangs.size > 1)
    assert(pruned.select("doc_id").count() ==
      Tables.load(spark, sfDir, "documents")
        .filter(col("lang") === "en").count())
  }

  test("data filters reach the parquet reader as PushedFilters") {
    val df = Tables.load(spark, sfDir, "documents")
      .filter(col("n_chars") > 300).select("doc_id", "n_chars")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(n_chars"),
      plan)
    // projection pruned to the two columns
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), plan)
  }
}
