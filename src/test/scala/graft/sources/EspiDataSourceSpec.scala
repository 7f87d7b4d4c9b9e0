package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EspiDataSourceSpec extends SparkTestBase {

  val corpus = "/root/reference/test_files/*.xml"

  lazy val df = spark.read.format("espi").load(corpus)

  test("reads one row per Atom entry with the union schema") {
    assert(df.schema.fieldNames.toSeq == EspiDataSource.schema.fieldNames.toSeq)
    assert(df.count() > 0)
    // entry types partition the rows
    val types = df.groupBy("entry_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.contains("IntervalBlock"))
    assert(types.contains("ReadingType"))
    assert(types.contains("LocalTimeParameters"))
  }

  test("payload structs attach only to their entry type") {
    assert(df.filter(col("entry_type") =!= "IntervalBlock" &&
      col("readings").isNotNull).count() == 0)
    assert(df.filter(col("entry_type") === "ReadingType" &&
      col("reading_type").isNull).count() == 0)
    assert(df.filter(col("entry_type") === "LocalTimeParameters" &&
      col("local_time_params").isNull).count() == 0)
  }

  test("column pruning: envelope-only projection works") {
    val slim = df.select("title", "href")
    assert(slim.count() == df.count())
    val plan = slim.queryExecution.executedPlan.toString
    assert(!plan.contains("readings") || plan.contains("title"))
  }

  test("explode(readings) matches the flatMap staging row count") {
    val viaSource = df.select(explode(col("readings"))).count()
    val staging = graft.gb.GreenButton.staging(
      graft.gb.GreenButton.parse(spark, corpus))
    assert(viaSource == staging.readings.count())
  }

  test("SQL over the source") {
    df.createOrReplaceTempView("espi_entries")
    val n = spark.sql(
      """SELECT count(*) FROM espi_entries
        |LATERAL VIEW explode(readings) AS r
        |WHERE r.value > 0""".stripMargin).head.getLong(0)
    assert(n > 0)
  }
}
