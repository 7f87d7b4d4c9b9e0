package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)
    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    joined.count() // materialize

    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString)

    // same join on unbucketed sources DOES shuffle (sanity of the check)
    val plain = li.join(o, "l_orderkey")
    plain.count()
    assert(!Bucketing.isShuffleFree(plain) ||
      plain.queryExecution.executedPlan.toString.contains("Broadcast"))

    // and values agree
    assert(joined.count() == plain.count())
  }

  test("bucketed groupBy aggregates without exchange") {
    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    agg.count()
    assert(Bucketing.isShuffleFree(agg),
      agg.queryExecution.executedPlan.toString)
  }
}
