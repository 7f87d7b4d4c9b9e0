package graft

class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("q_agg_pricing matches hand-computed group count") {
    val df = SparkEntry.queries("q_agg_pricing")(spark, sfDir)
    val li = Tables.load(spark, sfDir, "lineitem")
    val nGroups = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert(df.count() == nGroups)
  }
}
