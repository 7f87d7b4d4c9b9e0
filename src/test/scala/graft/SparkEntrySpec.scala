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

  test("no query key is defined by two providers (Map ++ silently keeps " +
      "the last — a collision would shadow an oracled query)") {
    val providers: Seq[(String, Map[String, _])] = Seq(
      "Core" -> queries.CoreQueries.queries,
      "Operator" -> queries.OperatorQueries.queries,
      "TrainingData" -> queries.TrainingDataQueries.queries,
      "Multimodal" -> queries.MultimodalQueries.queries,
      "Extended" -> queries.ExtendedQueries.queries,
      "Round4" -> queries.Round4Queries.queries,
      "Round5" -> queries.Round5Queries.queries,
      "Round6" -> queries.Round6Queries.queries,
      "Round7" -> queries.Round7Queries.queries,
      "Round8" -> queries.Round8Queries.queries,
      "Round9" -> queries.Round9Queries.queries,
      "Round10" -> queries.Round10Queries.queries,
      "Round11" -> queries.Round11Queries.queries,
      "Round12" -> queries.Round12Queries.queries,
      "Round13" -> queries.Round13Queries.queries,
      "Round14" -> queries.Round14Queries.queries,
      "Round15" -> queries.Round15Queries.queries,
      "Round16" -> queries.Round16Queries.queries,
      "Round17" -> queries.Round17Queries.queries,
      "Round18" -> queries.Round18Queries.queries,
      "Round19" -> queries.Round19Queries.queries,
      "Round20" -> queries.Round20Queries.queries,
      "Round21" -> queries.Round21Queries.queries,
      "Round22" -> queries.Round22Queries.queries,
      "Round23" -> queries.Round23Queries.queries,
      "Round24" -> queries.Round24Queries.queries,
      "Round25" -> queries.Round25Queries.queries,
      "Round26" -> queries.Round26Queries.queries)
    val dupes = providers
      .flatMap { case (p, m) => m.keys.map(_ -> p) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ps) => s"$k in ${ps.map(_._2).mkString("+")}" }
    assert(dupes.isEmpty, s"duplicate query keys: $dupes")
    assert(providers.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("every gate query is documented in COVERAGE.md (the judge-facing " +
      "inventory can't silently drift from the code)") {
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(cov.contains)
    assert(missing.isEmpty, s"undocumented queries: ${missing.toSeq.sorted}")
  }

  test("q_agg_pricing matches hand-computed group count") {
    val df = SparkEntry.queries("q_agg_pricing")(spark, sfDir)
    val li = Tables.load(spark, sfDir, "lineitem")
    val nGroups = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert(df.count() == nGroups)
  }
}
