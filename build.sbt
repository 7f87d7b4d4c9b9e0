ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "greenbuttonenginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// per-test durations in the report — the input for balancing the
// parallel test groups below
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Pass the forked JVM's stdout through verbatim: Bench/Verify emit one
// machine-readable JSON line that must not get sbt's "[info] " prefix.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs all executor threads in this one JVM — size the heap for
  // 32 concurrent tasks' shuffle/agg buffers (the image has 128 GiB; an
  // undersized heap turns the bench into a GC benchmark)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// ---- Parallel test groups -------------------------------------------------
// `sbt test` must finish inside the round driver's capture window (the r15
// VERIFY artifact flagged tests_ok unconfirmed because the 753-test suite
// outran the window at ~31 min). Suites are independent (each JVM builds its
// own SparkSession; every artifact path is either createTempDirectory-unique
// or applicationId-suffixed), so they split into N forked JVMs that run
// concurrently. The measured one-JVM suite time is ~27 min with
// StreamingAnnSpec at ~4.6 min — greedy longest-first packing by the
// measured weights keeps the bins even, and the wall becomes
// ~max(bin) ≈ 7-8 min. The three suites that execute DECLARED GATE QUERIES
// (fixed /tmp artifact paths keyed on the sf dir, no session suffix) are
// pinned into one bin so they never race each other across JVMs.
// Knobs: SPARK_GRAFT_TEST_GROUPS (default 4; 1 restores the single-JVM
// run), SPARK_GRAFT_TEST_MEM (per-group heap, default 10g).
val testGroupCount = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt
// measured seconds from a full -oD run (2026-08-18); unlisted suites get a
// nominal weight — exact staleness only skews balance, never correctness
val suiteWeights: Map[String, Double] = Map(
  "StreamingAnnSpec" -> 273, "LateInteractionSpec" -> 99,
  "HnswSpec" -> 68, "TrainedStateDeltaSpec" -> 61,
  "StreamingAsOfSpec" -> 55, "StreamingRetrievalSpec" -> 53,
  "SemanticDedupSpec" -> 51, "GraphAnnSpec" -> 51,
  "StreamingJoinSpec" -> 46, "StreamingAnonymizeSpec" -> 46,
  "AdcLutSpec" -> 38, "TokensArtifactSpec" -> 37, "DeltaMergeSpec" -> 37,
  "CorpusPipelineSpec" -> 32, "TwoLevelAssignSpec" -> 29,
  "IvfPqSpec" -> 29, "EspiXmlSpec" -> 28, "GoldenSpec" -> 28,
  "StreamingMediaSpec" -> 24, "StreamingDedupSpec" -> 24,
  "BudgetSelectSpec" -> 24, "PlanShapeSpec" -> 22, "StreamingSpec" -> 21,
  "RetrievalSpec" -> 20, "AsOfNativeSpec" -> 18,
  "IvfIncrementalSpec" -> 16, "FooterCountSpec" -> 16,
  "FilteredAnnSpec" -> 16, "ConsolidateAnnSpec" -> 16, "KMeansSpec" -> 16)
// gate-query executors share fixed artifact paths — same bin, sequential
val pinnedTogether = Set("SparkEntrySpec", "PlanShapeSpec", "BatchPrepSpec")
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val n = math.max(1, testGroupCount)
  val baseOpts = (Test / javaOptions).value.toVector ++
    Seq(s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "10g")}")
  def short(name: String): String = name.split('.').last
  def weight(name: String): Double =
    suiteWeights.getOrElse(short(name), 5.0)
  if (n <= 1)
    Seq(Tests.Group("all", tests,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(
        (Test / javaOptions).value.toVector))))
  else {
    val bins = Vector.fill(n)(
      scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
    val loads = Array.fill(n)(0.0)
    val (pinned, free) = tests.partition(t => pinnedTogether(short(t.name)))
    if (pinned.nonEmpty) {
      bins(0) ++= pinned
      loads(0) += pinned.map(t => weight(t.name)).sum
    }
    free.sortBy(t => (-weight(t.name), t.name)).foreach { t =>
      val i = loads.indexOf(loads.min)
      bins(i) += t
      loads(i) += weight(t.name)
    }
    bins.zipWithIndex.filter(_._1.nonEmpty).map { case (b, i) =>
      Tests.Group(s"group$i", b.toSeq,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(baseOpts)))
    }
  }
}
// allow the forked groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, math.max(1, testGroupCount)))
