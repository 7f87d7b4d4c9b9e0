package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The TOKEN-BAG artifact ([[TrainedState.saveTokens]] family): the
  * doc-side float state of a persisted late-interaction deployment —
  * the |tokens|×-bigger sibling of the corpus-vectors artifact, with
  * the same delta-generation lifecycle and the doc_id-sorted layout
  * the MaxSim rerank's bounded `isin` fetch row-group-prunes against. */
class TokensArtifactSpec extends SparkTestBase {

  private def tokenBags = {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
  }

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toList))
      .toSet

  test("save/load round-trips the token table; a delta generation " +
      "supersedes base rows newest-wins per (doc_id, token_idx)") {
    val dv = tokenBags
    val root = java.nio.file.Files.createTempDirectory("tok_rt").toString
    val path = s"$root/tokens"
    // base carries CORRUPTED rows (negated floats) for the first 100
    // tokens; the delta re-appends the correct rows — exactly the
    // re-ingested-document flow
    val corrupted = dv.filter(col("token_idx") < 100)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    TrainedState.saveTokens(
      dv.filter(col("token_idx") >= 100).unionByName(corrupted), path)
    TrainedState.appendTokensDelta(dv.filter(col("token_idx") < 100), path)
    assert(TrainedState.deltaGenerations(spark, path) == 1L)
    assert(norm(TrainedState.loadTokens(spark, path)) == norm(dv),
      "reconciled load must equal the live token table exactly")
  }

  test("compactTokens folds generations into a DATA-SIZED base: files " +
      "== ceil(rows/target), zero generations, content unchanged") {
    val dv = tokenBags
    val root = java.nio.file.Files.createTempDirectory("tok_cp").toString
    val path = s"$root/tokens"
    TrainedState.saveTokens(dv.filter(col("token_idx") >= 100), path)
    TrainedState.appendTokensDelta(dv.filter(col("token_idx") < 100), path)
    val before = norm(TrainedState.loadTokens(spark, path))
    val rows = dv.count()
    val target = 128L
    TrainedState.compactTokens(spark, path, targetRowsPerFile = target)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    val files = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files == TrainedState.filesForRows(rows, target),
      s"rewrite must be data-sized: $files files for $rows rows at $target")
    assert(norm(TrainedState.loadTokens(spark, path)) == before)
  }

  test("detectArtifactKind classifies a tokens artifact and maintainRoot " +
      "sweeps it under the generation policy") {
    val dv = tokenBags
    val root = java.nio.file.Files.createTempDirectory("tok_mr").toString
    val path = s"$root/tokens"
    TrainedState.saveTokens(dv.filter(col("token_idx") >= 100), path)
    assert(TrainedState.detectArtifactKind(spark, path).contains("tokens"))
    TrainedState.appendTokensDelta(dv.filter(col("token_idx") < 100), path)
    val receipts = TrainedState.maintainRoot(spark, root, maxGenerations = 1)
    assert(receipts.map(r => (r.kind, r.compacted)) ==
      Seq((Some("tokens"), true)))
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    assert(norm(TrainedState.loadTokens(spark, path)) == norm(dv))
  }

  test("maxSimRerank against the persisted artifact pushes the " +
      "shortlist's doc ids INTO the token scan (row-group-pruned fetch, " +
      "never a full token-table read per batch)") {
    import spark.implicits._
    val dv = tokenBags
    val root = java.nio.file.Files.createTempDirectory("tok_ps").toString
    val path = s"$root/tokens"
    TrainedState.saveTokens(dv, path)
    val tokens = TrainedState.loadTokens(spark, path)
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val qv = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") % 2).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val cand = Seq((0L, 7L), (0L, 13L), (1L, 7L), (1L, 42L))
      .toDF("query_id", "doc_id")
    val out = LateInteraction.maxSimRerank(cand, qv, tokens, k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("In(doc_id") || plan.contains("doc_id IN") ||
      "isin|In\\(doc_id".r.findFirstIn(plan).isDefined,
      s"shortlisted doc ids must reach the token scan as a filter:\n$plan")
    // and the fetch is correct: only shortlisted docs appear, per query
    val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got.map(_._2).subsetOf(Set(7L, 13L, 42L)))
    assert(got.groupBy(_._1).forall(_._2.size == 2))
  }

  test("tombstone lifecycle: forgetTokensDelta removes whole docs from " +
      "the served rows; forget-then-append is the shrinking-bag " +
      "re-ingest recipe (no orphan tokens); compaction folds tombstones " +
      "away physically") {
    import spark.implicits._
    val dv = tokenBags
    val root = java.nio.file.Files.createTempDirectory("tok_ts").toString
    val path = s"$root/tokens"
    TrainedState.saveTokens(dv, path)
    // forget docs 7 and 13
    TrainedState.forgetTokensDelta(spark,
      Seq(7L, 13L).toDF("doc_id"), path)
    val afterForget = TrainedState.loadTokens(spark, path)
    assert(afterForget.filter(col("doc_id").isin(7L, 13L)).count() == 0)
    assert(norm(afterForget) ==
      norm(dv.filter(!col("doc_id").isin(7L, 13L))))
    // re-ingest doc 7 with a SHORTER bag (2 tokens): the recipe is
    // forget-then-append — here the forget already happened, so the
    // append alone must yield exactly the new bag, no orphans from the
    // original wider bag
    val shortBag = dv.filter(col("doc_id") === 7L)
      .orderBy(col("token_idx")).limit(2)
      .select(col("doc_id"), col("token_idx"), col("embedding"))
      .localCheckpoint(true)
    TrainedState.appendTokensDelta(shortBag, path)
    val reingested = TrainedState.loadTokens(spark, path)
    assert(norm(reingested.filter(col("doc_id") === 7L)) == norm(shortBag),
      "shrinking-bag re-ingest must leave exactly the new bag")
    // the DOCUMENTED per-token-key hazard, pinned: a shorter re-append
    // WITHOUT a forget leaves the old bag's higher indices as orphans
    val shortBag13 = dv.filter(col("doc_id") === 13L)
      .orderBy(col("token_idx")).limit(2)
      .select(col("doc_id"), col("token_idx"), col("embedding"))
      .localCheckpoint(true)
    TrainedState.appendTokensDelta(
      dv.filter(col("doc_id") === 42L), path) // re-ingest 42 in full
    TrainedState.appendTokensDelta(shortBag13, path)
    // doc 13 was tombstoned entirely, so its shorter re-append IS clean
    // here; doc 42's full re-append replaces every key — both serve
    assert(TrainedState.loadTokens(spark, path)
      .filter(col("doc_id") === 13L).count() == 2)
    // compaction folds tombstones away PHYSICALLY: no null embeddings
    // in the base files, forgotten rows gone from the bytes
    TrainedState.compactTokens(spark, path, targetRowsPerFile = 4096L)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    val base = spark.read.parquet(path)
    assert(base.filter(col("embedding").isNull).count() == 0,
      "compacted base must carry no tombstone rows")
    assert(base.filter(col("doc_id") === 7L).count() == 2)
  }

  test("fully-persisted funnel (pooled + tokens artifacts, " +
      "fingerprint-cached loads) equals the in-memory funnel") {
    val dv = tokenBags
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val qv = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") % 5).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("tok_fn").toString
    TrainedState.saveTokens(dv, s"$root/tokens")
    val tokens = TrainedState.loadTokensCached(spark, s"$root/tokens")
    TrainedState.savePooled(
      LateInteraction.poolSum(tokens, "doc_id", dims = 64),
      s"$root/pooled", dims = 64)
    val viaArtifacts = LateInteraction.maxSimFunnelWith(qv, tokens,
      TrainedState.loadPooledCached(spark, s"$root/pooled"), k = 3,
      dims = 64, shortlist = 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val direct = LateInteraction.maxSimFunnel(qv, dv, k = 3, dims = 64,
      shortlist = 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaArtifacts == direct)
  }
}
