package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The generalized delta-generation machinery of [[TrainedState]] —
  * flat-graph and PQ-codes generations (the [[Hnsw]] delta contract
  * extended to the other corpus-sized artifacts), the empty-slice
  * skip, atomic generation claiming, the `_SUCCESS`-only-directory
  * load fallback, and crash-safe compaction. The layered-index delta
  * parity itself is pinned in HnswSpec. */
class TrainedStateDeltaSpec extends SparkTestBase {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private def normEdges(df: DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def normCodes(df: DataFrame) =
    df.select(col("vec_id"), col("sub"), col("code"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  private def noCompactLeftovers(path: String): Unit = {
    assert(!new java.io.File(s"$path.compact-tmp").exists(),
      "compaction left its temp tree behind")
    assert(!new java.io.File(s"$path.compact-trash").exists(),
      "compaction left its trash tree behind")
  }

  /** Post-compaction pending state: no `gen-N` directory remains. The
    * `_delta/_locks` tree itself may survive — it carries the claim-
    * FLOOR marker the compaction pre-seeds so numbering never restarts
    * (and any unspent in-flight locks). */
  private def noPendingGens(path: String): Unit = {
    val gens = Option(new java.io.File(s"$path/_delta").list())
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.startsWith("gen-"))
    assert(gens.isEmpty, s"pending generations survived compaction: $gens")
  }

  test("flat graph delta generations: delta-appended load == full " +
      "rewrite across two generations with a re-touched source " +
      "(newest wins), and compaction folds back losslessly with no " +
      "sibling leftovers") {
    val all = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val b1 = all.filter(col("vec_id") % 20 === 7).localCheckpoint(true)
    val b2 = all.filter(col("vec_id") % 20 === 13).localCheckpoint(true)
    val pre = all.filter(col("vec_id") % 20 =!= 7 &&
      col("vec_id") % 20 =!= 13).localCheckpoint(true)
    val edges = Similarity.bruteTopK(pre, pre, 4).localCheckpoint(true)
    val path = tmp("graph_delta")
    TrainedState.saveGraphIndex(edges, path)
    // generation 1
    val (un1, ch1) = GraphAnn.insertBySearchParts(edges, pre, b1,
      entryId = 0L, beam = 6, hops = 4, degree = 4)
    val full1 = un1.unionByName(ch1).localCheckpoint(true)
    TrainedState.appendGraphDelta(ch1, path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) ==
      normEdges(full1),
      "delta-appended load must equal the in-memory updated index")
    // generation 2 over the grown corpus — sources touched by BOTH
    // batches must serve generation 2's out-lists
    val corpus1 = pre.unionByName(b1).localCheckpoint(true)
    val (un2, ch2) = GraphAnn.insertBySearchParts(full1, corpus1, b2,
      entryId = 0L, beam = 6, hops = 4, degree = 4)
    val full2 = un2.unionByName(ch2).localCheckpoint(true)
    TrainedState.appendGraphDelta(ch2, path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) ==
      normEdges(full2),
      "second-generation reconcile must serve the newest out-lists")
    assert(TrainedState.deltaGenerations(spark, path) == 2L,
      "two appends must report two claimed generations")
    // full rewrite of the final state agrees
    val rewrite = tmp("graph_rewrite")
    TrainedState.saveGraphIndex(full2, rewrite)
    assert(normEdges(TrainedState.loadGraphIndex(spark, rewrite)) ==
      normEdges(full2))
    // crash-safe compaction: lossless, drops _delta, no siblings
    TrainedState.compactGraphIndex(spark, path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) ==
      normEdges(full2), "compaction changed the served index")
    noPendingGens(path)
    assert(TrainedState.deltaGenerations(spark, path) == 0L,
      "compaction must reset the generation count")
    noCompactLeftovers(path)
  }

  test("pq codes delta generations: new vectors append, a re-encoded " +
      "vector's replacement code set wins newest, compaction lossless") {
    import spark.implicits._
    def codesOf(rows: Seq[(Long, Int, Int)]) =
      rows.toDF("vec_id", "sub", "code")
    val base = codesOf(for (v <- 0L until 10L; s <- 0 to 1)
      yield (v, s, (v + s).toInt))
    val path = tmp("pq_delta")
    TrainedState.savePqCodes(base, path)
    // gen 1: three new vectors + vector 3 re-encoded (both subs replace)
    val d1 = codesOf(Seq((10L, 0, 7), (10L, 1, 8), (11L, 0, 1),
      (11L, 1, 2), (12L, 0, 9), (12L, 1, 9), (3L, 0, 100), (3L, 1, 101)))
    TrainedState.appendPqCodesDelta(d1, path)
    val want1 = normCodes(base.filter(col("vec_id") =!= 3))
      .union(normCodes(d1))
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) == want1,
      "gen-1 reconcile: base minus re-encoded vec 3, plus the delta")
    // gen 2 re-touches vec 3 AND vec 10 — newest wins over BOTH the
    // base and generation 1
    val d2 = codesOf(Seq((3L, 0, 200), (3L, 1, 201), (10L, 0, 42),
      (10L, 1, 43)))
    TrainedState.appendPqCodesDelta(d2, path)
    val want2 = want1.filterNot(t => t._1 == 3L || t._1 == 10L)
      .union(normCodes(d2))
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) == want2,
      "gen-2 reconcile must serve the newest code sets")
    TrainedState.compactPqCodes(spark, path)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) == want2,
      "compaction changed the served codes")
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("ivf rebalance delta: the reassigned slice appends as a " +
      "generation, the load serves each moved vector's NEW cell row " +
      "(newest wins over the cell-partitioned base), probes through " +
      "the loaded index equal the in-memory rebalanced index, and " +
      "compaction folds back losslessly") {
    val e = emb.filter(col("vec_id") < 300).localCheckpoint(true)
    // 3 deliberately skewed centroids: cell 0 catches most rows and
    // exceeds maxCellSize, forcing a real reassignment slice
    val cents = e.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid")).localCheckpoint(true)
    val index = Similarity.ivfAssign(e, cents).localCheckpoint(true)
    val path = tmp("ivf_delta")
    TrainedState.saveIvfIndex(index, path)
    val maxCell = index.groupBy(col("centroid_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val cellCap = (maxCell - 1).toInt.max(1)
    val (newCents, untouched, changed) = Similarity.ivfRebalanceParts(
      index, cents, maxCellSize = cellCap, subK = 3)
    val fullRows = untouched.unionByName(changed)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!changed.isEmpty, "test needs a non-empty reassigned slice")
    TrainedState.appendIvfDelta(changed, path)
    val loaded = TrainedState.loadIvfIndex(spark, path)
    assert(loaded.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == fullRows,
      "delta-loaded IVF index must serve the rebalanced assignment")
    // probes through the loaded index == through the in-memory one
    val probes = e.filter(col("vec_id") % 50 === 3)
    def topk(idx: DataFrame) = Similarity.ivfTopKFromIndex(probes, idx,
        k = 3, centroidsDf = newCents, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(topk(loaded) == topk(untouched.unionByName(changed)),
      "probe through the delta-loaded index diverged")
    TrainedState.compactIvfIndex(spark, path)
    assert(TrainedState.loadIvfIndex(spark, path)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == fullRows,
      "compaction changed the served assignment")
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("empty delta slices write NOTHING (no _delta directory), and a " +
      "_SUCCESS-only delta directory left by older writers reads as " +
      "no-deltas instead of bricking the load") {
    val e = emb.filter(col("vec_id") < 60).localCheckpoint(true)
    val layered = Hnsw.buildIndex(e, degree = 3, m = 4, maxLevel = 1)
      .localCheckpoint(true)
    val path = tmp("hnsw_empty_delta")
    TrainedState.saveHnswIndex(layered, path)
    val baseNorm = normEdges(
      TrainedState.loadHnswIndex(spark, path).drop("layer"))
    // empty slice: the skip must fire BEFORE any directory is created
    TrainedState.appendHnswDelta(layered.limit(0), path)
    assert(!new java.io.File(s"$path/_delta").exists(),
      "an empty delta must not mint a generation or a directory")
    assert(normEdges(TrainedState.loadHnswIndex(spark, path)
      .drop("layer")) == baseNorm)
    // simulate the pre-fix failure shape: a delta dir holding only
    // _SUCCESS (an aborted/empty write by an older writer)
    val deltaDir = new java.io.File(s"$path/_delta")
    assert(deltaDir.mkdirs())
    assert(new java.io.File(deltaDir, "_SUCCESS").createNewFile())
    assert(normEdges(TrainedState.loadHnswIndex(spark, path)
      .drop("layer")) == baseNorm,
      "a data-less delta directory must fall back to the base")
    // the same empty-dir hardening covers the flat artifacts
    val gpath = tmp("graph_empty_delta")
    val edges = Similarity.bruteTopK(e, e, 3)
    TrainedState.saveGraphIndex(edges, gpath)
    TrainedState.appendGraphDelta(edges.limit(0), gpath)
    assert(!new java.io.File(s"$gpath/_delta").exists())
    assert(normEdges(TrainedState.loadGraphIndex(spark, gpath)) ==
      normEdges(edges))
  }

  test("generation claims are atomic: pre-claimed lock numbers are " +
      "skipped, concurrent appends get distinct generations, and a " +
      "lock-less artifact (lost _locks) seeds from the committed " +
      "generation directories") {
    import spark.implicits._
    val path = tmp("gen_claim")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.5))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    // another writer already claimed generations 1 and 2 (locks exist,
    // rows not yet committed): this append must claim 3, not collide
    val lockDir = new java.io.File(s"$path/_delta/_locks")
    assert(lockDir.mkdirs())
    assert(new java.io.File(lockDir, "gen-1").createNewFile())
    assert(new java.io.File(lockDir, "gen-2").createNewFile())
    val d1 = Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(d1, path)
    def deltaDf = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/_delta")
    val seqs = deltaDf
      .select(col("_seq")).distinct().as[Long].collect().toSet
    assert(seqs == Set(3L),
      s"append must skip pre-claimed generations 1/2, got $seqs")
    // concurrent appends: distinct generations, both slices served
    // per their own keys (disjoint here, so both read back)
    import scala.concurrent.ExecutionContext.Implicits.global
    val dA = Seq((1L, 1, 3L, 0.8)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim").localCheckpoint(true)
    val dB = Seq((2L, 1, 4L, 0.7)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim").localCheckpoint(true)
    val futs = Seq(dA, dB).map(d => scala.concurrent.Future {
      TrainedState.appendGraphDelta(d, path)
    })
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration.Inf)
    val seqs2 = deltaDf
      .select(col("_seq")).distinct().as[Long].collect().toSet
    assert(seqs2.size == 3 && seqs2.contains(3L),
      s"concurrent appends must claim distinct generations, got $seqs2")
    val served = normEdges(TrainedState.loadGraphIndex(spark, path))
    assert(served.contains((1L, 1, 3L, 0.8)) &&
      served.contains((2L, 1, 4L, 0.7)))
    // lost locks: gen directories exist but no _locks dir — the next
    // claim seeds from the committed directory numbers, never reuses
    // one, and the generation count still sees the lock-less gens
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(); ()
    }
    deleteRec(lockDir)
    val d3 = Seq((3L, 1, 5L, 0.6)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(d3, path)
    val seqs3 = deltaDf
      .select(col("_seq")).distinct().as[Long].collect().toSet
    assert(seqs3.size == 4 && seqs3.max > seqs2.max,
      s"legacy seed must continue past the recorded max, got $seqs3")
  }

  test("compactIfNeeded: a no-op below the generation threshold, a " +
      "real lossless compaction at it") {
    import spark.implicits._
    val path = tmp("policy")
    val edges = Seq((0L, 1, 1L, 0.5))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    TrainedState.appendGraphDelta(
      Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    val want = normEdges(TrainedState.loadGraphIndex(spark, path))
    assert(!TrainedState.compactIfNeeded(spark, path, maxGenerations = 2)(
      TrainedState.compactGraphIndex(_, _)))
    assert(new java.io.File(s"$path/_delta").exists(),
      "below the threshold nothing may move")
    assert(TrainedState.compactIfNeeded(spark, path, maxGenerations = 1)(
      TrainedState.compactGraphIndex(_, _)))
    noPendingGens(path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) == want)
  }

  test("a generation committed DURING a compaction survives the swap: " +
      "the late gen-dir and its lock carry over from the parked tree, " +
      "the served index includes both the folded and the late updates, " +
      "and the next claim does not reuse the late number") {
    import spark.implicits._
    val path = tmp("compact_race")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    val d1 = Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(d1, path) // gen-1, folded by compact
    val d2 = Seq((1L, 1, 3L, 0.8)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim").localCheckpoint(true)
    TrainedState.compactTestHook = Some(() =>
      TrainedState.appendGraphDelta(d2, path)) // gen-2, DURING compact
    try TrainedState.compactGraphIndex(spark, path)
    finally TrainedState.compactTestHook = None
    val served = normEdges(TrainedState.loadGraphIndex(spark, path))
    assert(served == Set((0L, 1, 2L, 0.9), (1L, 1, 3L, 0.8)),
      s"late generation lost or folded rows dropped: $served")
    assert(new java.io.File(s"$path/_delta/gen-2").exists(),
      "the late generation's directory must ride over the swap")
    assert(TrainedState.deltaGenerations(spark, path) == 1L)
    // numbering continues past the carried generation
    val d3 = Seq((0L, 2, 3L, 0.3)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(d3, path)
    assert(new java.io.File(s"$path/_delta/gen-3").exists(),
      "the next claim must not reuse the carried generation's number")
  }

  test("pre-r13 flat-append delta layouts fail loudly with the " +
      "migration pointer on append, load, and the generation count — " +
      "never a silent partial read") {
    import spark.implicits._
    val path = tmp("legacy_layout")
    val edges = Seq((0L, 1, 1L, 0.5))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    // emulate an r12 writer: delta files appended DIRECTLY under
    // _delta (no gen-N directory), _seq as a data column
    Seq((0L, 1, 9L, 0.7, 1L))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim", "_seq")
      .write.parquet(s"$path/_delta")
    Seq(
      () => TrainedState.appendGraphDelta(edges, path),
      () => { TrainedState.loadGraphIndex(spark, path).collect(); () },
      () => { TrainedState.deltaGenerations(spark, path); () }
    ).foreach { op =>
      val ex = intercept[IllegalArgumentException](op())
      assert(ex.getMessage.contains("pre-r13") &&
        ex.getMessage.contains("MIGRATION"),
        s"expected the migration pointer, got: ${ex.getMessage}")
    }
  }

  test("randomized lifecycle: a fixed-seed sequence of delta appends " +
      "(new keys, re-touched keys, occasional empties) and mid-stream " +
      "compactions always serves exactly the in-memory newest-wins " +
      "model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val path = tmp("fuzz_delta")
    // model: vec_id -> its current (sub -> code) rows
    val model = scala.collection.mutable.Map.empty[Long, Seq[(Int, Int)]]
    def codesOf(m: Iterable[(Long, Seq[(Int, Int)])]) =
      m.toSeq.flatMap { case (v, subs) =>
        subs.map { case (s, c) => (v, s, c) } }
        .toDF("vec_id", "sub", "code")
    (0L until 8L).foreach(v => model(v) = Seq(0 -> rnd.nextInt(256),
      1 -> rnd.nextInt(256)))
    TrainedState.savePqCodes(codesOf(model), path)
    (1 to 10).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // empty append — must be a no-op
          TrainedState.appendPqCodesDelta(
            codesOf(Nil).limit(0), path)
        case 1 => // compact mid-stream
          TrainedState.compactPqCodes(spark, path)
        case _ => // batch of new + re-touched keys
          val newKeys = (0 until 1 + rnd.nextInt(3))
            .map(_ => 100L * step + rnd.nextInt(4))
          val touched = (0 until rnd.nextInt(3))
            .map(_ => model.keys.toSeq(rnd.nextInt(model.size)))
          val batch = (newKeys ++ touched).distinct.map(v =>
            v -> Seq(0 -> rnd.nextInt(256), 1 -> rnd.nextInt(256)))
          batch.foreach { case (v, subs) => model(v) = subs }
          TrainedState.appendPqCodesDelta(codesOf(batch), path)
      }
      assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
        normCodes(codesOf(model)),
        s"served state diverged from the model at step $step")
    }
    TrainedState.compactPqCodes(spark, path)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
      normCodes(codesOf(model)))
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
  }

  test("compaction is crash-safe: stale tmp/trash leftovers from a " +
      "prior crash are cleared, the rewrite lands aside before any " +
      "original byte moves, and a missing artifact with a parked " +
      "trash tree fails with the recovery pointer") {
    import spark.implicits._
    val path = tmp("compact_crash")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    val d = Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(d, path)
    val want = normEdges(TrainedState.loadGraphIndex(spark, path))
    // stale leftovers from a hypothetical prior crash
    assert(new java.io.File(s"$path.compact-tmp/junk").mkdirs())
    assert(new java.io.File(s"$path.compact-trash/junk").mkdirs())
    TrainedState.compactGraphIndex(spark, path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) == want)
    noCompactLeftovers(path)
    // mid-swap crash state: live path gone, old tree parked at trash —
    // compact must fail loudly and point at the recovery path rather
    // than fabricating or destroying anything
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$path.compact-trash")))
    val ex = intercept[IllegalArgumentException] {
      TrainedState.compactGraphIndex(spark, path)
    }
    assert(ex.getMessage.contains("compact-trash") &&
      ex.getMessage.contains("recover"))
    assert(new java.io.File(s"$path.compact-trash").exists(),
      "the recovery tree must survive the failed compact")
  }

  test("maintainRoot: one sweep classifies every artifact kind, " +
      "compacts exactly those at the generation threshold, leaves the " +
      "rest (and anything unclassifiable) untouched, and preserves " +
      "content") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_maint")
      .toString
    // graph artifact with TWO generations — at the threshold
    val gpath = s"$root/graph_idx"
    TrainedState.saveGraphIndex(
      Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
        .toDF("query_id", "rank", "neighbor_id", "cos_sim"), gpath)
    TrainedState.appendGraphDelta(Seq((0L, 1, 2L, 0.9))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim"), gpath)
    TrainedState.appendGraphDelta(Seq((1L, 1, 3L, 0.8))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim"), gpath)
    val wantGraph = normEdges(TrainedState.loadGraphIndex(spark, gpath))
    // layered artifact with ONE generation — below the threshold
    val hpath = s"$root/hnsw_idx"
    TrainedState.saveHnswIndex(
      Seq((0, 0L, 1, 1L, 0.5), (0, 1L, 1, 0L, 0.4))
        .toDF("layer", "query_id", "rank", "neighbor_id", "cos_sim"),
      hpath)
    TrainedState.appendHnswDelta(Seq((0, 0L, 1, 2L, 0.9))
      .toDF("layer", "query_id", "rank", "neighbor_id", "cos_sim"),
      hpath)
    // pq codes with no deltas; an unclassifiable directory; a stale
    // trash sibling that must be left alone
    val cpath = s"$root/codes_idx"
    TrainedState.savePqCodes(
      Seq((0L, 0, 3), (0L, 1, 5)).toDF("vec_id", "sub", "code"), cpath)
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$root/mystery")
    assert(new java.io.File(s"$root/old_idx.compact-trash/j").mkdirs())
    // a retrieval ROOT at the threshold: its pending state lives in
    // the sub-artifacts (2 docLens tombstone generations), not in a
    // root-level _delta
    val rpath = s"$root/retr_idx"
    val (rp, rt, rd, rs) = graft.text.Retrieval.buildIndex(
      Seq((0L, "apple banana"), (1L, "banana cherry"),
        (2L, "cherry date")).toDF("doc_id", "text"), "doc_id", "text")
    TrainedState.saveRetrievalIndex(rp, rt, rd, rs, rpath)
    TrainedState.forgetRetrievalDocs(Seq(1L).toDF("doc_id"), rpath)
    TrainedState.forgetRetrievalDocs(Seq(2L).toDF("doc_id"), rpath)

    val receipts = TrainedState.maintainRoot(spark, root,
      maxGenerations = 2L).map(r =>
      (r.path.split('/').last, r.kind, r.generations, r.compacted))
    assert(receipts.toSet == Set(
      ("graph_idx", Some("graph"), 2L, true),
      ("hnsw_idx", Some("hnsw"), 1L, false),
      ("codes_idx", Some("pqcodes"), 0L, false),
      ("retr_idx", Some("retrieval"), 2L, true),
      ("mystery", None, 0L, false)), s"receipts: $receipts")
    // the sweep folded the generations into the doclens base (the
    // tombstone ROWS persist as null-dl base rows until a
    // consolidation drops the postings too); membership stays deleted
    assert(TrainedState.deltaGenerations(spark, s"$rpath/doclens") == 0L)
    assert(TrainedState.loadRetrievalIndex(spark, rpath)._3
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L))
    // the graph compacted losslessly; the hnsw generation still lives
    noPendingGens(gpath)
    assert(normEdges(TrainedState.loadGraphIndex(spark, gpath)) ==
      wantGraph)
    assert(TrainedState.deltaGenerations(spark, hpath) == 1L)
    assert(new java.io.File(s"$root/old_idx.compact-trash/j").exists(),
      "a trash sibling belongs to its artifact's next compaction, " +
        "never to the sweep")
  }

  test("save-time numFiles knob: the artifact lands in exactly that " +
      "many data files (the 100x scaling term's control — rows per " +
      "file must stay ~constant as the index grows, SCALE.md r14) and " +
      "round-trips content") {
    import spark.implicits._
    val path = tmp("numfiles")
    val edges = (0L until 200L).map(i => (i, 1, (i + 1) % 200, 0.5))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path, numFiles = 4)
    def dataFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles(path) == 4,
      s"expected 4 data files, found ${dataFiles(path)}")
    assert(TrainedState.loadGraphIndex(spark, path).count() == 200)
    val codes = (0L until 120L).flatMap(i => Seq((i, 0, 3), (i, 1, 5)))
      .toDF("vec_id", "sub", "code")
    val cpath = tmp("numfiles_pq")
    TrainedState.savePqCodes(codes, cpath, numFiles = 3)
    assert(dataFiles(cpath) == 3)
    assert(TrainedState.loadPqCodes(spark, cpath).count() == 240)
  }

  test("loadGraphIndexCached: an unchanged artifact returns the CACHED " +
      "reconciled plan (no delta re-collect per trigger); any append " +
      "or compaction changes the fingerprint and forces a fresh load " +
      "with the new content") {
    import spark.implicits._
    val path = tmp("load_cache")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    val a = TrainedState.loadGraphIndexCached(spark, path)
    val b = TrainedState.loadGraphIndexCached(spark, path)
    assert(a eq b, "fingerprint-stable loads must return the cached plan")
    TrainedState.appendGraphDelta(
      Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    val c = TrainedState.loadGraphIndexCached(spark, path)
    assert(!(c eq b), "an append must invalidate the cached plan")
    // read c's content BEFORE the compaction below: the compaction
    // replaces the base files, and a plan loaded before it is stale by
    // design (its pinned listing names deleted files) — exactly why
    // the fingerprint invalidates
    val wantC = normEdges(c)
    assert(wantC == Set((0L, 1, 2L, 0.9), (1L, 1, 0L, 0.4)),
      "the fresh load must serve the appended generation")
    assert(TrainedState.loadGraphIndexCached(spark, path) eq c)
    TrainedState.compactGraphIndex(spark, path)
    val d = TrainedState.loadGraphIndexCached(spark, path)
    assert(!(d eq c), "a compaction must invalidate the cached plan")
    assert(normEdges(d) == wantC,
      "compaction changes layout, never content")
  }

  test("claim order is not commit order: a lock claimed BEFORE a later " +
      "generation committed survives the compaction (spent = folded " +
      "gen dir, not numerically-below-the-max), so the in-flight " +
      "writer's number is never reused") {
    import spark.implicits._
    val path = tmp("claim_vs_commit")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    // writer A claims gen-1 and is STILL WRITING (lock, no dir)
    val lockDir = new java.io.File(s"$path/_delta/_locks")
    assert(lockDir.mkdirs())
    assert(new java.io.File(lockDir, "gen-1").createNewFile())
    // writer B claims and COMMITS gen-2 before any compaction
    TrainedState.appendGraphDelta(
      Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    assert(new java.io.File(s"$path/_delta/gen-2").exists())
    // the compaction folds gen-2; A's gen-1 lock is numerically below
    // the folded max but must NOT be treated as spent — its write is
    // still in flight
    TrainedState.compactGraphIndex(spark, path)
    assert(new java.io.File(lockDir, "gen-1").exists(),
      "an unmatched lock must ride over the compaction")
    assert(TrainedState.deltaGenerations(spark, path) == 1L)
    // the next claimant must skip A's number: reusing 1 would share
    // gen-1's directory/staging with the stale writer
    TrainedState.appendGraphDelta(
      Seq((1L, 1, 3L, 0.8)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    // the floor (pre-seeded at 2 = the folded max) pushes the claim to
    // 3 — above BOTH the in-flight number 1 and the folded number 2
    assert(!new java.io.File(s"$path/_delta/gen-1").exists() &&
      new java.io.File(s"$path/_delta/gen-3").exists(),
      "the post-compaction claim must not reuse the in-flight number 1")
    // A finally commits: its rows serve for its own keys and lose
    // newest-wins against the later claim for shared keys
    Seq((1L, 1, 4L, 0.7, 1L), (2L, 1, 5L, 0.6, 1L))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim", "_seq")
      .repartition(1).write.parquet(s"$path/_delta/gen-1")
    val served = normEdges(TrainedState.loadGraphIndex(spark, path))
    assert(served.contains((2L, 1, 5L, 0.6)),
      s"the late-committing claimant's own key must serve: $served")
    assert(served.contains((1L, 1, 3L, 0.8)) &&
      !served.contains((1L, 1, 4L, 0.7)),
      s"the newer claim must win the shared key: $served")
  }

  test("a compactor crash AFTER the swap but BEFORE the carryover " +
      "strands acknowledged generations in the trash; the NEXT " +
      "compaction recovers them before deleting — the acknowledged-" +
      "append contract survives the crash interleaving") {
    import spark.implicits._
    val path = tmp("trash_recovery")
    val edges = Seq((0L, 1, 1L, 0.5), (1L, 1, 0L, 0.4))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    TrainedState.appendGraphDelta(
      Seq((0L, 1, 2L, 0.9)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path) // gen-1, folded by the crashing compaction
    val late = Seq((1L, 1, 3L, 0.8)).toDF("query_id", "rank",
      "neighbor_id", "cos_sim").localCheckpoint(true)
    // gen-2 commits DURING the rewrite; the compactor dies after the
    // two renames, before the late-generation carryover
    TrainedState.compactTestHook = Some(() =>
      TrainedState.appendGraphDelta(late, path))
    TrainedState.compactPostSwapHook = Some(() =>
      throw new RuntimeException("simulated post-swap crash"))
    val ex = intercept[RuntimeException] {
      try TrainedState.compactGraphIndex(spark, path)
      finally {
        TrainedState.compactTestHook = None
        TrainedState.compactPostSwapHook = None
      }
    }
    assert(ex.getMessage.contains("simulated post-swap crash"))
    // the crash state: live serves the folded rows only — gen-2 is
    // stranded under the parked trash tree
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) ==
      Set((0L, 1, 2L, 0.9), (1L, 1, 0L, 0.4)))
    assert(new java.io.File(s"$path.compact-trash/_delta/gen-2").exists(),
      "the acknowledged late generation must sit in the trash")
    // the next compaction must CARRY the stranded generation over
    // before its trash delete — a bare delete would destroy gen-2
    // permanently
    TrainedState.compactGraphIndex(spark, path)
    noCompactLeftovers(path)
    noPendingGens(path)
    assert(normEdges(TrainedState.loadGraphIndex(spark, path)) ==
      Set((0L, 1, 2L, 0.9), (1L, 1, 3L, 0.8)),
      "the acknowledged append must survive the crash interleaving")
  }

  test("corpus-vectors artifact: save/load round-trip, delta " +
      "generations reconcile newest-wins per vec_id, compaction folds " +
      "losslessly, and the artifact kind is detected for maintenance") {
    import spark.implicits._
    def normVecs(df: DataFrame) = df.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSet
    val base = emb.filter(col("vec_id") < 40).localCheckpoint(true)
    val path = tmp("vectors_art")
    TrainedState.saveVectors(base, path)
    assert(normVecs(TrainedState.loadVectors(spark, path)) == normVecs(base))
    assert(TrainedState.detectArtifactKind(spark, path) == Some("vectors"))
    // gen 1: a fold-in batch (new ids) + a replaced vector (id 3)
    val b1 = emb.filter(col("vec_id") >= 40 && col("vec_id") < 45)
      .unionByName(Seq((3L, Seq(9f, 9f, 9f, 9f)))
        .toDF("vec_id", "embedding"))
      .localCheckpoint(true)
    TrainedState.appendVectorsDelta(b1, path)
    val want1 = normVecs(base.filter(col("vec_id") =!= 3L))
      .union(normVecs(b1))
    assert(normVecs(TrainedState.loadVectors(spark, path)) == want1,
      "vectors reconcile: base minus replaced id, plus the delta")
    // gen 2 re-touches id 3 — newest wins over gen 1
    val b2 = Seq((3L, Seq(7f, 7f, 7f, 7f))).toDF("vec_id", "embedding")
    TrainedState.appendVectorsDelta(b2, path)
    val want2 = want1.filterNot(_._1 == 3L).union(normVecs(b2))
    assert(normVecs(TrainedState.loadVectors(spark, path)) == want2)
    assert(TrainedState.deltaGenerations(spark, path) == 2L)
    TrainedState.compactVectors(spark, path)
    assert(normVecs(TrainedState.loadVectors(spark, path)) == want2,
      "compaction changed the served vectors")
    noPendingGens(path)
    noCompactLeftovers(path)
    assert(TrainedState.detectArtifactKind(spark, path) == Some("vectors"))
  }

  test("corpus-vectors TOMBSTONES: forgetVectorsDelta hides ids from " +
      "the load, a LATER re-append supersedes its tombstone (delete is " +
      "ordered, not forever), and compaction folds tombstones out of " +
      "the bytes") {
    import spark.implicits._
    def ids(df: DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val base = emb.filter(col("vec_id") < 40).localCheckpoint(true)
    val path = tmp("vectors_ts")
    TrainedState.saveVectors(base, path)
    // tombstone ids 3 and 11 (one generation); 99 was never saved — a
    // harmless no-op tombstone
    TrainedState.forgetVectorsDelta(
      Seq(3L, 11L, 99L).toDF("vec_id"), path)
    val after = TrainedState.loadVectors(spark, path)
    assert(ids(after) == ids(base) -- Set(3L, 11L))
    // a NEWER append of id 3 outranks its tombstone
    val re = Seq((3L, Seq(5f, 5f, 5f, 5f))).toDF("vec_id", "embedding")
    TrainedState.appendVectorsDelta(re, path)
    val served = TrainedState.loadVectors(spark, path)
      .filter(col("vec_id") === 3L).collect()
    assert(served.length == 1 &&
      served.head.getSeq[Float](1) == Seq(5f, 5f, 5f, 5f),
      "re-appended vector must supersede its tombstone")
    assert(ids(TrainedState.loadVectors(spark, path))
      .intersect(Set(11L)).isEmpty)
    // compaction: tombstones leave the bytes, the re-append survives
    TrainedState.compactVectors(spark, path)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    val baseFiles = spark.read.parquet(path)
    assert(baseFiles.filter(col("embedding").isNull).count() == 0,
      "compacted base must carry no tombstone rows")
    assert(ids(baseFiles) == ids(base) - 11L)
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("IVF index TOMBSTONES: forgetIvfDelta hides ids from the load " +
      "(the flat probe scores the index's own embeddings — a vectors " +
      "tombstone alone cannot stop it), a later re-assign supersedes, " +
      "and compaction folds tombstones out of the bytes with no " +
      "sentinel cell directory") {
    import spark.implicits._
    def ids(df: DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val base = emb.filter(col("vec_id") < 40).localCheckpoint(true)
    val cents = base.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid")).localCheckpoint(true)
    val path = tmp("ivf_ts")
    TrainedState.saveIvfIndex(Similarity.ivfAssign(base, cents), path)
    TrainedState.forgetIvfDelta(Seq(3L, 11L, 99L).toDF("vec_id"), path)
    val after = TrainedState.loadIvfIndex(spark, path)
    assert(ids(after) == ids(base) -- Set(3L, 11L))
    // the deleted ids leave the SERVE, not just the load: a saturating
    // probe over the reconciled index must never return 3 or 11
    val served = Similarity.ivfTopKFromIndex(
        base.filter(col("vec_id") < 10), after, k = 3, cents, nprobe = 2)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(served.intersect(Set(3L, 11L)).isEmpty,
      "a tombstoned id must not serve from the cell index")
    // a NEWER re-assign of id 3 outranks its tombstone (ordered delete)
    TrainedState.appendIvfDelta(
      Similarity.ivfAssign(base.filter(col("vec_id") === 3L), cents),
      path)
    assert(ids(TrainedState.loadIvfIndex(spark, path))
      .contains(3L), "re-assigned id must supersede its tombstone")
    // compaction: tombstones leave the bytes; no centroid_id=-1 dir
    TrainedState.compactIvfIndex(spark, path)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    val raw = spark.read.parquet(path)
    assert(raw.filter(col("embedding").isNull).count() == 0,
      "compacted base must carry no tombstone rows")
    assert(ids(raw) == ids(base) - 11L)
    assert(!new java.io.File(path).list().exists(_.contains("centroid_id=-1")),
      "the tombstone sentinel cell must never materialize as a directory")
    noPendingGens(path)
    noCompactLeftovers(path)
    assert(TrainedState.detectArtifactKind(spark, path) == Some("ivf"))
  }

  test("IVF-PQ index TOMBSTONES: forgetIvfPqDelta drops the id's code " +
      "row from the load, re-encode supersedes, compaction is physical") {
    import spark.implicits._
    val path = tmp("ivfpq_ts")
    val baseRows = Seq((0L, 0L, Seq(1, 2)), (3L, 0L, Seq(3, 4)),
      (7L, 20L, Seq(5, 6))).toDF("vec_id", "centroid_id", "codes")
    TrainedState.saveIvfPqIndex(baseRows, path)
    TrainedState.forgetIvfPqDelta(Seq(3L, 99L).toDF("vec_id"), path)
    def codeIds() = TrainedState.loadIvfPqIndex(spark, path)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(codeIds() == Set(0L, 7L))
    // re-encode of 3 supersedes its tombstone
    TrainedState.appendIvfPqDelta(
      Seq((3L, 20L, Seq(9, 9))).toDF("vec_id", "centroid_id", "codes"),
      path)
    assert(codeIds() == Set(0L, 3L, 7L))
    TrainedState.compactIvfPqIndex(spark, path)
    val raw = spark.read.parquet(path)
    assert(raw.filter(col("codes").isNull).count() == 0,
      "compacted base must carry no tombstone rows")
    assert(!new java.io.File(path).list().exists(_.contains("centroid_id=-1")))
    val r3 = TrainedState.loadIvfPqIndex(spark, path)
      .filter(col("vec_id") === 3L).collect()
    assert(r3.length == 1 && r3.head.getLong(1) == 20L,
      "the re-encode must survive compaction")
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("flat PQ codes TOMBSTONES: ONE forgetPqCodesDelta row outranks " +
      "the id's whole numSub-row code set (the reconcile keys on " +
      "vec_id), re-encode supersedes, compaction is physical") {
    import spark.implicits._
    val path = tmp("pqcodes_ts")
    TrainedState.savePqCodes(
      Seq((0L, 0, 1), (0L, 1, 2), (5L, 0, 3), (5L, 1, 4))
        .toDF("vec_id", "sub", "code"), path)
    TrainedState.forgetPqCodesDelta(Seq(5L).toDF("vec_id"), path)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
      Set((0L, 0, 1), (0L, 1, 2)),
      "one tombstone row must hide the id's entire code set")
    // re-encode supersedes the tombstone with a full code set
    TrainedState.appendPqCodesDelta(
      Seq((5L, 0, 7), (5L, 1, 8)).toDF("vec_id", "sub", "code"), path)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
      Set((0L, 0, 1), (0L, 1, 2), (5L, 0, 7), (5L, 1, 8)))
    TrainedState.compactPqCodes(spark, path)
    assert(spark.read.parquet(path).filter(col("code").isNull).count() == 0,
      "compacted base must carry no tombstone rows")
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("pooled artifact delta lifecycle: appendPooledDelta folds in a " +
      "batch O(batch) with the savePooled width check, forgetPooledDelta " +
      "tombstones, re-append supersedes, compactPooled is physical, " +
      "and the kind detects as pooled") {
    import spark.implicits._
    val path = tmp("pooled_ts")
    val tokens = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") % 10).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .localCheckpoint(true)
    val dims = 64
    TrainedState.savePooled(
      LateInteraction.poolSum(tokens, "doc_id", dims), path, dims)
    assert(TrainedState.detectArtifactKind(spark, path) == Some("pooled"))
    def ids() = TrainedState.loadPooled(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids() == (0L until 10L).toSet)
    // fold in a new doc's pooled row as a delta — O(batch)
    val newDoc = emb.filter(col("vec_id") === 50L)
      .select(lit(200L).as("doc_id"), col("vec_id").as("token_idx"),
        col("embedding"))
    TrainedState.appendPooledDelta(
      LateInteraction.poolSum(newDoc, "doc_id", dims), path)
    assert(ids() == (0L until 10L).toSet + 200L)
    // a width-drifted append fails LOUDLY (the savePooled contract)
    val err = intercept[Exception] {
      TrainedState.appendPooledDelta(
        Seq((201L, 1L, Seq(1L, 2L))).toDF("id", "n_tokens", "pool"), path)
    }
    assert(err.getMessage != null)
    // tombstone doc 3 and the fresh 200; 999 is a harmless no-op
    TrainedState.forgetPooledDelta(
      Seq(3L, 200L, 999L).toDF("id"), path)
    assert(ids() == (0L until 10L).toSet -- Set(3L) )
    // a newer re-append supersedes the tombstone (ordered delete)
    TrainedState.appendPooledDelta(
      LateInteraction.poolSum(newDoc, "doc_id", dims), path)
    assert(ids().contains(200L))
    // physical fold: no NULL pools in the bytes, generations folded,
    // and the reconciled survivors equal a from-scratch re-pool
    TrainedState.compactPooled(spark, path)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    assert(spark.read.parquet(path).filter(col("pool").isNull).count() == 0)
    assert(ids() == (0L until 10L).toSet - 3L + 200L)
    assert(TrainedState.loadPooledParams(spark, path) == dims)
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("banded signature index lifecycle: append supersedes the id's " +
      "whole band-row set, ONE tombstone row hides it, compaction is " +
      "physical, and the kind detects as bandedsigs") {
    import spark.implicits._
    val path = tmp("bandedsig_ts")
    TrainedState.saveBandedSigIndex(
      Seq((1L, 0x1111222233334444L), (2L, 0x5555666677778888L))
        .toDF("id", "simhash"), path, blocks = 60)
    assert(TrainedState.detectArtifactKind(spark, path) ==
      Some("bandedsigs"))
    assert(TrainedState.bandedSigParams(spark, path) == 60)
    def rows() = TrainedState.loadBandedSigIndex(spark, path)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
      .toSet
    assert(rows().map(_._1) == Set(1L, 2L) && rows().size == 8,
      s"4 band rows per signature expected: ${rows()}")
    // re-append id 1 with a CHANGED signature: its four fresh band
    // rows supersede the old set (different buckets, same id)
    TrainedState.appendBandedSigsDelta(
      Seq((1L, 0x0123456789abcdefL)).toDF("id", "simhash"), path)
    val after = rows()
    assert(after.count(_._1 == 1L) == 4 &&
      after.filter(_._1 == 1L).forall(_._3 == 0x0123456789abcdefL),
      s"replacement left stale band rows: $after")
    // ONE tombstone row hides id 2's whole set; 99 is a no-op
    TrainedState.forgetBandedSigsDelta(Seq(2L, 99L).toDF("id"), path)
    assert(rows().map(_._1) == Set(1L))
    TrainedState.compactBandedSigIndex(spark, path)
    assert(TrainedState.deltaGenerations(spark, path) == 0L)
    assert(spark.read.parquet(path)
      .filter(col("simhash").isNull).count() == 0)
    assert(rows().map(_._1) == Set(1L))
    noPendingGens(path)
    noCompactLeftovers(path)
  }

  test("compaction rewrites are DATA-SIZED: files scale with rows at " +
      "the target density across append->compact cycles (the measured " +
      "100x file-density term cannot re-enter via compaction)") {
    import spark.implicits._
    def dataFiles(path: String): Int =
      new java.io.File(path).listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val path = tmp("sized_compact")
    // 120 edge rows at target 40 rows/file → 3 files after compaction
    val edges = (0L until 120L).map(i => (i, 1, (i + 1) % 120L, 0.5))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveGraphIndex(edges, path)
    TrainedState.appendGraphDelta(
      Seq((0L, 2, 7L, 0.4)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    TrainedState.compactGraphIndex(spark, path, targetRowsPerFile = 40L)
    assert(dataFiles(path) == 4,
      s"121 rows at target 40 must land in 4 files, got ${dataFiles(path)}")
    // grow the artifact ~2x through a delta, compact again at the same
    // target: the file count must grow with the rows — density stays
    // ~constant, the 100x term's control
    val growth = (1000L until 1140L).map(i => (i, 1, i - 1, 0.3))
      .toDF("query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.appendGraphDelta(growth, path)
    TrainedState.compactGraphIndex(spark, path, targetRowsPerFile = 40L)
    assert(dataFiles(path) == 7,
      s"261 rows at target 40 must land in 7 files, got ${dataFiles(path)}")
    // content survived both sized rewrites (the first delta's
    // query_id-0 row SUPERSEDED the base's — newest-wins per source)
    assert(TrainedState.loadGraphIndex(spark, path).count() == 260L)
    // the sizing helper's contract
    assert(TrainedState.filesForRows(0L, 100L) == 1)
    assert(TrainedState.filesForRows(100L, 100L) == 1)
    assert(TrainedState.filesForRows(101L, 100L) == 2)
  }

  test("hot IVF cells SPLIT at the target density: a planted-skew save " +
      "lands ~ceil(cellRows/target) files in the fat cell, one in the " +
      "small cell, round-trips content, and probes serve unchanged") {
    import spark.implicits._
    val rows = (0L until 150L).map(v => (v, 0L, Seq(1f, 0f))) ++
      (1000L until 1010L).map(v => (v, 1L, Seq(0f, 1f)))
    val idx = rows.toDF("vec_id", "centroid_id", "embedding")
    val path = tmp("ivf_salt")
    TrainedState.saveIvfIndex(idx, path, targetRowsPerFile = 50L)
    def cellFiles(c: Long): Int =
      new java.io.File(s"$path/centroid_id=$c").listFiles()
        .count(x => x.isFile && x.getName.endsWith(".parquet"))
    assert(cellFiles(0L) == 3,
      s"150-row cell at target 50 must split into 3 files, got ${cellFiles(0L)}")
    assert(cellFiles(1L) == 1,
      s"10-row cell must stay one file, got ${cellFiles(1L)}")
    val loaded = TrainedState.loadIvfIndex(spark, path)
    assert(loaded.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      rows.map(t => (t._1, t._2)).toSet,
      "salted layout changed the served assignment")
    // below the target nothing splits — the fast path's one file per
    // cell (the small-files contract)
    val path2 = tmp("ivf_nosalt")
    TrainedState.saveIvfIndex(idx, path2, targetRowsPerFile = 1000L)
    def cellFiles2(c: Long): Int =
      new java.io.File(s"$path2/centroid_id=$c").listFiles()
        .count(x => x.isFile && x.getName.endsWith(".parquet"))
    assert(cellFiles2(0L) == 1 && cellFiles2(1L) == 1)
  }

  test("cached loads are PER-SESSION: a sibling session never receives " +
      "another session's plan; the owning session still hits its cache") {
    import spark.implicits._
    val path = tmp("cache_session")
    TrainedState.saveGraphIndex(
      Seq((0L, 1, 1L, 0.5)).toDF("query_id", "rank", "neighbor_id",
        "cos_sim"), path)
    val a1 = TrainedState.loadGraphIndexCached(spark, path)
    val a2 = TrainedState.loadGraphIndexCached(spark, path)
    assert(a1 eq a2, "same session must hit its cached plan")
    val sibling = spark.newSession()
    val b = TrainedState.loadGraphIndexCached(sibling, path)
    assert(!(b eq a1),
      "a sibling session must get its own plan, never another " +
        "session's cached one")
    assert(normEdges(b) == normEdges(a1))
  }

  test("fingerprints see through SYNTHETIC directory statuses (object-" +
      "store shape, simulated by zeroing dir mtimes): a rewrite inside " +
      "a partition directory that leaves every directory status " +
      "unchanged still invalidates the cached plan") {
    import spark.implicits._
    val path = tmp("cache_synth")
    val layered = Seq((0, 0L, 1, 1L, 0.5), (0, 1L, 1, 0L, 0.4))
      .toDF("layer", "query_id", "rank", "neighbor_id", "cos_sim")
    TrainedState.saveHnswIndex(layered, path)
    def zeroDirMtimes(): Unit = {
      // drop the root commit marker too: it is a FILE at the top level
      // whose real mtime would reveal the rewrite without any descent —
      // the object-store shape this simulates has only synthetic dirs
      // at the root
      new java.io.File(s"$path/_SUCCESS").delete()
      def walk(f: java.io.File): Unit = if (f.isDirectory) {
        f.listFiles().foreach(walk); f.setLastModified(0L); ()
      }
      walk(new java.io.File(path))
    }
    zeroDirMtimes()
    val a = TrainedState.loadHnswIndexCached(spark, path)
    assert(TrainedState.loadHnswIndexCached(spark, path) eq a,
      "stable statuses must hit the cache")
    // rewrite IN PLACE inside the layer directory: same file names
    // would be the adversarial case, but parquet writers mint fresh
    // part names — the point is the DIRECTORY statuses stay zeroed
    // (synthetic), so only the descent into file statuses can see it
    TrainedState.saveHnswIndex(layered.withColumn("cos_sim",
      col("cos_sim") + 0.1), path)
    zeroDirMtimes()
    val b = TrainedState.loadHnswIndexCached(spark, path)
    assert(!(b eq a),
      "a rewrite under synthetic directory statuses must change the " +
        "fingerprint (file-status descent) — a stale plan would pin " +
        "deleted files")
  }

  test("compaction pre-seeds a claim FLOOR in the rewritten tree: " +
      "numbering is monotone across compactions and the floor never " +
      "counts as a pending generation") {
    import spark.implicits._
    val path = tmp("floor_marker")
    TrainedState.savePqCodes(
      Seq((0L, 0, 1), (1L, 0, 2)).toDF("vec_id", "sub", "code"), path)
    TrainedState.appendPqCodesDelta(
      Seq((0L, 0, 5)).toDF("vec_id", "sub", "code"), path) // gen-1
    TrainedState.compactPqCodes(spark, path)
    assert(new java.io.File(s"$path/_delta/_locks/floor-1").exists(),
      "the compacted tree must record the folded-generation floor")
    assert(TrainedState.deltaGenerations(spark, path) == 0L,
      "a floor marker is a numbering lower bound, not pending work")
    // the next append must claim ABOVE the floor, not restart at gen-1
    TrainedState.appendPqCodesDelta(
      Seq((1L, 0, 9)).toDF("vec_id", "sub", "code"), path)
    assert(new java.io.File(s"$path/_delta/gen-2").exists(),
      "post-compaction numbering must resume above the floor")
    assert(TrainedState.deltaGenerations(spark, path) == 1L)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
      Set((0L, 0, 5), (1L, 0, 9)))
  }

  test("post-swap crash, then a NEW acknowledged append, then the " +
      "recovery compaction: the stale folded generations carried out " +
      "of the trash can never outrank the newer append (the claim " +
      "floor survives the crash because it rides the swap itself)") {
    import spark.implicits._
    val path = tmp("floor_crash")
    val base = Seq((0L, 0, 1), (3L, 0, 10), (3L, 1, 11))
      .toDF("vec_id", "sub", "code")
    TrainedState.savePqCodes(base, path)
    // two folded generations re-touching vec 3 — the stale versions
    TrainedState.appendPqCodesDelta(
      Seq((3L, 0, 100), (3L, 1, 101)).toDF("vec_id", "sub", "code"), path)
    TrainedState.appendPqCodesDelta(
      Seq((3L, 0, 200), (3L, 1, 201)).toDF("vec_id", "sub", "code"), path)
    // compactor dies after the swap, before carryover + trash delete:
    // live tree has an empty _delta (bar the floor marker), trash still
    // holds the folded gen-1/gen-2 directories
    TrainedState.compactPostSwapHook = Some(() =>
      throw new RuntimeException("simulated post-swap crash"))
    val ex = intercept[RuntimeException] {
      try TrainedState.compactPqCodes(spark, path)
      finally TrainedState.compactPostSwapHook = None
    }
    assert(ex.getMessage.contains("simulated post-swap crash"))
    assert(new java.io.File(s"$path.compact-trash/_delta/gen-2").exists(),
      "the folded generations must sit stranded in the trash")
    // a post-crash append — ACKNOWLEDGED once this returns. Without the
    // pre-seeded floor it would claim gen-1 (_seq below the stranded
    // gen-2), and the recovery's carried stale rows would permanently
    // outrank it for vec 3.
    TrainedState.appendPqCodesDelta(
      Seq((3L, 0, 999), (3L, 1, 998)).toDF("vec_id", "sub", "code"), path)
    assert(new java.io.File(s"$path/_delta/gen-3").exists(),
      "the post-crash claim must start above every folded number")
    // recovery compaction: carries the stale gens out of the trash
    // FIRST (no data loss), then folds — newest-wins must pick the
    // acknowledged post-crash rows
    TrainedState.compactPqCodes(spark, path)
    noCompactLeftovers(path)
    assert(normCodes(TrainedState.loadPqCodes(spark, path)) ==
      Set((0L, 0, 1), (3L, 0, 999), (3L, 1, 998)),
      "the acknowledged post-crash append must win over the recovered " +
        "stale generations")
  }
}
