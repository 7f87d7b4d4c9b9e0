package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Hnsw]] — layer assignment (nested, deterministic, geometric-ish),
  * degeneration to the flat [[GraphAnn.searchGraph]] at maxLevel 0,
  * saturating-budget == exact brute force, and the layered-index
  * persistence round-trip. */
class HnswSpec extends SparkTestBase {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def collectTopK(df: DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("levels: deterministic, nested by construction, geometrically " +
      "sparser, and within [0, maxLevel]") {
    val e = emb.filter(col("vec_id") < 500)
    val lv = Hnsw.levels(e, m = 4, maxLevel = 3)
    val again = Hnsw.levels(e, m = 4, maxLevel = 3)
    assert(lv.collect().toSet == again.collect().toSet, "not deterministic")
    val byLevel = lv.groupBy(col("level")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLevel.keys.forall(l => l >= 0 && l <= 3))
    val n = e.count()
    val atLeast = (l: Int) => byLevel.filter(_._1 >= l).values.sum
    // P(level >= l) = 4^-l: expect ~n/4 at >=1, ~n/16 at >=2 — assert
    // the loose brackets (hash noise at 500 rows stays well inside)
    assert(atLeast(1) > n / 8 && atLeast(1) < n / 2,
      s"level>=1 count ${atLeast(1)} of $n not ~n/4")
    assert(atLeast(2) < n / 8, s"level>=2 count ${atLeast(2)} not ~n/16")
    // m=2 levels refine m=4 levels consistently: 4^l | h implies 2^l | h,
    // so every m=4 level-l node has m=2 level >= l
    val lv2 = Hnsw.levels(e, m = 2, maxLevel = 3)
    val joined = lv.withColumnRenamed("level", "l4")
      .join(lv2.withColumnRenamed("level", "l2"), Seq("vec_id"))
    assert(joined.filter(col("l2") < col("l4")).isEmpty)
  }

  test("maxLevel = 0 degenerates to the flat searchGraph, bit for bit") {
    val e = emb.filter(col("vec_id") < 60)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 0)
      .localCheckpoint(true)
    val probes = e.filter(col("vec_id") % 15 === 0)
    val got = Hnsw.search(probes, layered, e, entryId = 0L, entryLevel = 0,
      beamUpper = 1, hopsUpper = 1, beam = 3, hops = 2, k = 3)
    val flat = GraphAnn.searchGraph(probes,
      layered.filter(col("layer") === 0), e,
      entryId = 0L, beam = 3, hops = 2, k = 3)
    assert(collectTopK(got) == collectTopK(flat))
  }

  test("saturating budgets degenerate to exact brute force through the " +
      "full hierarchy") {
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val n = e.count().toInt
    // degree n-1: every layer's graph is complete over its nodes, so
    // reachability can never be the miss reason — only the hierarchy
    // logic itself
    val layered = Hnsw.buildIndex(e, degree = n - 1, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val lv = Hnsw.levels(e, m = 4, maxLevel = 2)
    val (entryId, entryLevel) = Hnsw.entryOf(lv)
    val probes = e.filter(col("vec_id") % 16 === 0)
    val got = Hnsw.search(probes, layered, e, entryId, entryLevel,
      beamUpper = n, hopsUpper = 4, beam = n, hops = 4, k = 3)
    val want = Similarity.bruteTopK(probes, e, 3)
    assert(collectTopK(got) == collectTopK(want))
  }

  test("small-budget hierarchical search: well-formed ranks, every " +
      "refined entry at least as close as the global entry implies no " +
      "query vanishes, and searchAuto matches explicit entry") {
    val e = emb.filter(col("vec_id") < 120).localCheckpoint(true)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val lv = Hnsw.levels(e, m = 4, maxLevel = 2)
    val (entryId, entryLevel) = Hnsw.entryOf(lv)
    val probes = e.filter(col("vec_id") % 20 === 0)
    val got = Hnsw.search(probes, layered, e, entryId, entryLevel,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3)
      .localCheckpoint(true)
    val perQuery = got.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == r.getInt(2).toLong, s"rank gap: $r")
      assert(r.getLong(1) <= 3)
    }
    val auto = Hnsw.searchAuto(probes, layered, e,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3)
    assert(collectTopK(auto) == collectTopK(got),
      "searchAuto must derive the same entry the level table yields")
  }

  private def normLayered(df: DataFrame) =
    df.select(col("layer"), col("query_id"), col("rank"),
        col("neighbor_id"), round(col("cos_sim"), 9).as("cos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
      .toSet

  test("insert: a batch node's out-edges land in exactly layers " +
      "0..level(v) (nested membership from the shared hash), the degree " +
      "bound holds everywhere, and untouched sources pass through " +
      "bit-unchanged") {
    val all = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val batch = all.filter(col("vec_id") % 20 === 7).localCheckpoint(true)
    val pre = all.filter(col("vec_id") % 20 =!= 7).localCheckpoint(true)
    val layered = Hnsw.buildIndex(pre, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val upd = Hnsw.insert(layered, batch, pre, m = 4, maxLevel = 2,
      beam = 3, hops = 2, degree = 4).localCheckpoint(true)
    val lv = Hnsw.levels(batch, m = 4, maxLevel = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val outLayers = upd
      .join(batch.select(col("vec_id").as("query_id")), Seq("query_id"))
      .select(col("query_id"), col("layer")).distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet).toMap
    assert(lv.nonEmpty)
    lv.foreach { case (id, l) =>
      assert(outLayers(id) == (0 to l).toSet,
        s"node $id (level $l) has out-edges in layers ${outLayers(id)}")
    }
    assert(upd.groupBy(col("layer"), col("query_id")).count()
      .filter(col("count") > 4).isEmpty, "degree bound violated")
    // untouched = sources no batch forward edge points at (per layer)
    val touched = upd
      .join(batch.select(col("vec_id").as("query_id")), Seq("query_id"))
      .select(col("layer"), col("neighbor_id").as("query_id")).distinct()
    val batchSrc = batch.select(col("vec_id").as("query_id"))
    def untouchedOf(df: DataFrame) = normLayered(
      df.join(touched, Seq("layer", "query_id"), "left_anti")
        .join(batchSrc, Seq("query_id"), "left_anti"))
    assert(untouchedOf(upd) == untouchedOf(layered),
      "untouched sources must pass through bit-unchanged")
  }

  test("sequential single-vector insert with saturating budgets == a " +
      "full rebuild over the final corpus, per layer, ranks and all") {
    val all = emb.filter(col("vec_id") < 40).localCheckpoint(true)
    val n = all.count().toInt
    val a = all.filter(col("vec_id") === 7).localCheckpoint(true)
    val b = all.filter(col("vec_id") === 23).localCheckpoint(true)
    val pre = all.filter(!col("vec_id").isin(7L, 23L)).localCheckpoint(true)
    val built = Hnsw.buildIndex(pre, degree = n, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val afterA = Hnsw.insert(built, a, pre, m = 4, maxLevel = 2,
      beam = n, hops = n, degree = n).localCheckpoint(true)
    val corpusA = pre.unionByName(a).localCheckpoint(true)
    val afterB = Hnsw.insert(afterA, b, corpusA, m = 4, maxLevel = 2,
      beam = n, hops = n, degree = n).localCheckpoint(true)
    val rebuilt = Hnsw.buildIndex(all, degree = n, m = 4, maxLevel = 2)
    assert(normLayered(afterB) == normLayered(rebuilt),
      "saturating sequential insert must equal the rebuilt index")
  }

  test("forget: deleted ids (including the ENTRY) vanish from both " +
      "columns of every layer, merged receipts match per-layer edge " +
      "arithmetic with the negative confirmation, and searchAuto " +
      "re-elects an entry from the survivors and still serves") {
    import spark.implicits._
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val (entryId, _) = Hnsw.entryOf(Hnsw.levels(e, m = 4, maxLevel = 2))
    val other = if (entryId == 13L) 14L else 13L
    val del = Seq(entryId, other, 999999L).toDF("vec_id")
    val (kept, receipts) = Hnsw.forget(layered, del, maxLevel = 2)
    val keptM = kept.localCheckpoint(true)
    assert(keptM.filter(col("query_id").isin(entryId, other) ||
      col("neighbor_id").isin(entryId, other)).isEmpty)
    // receipts == direct edge arithmetic over the pre-forget table
    val got = receipts.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    Seq(entryId, other).foreach { id =>
      val nOut = layered.filter(col("query_id") === id).count()
      val nIn = layered.filter(col("neighbor_id") === id).count()
      assert(got(id) == ((nOut, nIn, true)), s"receipt mismatch for $id")
    }
    assert(got(999999L) == ((0L, 0L, false)), "negative confirmation")
    // serving survives entry deletion: searchAuto re-elects from the
    // surviving edge table
    val live = e.filter(!col("vec_id").isin(entryId, other))
    val probes = live.filter(col("vec_id") % 16 === 3)
    val served = Hnsw.searchAuto(probes, keptM, live,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3)
      .localCheckpoint(true)
    assert(served.count() > 0)
    assert(served.filter(col("neighbor_id").isin(entryId, other)).isEmpty,
      "forgotten ids must never be served")
  }

  test("searchFiltered: filtered == post-filter + re-rank of the " +
      "unfiltered hierarchy at ANY budget; with a complete graph and " +
      "saturating budgets it equals brute force over the allowed subset") {
    import org.apache.spark.sql.expressions.Window
    val e = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val n = e.count().toInt
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val (entryId, entryLevel) = Hnsw.entryOf(Hnsw.levels(e, m = 4,
      maxLevel = 2))
    val probes = e.filter(col("vec_id") % 20 === 0)
    val pred = col("vec_id") % 3 === 0
    // modest budgets: the filtered answer must be exactly the top-3 of
    // (this walk's visited ∩ matching) — post-filter + re-rank of the
    // SAME unfiltered walk returned whole (k = n)
    val filt = Hnsw.searchFiltered(probes, layered, e, entryId,
      entryLevel, beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2,
      k = 3, pred)
    val unf = Hnsw.search(probes, layered, e, entryId, entryLevel,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = n)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val ref = unf.filter(col("neighbor_id") % 3 === 0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"))
    assert(collectTopK(filt) == collectTopK(ref),
      "filtered must equal post-filter + re-rank of the same walk")
    // complete per-layer graphs + saturating budgets: reachability can
    // never be the miss reason, so filtered == brute over the subset
    val complete = Hnsw.buildIndex(e, degree = n - 1, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val sat = Hnsw.searchFiltered(probes, complete, e, entryId,
      entryLevel, beamUpper = 1, hopsUpper = 2, beam = n, hops = n,
      k = 3, pred)
    val brute = Similarity.bruteTopK(probes, e.filter(pred), 3)
    assert(collectTopK(sat) == collectTopK(brute),
      "saturating filtered hierarchy must equal brute over the subset")
  }

  test("searchPq: entryLevel 0 degenerates bit-for-bit to the flat " +
      "searchGraphPq, and with a complete graph, saturating beam and " +
      "full rerank the ADC approximation cancels out — equal to brute") {
    val e = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val n = e.count().toInt
    val books = ProductQuantizer.codebooks(e, dim = 64, numSub = 8,
      stride = 10)
    val codes = ProductQuantizer.encode(e, books, dim = 64, numSub = 8)
      .localCheckpoint(true)
    val probes = e.filter(col("vec_id") % 20 === 0)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    // entryLevel 0: the hierarchy degenerates to its base layer
    val flat = GraphAnn.searchGraphPq(probes,
      layered.filter(col("layer") === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim")),
      codes, books, dim = 64, numSub = 8, e, entryId = 0L, beam = 3,
      hops = 2, k = 3, rerank = 4)
    val viaHier = Hnsw.searchPq(probes, layered, codes, books, dim = 64,
      numSub = 8, e, entryId = 0L, entryLevel = 0, beamUpper = 1,
      hopsUpper = 2, beam = 3, hops = 2, k = 3, rerank = 4)
    assert(collectTopK(viaHier) == collectTopK(flat),
      "entryLevel 0 must be the flat codes search bit-for-bit")
    // complete per-layer graphs + saturating budgets + full rerank:
    // every node enters the shortlist and the exact re-rank decides —
    // the ADC approximation cannot change the answer
    val complete = Hnsw.buildIndex(e, degree = n - 1, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val (entryId, entryLevel) = Hnsw.entryOf(Hnsw.levels(e, m = 4,
      maxLevel = 2))
    val sat = Hnsw.searchPq(probes, complete, codes, books, dim = 64,
      numSub = 8, e, entryId, entryLevel, beamUpper = 1, hopsUpper = 2,
      beam = n, hops = n, k = 3, rerank = n)
    val brute = Similarity.bruteTopK(probes, e, 3)
    assert(collectTopK(sat) == collectTopK(brute),
      "saturating codes hierarchy must equal exact brute force")
  }

  test("forgetRepaired: saturating per-layer repair == full rebuild " +
      "over the live corpus, layer tags and all; receipts carry the " +
      "cross-layer n_repaired totals; every surviving source is back " +
      "at the degree bound") {
    import spark.implicits._
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val n = e.count().toInt
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    // delete one upper-layer node (exercises repair at layers >= 1) and
    // one layer-0 node, plus the negative-confirmation id
    val lv = Hnsw.levels(e, m = 4, maxLevel = 2).localCheckpoint(true)
    val up = lv.filter(col("level") >= 1).agg(min(col("vec_id")))
      .collect()(0).getLong(0)
    val lo = lv.filter(col("level") === 0).agg(min(col("vec_id")))
      .collect()(0).getLong(0)
    val del = Seq(up, lo, 999999L).toDF("vec_id")
    val (repaired0, receipts) = Hnsw.forgetRepaired(layered, e, del,
      maxLevel = 2, beam = n, hops = n, degree = 4)
    val repaired = repaired0.localCheckpoint(true)
    val live = e.filter(!col("vec_id").isin(up, lo))
    val rebuilt = Hnsw.buildIndex(live, degree = 4, m = 4, maxLevel = 2)
    assert(normLayered(repaired) == normLayered(rebuilt),
      "saturating layered repair must equal the rebuilt layered index")
    // receipts: totals across layers == direct per-layer edge arithmetic
    val got = receipts.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toMap
    Seq(up, lo).foreach { id =>
      val nOut = layered.filter(col("query_id") === id).count()
      val nIn = layered.filter(col("neighbor_id") === id).count()
      val nRep = layered.filter(col("neighbor_id") === id)
        .filter(!col("query_id").isin(up, lo))
        .select(col("layer"), col("query_id")).distinct().count()
      assert(got(id) == ((nOut, nIn, true, nRep)), s"receipts for $id")
    }
    assert(got(999999L) == ((0L, 0L, false, 0L)), "negative confirmation")
    // the receipts-ONLY path (no repair searches) produces the same rows
    val cheap = Hnsw.forgetRepairReceipts(layered, del, maxLevel = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toMap
    assert(cheap == got, "receipts-only path diverged from the lifecycle")
    // degree restored everywhere (the live slice is dense enough that
    // every source has 4 live candidates)
    assert(repaired.groupBy(col("layer"), col("query_id")).count()
      .filter(col("count") =!= 4).isEmpty,
      "every surviving source must hold the degree bound per layer")
  }

  test("forgetRepaired: deleting an ENTIRE upper layer degrades the " +
      "index to fewer layers instead of failing — no repair entry is " +
      "elected for the emptied layer, and searchAuto serves from the " +
      "highest surviving layer") {
    import spark.implicits._
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val n = e.count().toInt
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val lv = Hnsw.levels(e, m = 4, maxLevel = 2).localCheckpoint(true)
    val top = lv.filter(col("level") >= 2).collect().map(_.getLong(0))
    assert(top.nonEmpty, "slice must have at least one level-2 node")
    val del = top.toSeq.toDF("vec_id")
    val (kept0, _) = Hnsw.forgetRepaired(layered, e, del, maxLevel = 2,
      beam = n, hops = n, degree = 4)
    val kept = kept0.localCheckpoint(true)
    assert(kept.filter(col("layer") === 2).isEmpty,
      "layer 2 must be empty after deleting all its nodes")
    val live = e.filter(!col("vec_id").isin(top: _*))
    val served = Hnsw.searchAuto(live.filter(col("vec_id") % 16 === 3),
      kept, live, beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3)
      .localCheckpoint(true)
    assert(served.count() > 0, "index must still serve at fewer layers")
    assert(served.filter(col("neighbor_id").isin(top: _*)).isEmpty,
      "forgotten ids must never be served")
  }

  test("persistence round-trip: search(loadHnswIndex(save(build))) == " +
      "search(in-memory); wrong artifact fails fast") {
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("hnsw_idx").toString + "/idx"
    TrainedState.saveHnswIndex(layered, path)
    val loaded = TrainedState.loadHnswIndex(spark, path)
    val probes = e.filter(col("vec_id") % 16 === 0)
    def run(idx: DataFrame) = collectTopK(Hnsw.searchAuto(probes, idx, e,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3))
    assert(run(loaded) == run(layered))
    val wrong = java.nio.file.Files
      .createTempDirectory("hnsw_bad").toString + "/bad"
    e.limit(1).write.parquet(wrong)
    val ex = intercept[IllegalArgumentException] {
      TrainedState.loadHnswIndex(spark, wrong)
    }
    assert(ex.getMessage.contains("schema mismatch"))
  }

  test("insert delta persistence: appending the changed slice to a " +
      "saved index == a full rewrite, across two generations with a " +
      "re-touched source (newest wins), and compaction folds the " +
      "deltas back losslessly") {
    val all = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val b1 = all.filter(col("vec_id") % 20 === 7).localCheckpoint(true)
    val b2 = all.filter(col("vec_id") % 20 === 13).localCheckpoint(true)
    val pre = all.filter(col("vec_id") % 20 =!= 7 &&
      col("vec_id") % 20 =!= 13).localCheckpoint(true)
    val layered = Hnsw.buildIndex(pre, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("hnsw_delta").toString + "/idx"
    TrainedState.saveHnswIndex(layered, path)
    // generation 1
    val (full1Raw, delta1) = Hnsw.insertWithDelta(layered, b1, pre,
      m = 4, maxLevel = 2, beam = 3, hops = 2, degree = 4)
    val full1 = full1Raw.localCheckpoint(true)
    // the delta IS the change: full == untouched base ∪ delta, and the
    // plain insert is the same table
    assert(normLayered(full1) == normLayered(
      Hnsw.insert(layered, b1, pre, m = 4, maxLevel = 2, beam = 3,
        hops = 2, degree = 4)))
    TrainedState.appendHnswDelta(delta1, path)
    assert(normLayered(TrainedState.loadHnswIndex(spark, path)) ==
      normLayered(full1),
      "delta-appended load must equal the in-memory updated index")
    // generation 2 over the grown corpus — sources touched by BOTH
    // batches must serve generation 2's out-lists
    val corpus1 = pre.unionByName(b1).localCheckpoint(true)
    val (full2Raw, delta2) = Hnsw.insertWithDelta(full1, b2, corpus1,
      m = 4, maxLevel = 2, beam = 3, hops = 2, degree = 4)
    val full2 = full2Raw.localCheckpoint(true)
    TrainedState.appendHnswDelta(delta2, path)
    val loaded2 = TrainedState.loadHnswIndex(spark, path)
    assert(normLayered(loaded2) == normLayered(full2),
      "second-generation reconcile must serve the newest out-lists")
    // a full rewrite of the final state agrees byte-for-byte
    val rewrite = java.nio.file.Files
      .createTempDirectory("hnsw_rewrite").toString + "/idx"
    TrainedState.saveHnswIndex(full2, rewrite)
    assert(normLayered(TrainedState.loadHnswIndex(spark, rewrite)) ==
      normLayered(loaded2))
    // compaction folds deltas into the base losslessly
    TrainedState.compactHnswIndex(spark, path)
    assert(normLayered(TrainedState.loadHnswIndex(spark, path)) ==
      normLayered(full2), "compaction changed the served index")
    val pendingGens = Option(new java.io.File(s"$path/_delta").list())
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.startsWith("gen-"))
    assert(pendingGens.isEmpty,
      s"compaction must fold every pending generation: $pendingGens")
  }

  test("diversifiedEdges (Malkov Alg 4): on a planted clustered " +
      "geometry the heuristic spends degree budget on spread — the " +
      "beam walk escapes the entry's cluster where the plain kNN " +
      "graph strands it; invariants: Alg-4 predicate holds for every " +
      "kept edge, fill tops up to exactly min(degree, C) from the " +
      "rejected ranks") {
    import spark.implicits._
    // two tight 2-D clusters; cluster A fans AWAY from B (negative y),
    // so for each A-node some B-node is closer to it than to its kept
    // A-mate — the keep condition fires and buys a cross-cluster edge.
    // Plain degree-2 kNN keeps both edges in-cluster: islands.
    val corpus = Seq(
      (0L, Array(1.000f, 0.000f)),   // cluster A
      (1L, Array(0.999f, -0.045f)),
      (2L, Array(0.998f, -0.063f)),
      (3L, Array(0.997f, -0.077f)),
      (10L, Array(0.000f, 1.000f)),  // cluster B
      (11L, Array(-0.045f, 0.999f)),
      (12L, Array(-0.063f, 0.998f)),
      (13L, Array(-0.077f, 0.997f))
    ).toDF("vec_id", "embedding").localCheckpoint(true)
    val plain = Similarity.bruteTopK(corpus, corpus, 2)
      .localCheckpoint(true)
    val diverse = Hnsw.diversifiedEdges(corpus, degree = 2,
      candFactor = 4, fill = false).localCheckpoint(true)
    // Alg-4 predicate: every kept edge's target is strictly closer to
    // the node than to any BETTER-RANKED kept neighbor — recompute
    // driver-side from the raw embeddings
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      (x.indices).foreach { i =>
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      if (nx == 0 || ny == 0) -1.0 else d / math.sqrt(nx * ny)
    }
    val keptBy = diverse.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    keptBy.foreach { case (q, rows) =>
      val inOrder = rows.sortBy(t => (-t._3, t._2)).map(_._2)
      inOrder.zipWithIndex.foreach { case (e, i) =>
        inOrder.take(i).foreach { w =>
          assert(cos(vecs(e), vecs(q)) > cos(vecs(e), vecs(w)),
            s"kept edge $q->$e is closer to kept $w than to $q")
        }
      }
    }
    // the planted cross-cluster reach: node 0's diversified out-list
    // crosses clusters; its plain out-list does not
    val d0 = keptBy(0L).map(_._2).toSet
    assert(d0.exists(_ >= 10L),
      s"diversified out-list of node 0 stayed in-cluster: $d0")
    val p0 = plain.filter(col("query_id") === 0L)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(p0.forall(_ < 10L),
      s"plain kNN unexpectedly crossed clusters: $p0 — geometry broken")
    // recall through the walk: query = B's centroid-ish vector, entry
    // in cluster A; the diversified graph must reach a B node, the
    // plain graph must not (its component is all of cluster A)
    val probe = Seq((100L, Array(0.01f, 0.9999f)))
      .toDF("vec_id", "embedding")
    val corpusWithProbe = corpus.unionByName(probe)
    def hits(edges: org.apache.spark.sql.DataFrame) =
      GraphAnn.searchGraph(probe, edges, corpusWithProbe, entryId = 0L,
          beam = 3, hops = 4, k = 2)
        .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    val dHits = hits(diverse)
    val pHits = hits(plain)
    assert(dHits.exists(_ >= 10L),
      s"diversified graph failed to route to cluster B: $dHits")
    assert(pHits.forall(_ < 10L),
      s"plain graph escaped its island: $pHits — geometry broken")
    // fill: exactly min(degree, C) edges per node, a superset of the
    // diversified set, topped up in rank order from the rejected
    val filled = Hnsw.diversifiedEdges(corpus, degree = 2,
      candFactor = 4, fill = true).localCheckpoint(true)
    val fCounts = filled.groupBy(col("query_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fCounts.values.forall(_ == 2L),
      s"fill must restore exact degree: $fCounts")
    val fBy = filled.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    keptBy.foreach { case (q, rows) =>
      assert(rows.map(_._2).toSet.subsetOf(fBy(q)),
        s"fill dropped a diversified edge for $q")
    }
    // layered composition: the builder drops into buildIndex
    val layered = Hnsw.buildIndex(corpus, degree = 2, m = 4,
      maxLevel = 1, Some(Hnsw.diversifiedBuilder(candFactor = 4)))
    assert(layered.filter(col("layer") === 0).count() > 0)
    assert(layered.groupBy(col("layer"), col("query_id")).count()
      .filter(col("count") > 2).isEmpty, "degree bound violated")
  }

  test("diversified-built hierarchy serves end-to-end: buildIndex with " +
      "diversifiedBuilder + saturating searchAuto == exact brute " +
      "force, and a pluggable candidate source drives the selection " +
      "over ITS candidate set") {
    val e = emb.filter(col("vec_id") < 60).localCheckpoint(true)
    val n = e.count().toInt
    // saturating candFactor: the candidate set covers the corpus, so
    // fill restores full reachability whatever the diversity pass cuts
    val layered = Hnsw.buildIndex(e, degree = n - 1, m = 4, maxLevel = 2,
      Some(Hnsw.diversifiedBuilder(candFactor = 1)))
      .localCheckpoint(true)
    val probes = e.filter(col("vec_id") % 16 === 0)
    val got = Hnsw.searchAuto(probes, layered, e, beamUpper = n,
      hopsUpper = 4, beam = n, hops = 4, k = 3)
    assert(collectTopK(got) == collectTopK(Similarity.bruteTopK(probes,
      e, 3)), "diversified-built hierarchy must saturate to brute")
    // candidate-source seam: handing bruteTopK explicitly == default,
    // and a TRUNCATED source (half the candidates) still satisfies
    // the Alg-4 predicate over its own candidate set
    val viaSeam = Hnsw.diversifiedEdges(e, degree = 3, candFactor = 3,
      fill = false,
      candidateSource = Some((nodes, c) =>
        Similarity.bruteTopK(nodes, nodes, c)))
    val viaDefault = Hnsw.diversifiedEdges(e, degree = 3, candFactor = 3,
      fill = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(rows(viaSeam) == rows(viaDefault))
    val truncated = Hnsw.diversifiedEdges(e, degree = 3, candFactor = 3,
      fill = false,
      candidateSource = Some((nodes, c) =>
        Similarity.bruteTopK(nodes, nodes, c)
          .filter(col("rank") <= c / 2)))
    val truncCands = Similarity.bruteTopK(e, e, 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    truncated.collect().foreach { r =>
      assert(truncCands((r.getLong(0), r.getLong(2))),
        "selection must draw only from the provided candidate set")
    }
  }

  test("lifecycle maxLevel below the index's top layer fails loudly " +
      "instead of silently truncating the upper layers out of the " +
      "returned index") {
    import spark.implicits._
    val e = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val layered = Hnsw.buildIndex(e, degree = 4, m = 4, maxLevel = 2)
      .localCheckpoint(true)
    val top = layered.agg(max(col("layer"))).collect()(0).getInt(0)
    assert(top >= 1, s"test needs an upper layer to truncate, got $top")
    val del = Seq(0L).toDF("vec_id")
    val exF = intercept[IllegalArgumentException] {
      Hnsw.forget(layered, del, maxLevel = top - 1)
    }
    assert(exF.getMessage.contains("top layer"))
    val exI = intercept[IllegalArgumentException] {
      Hnsw.insert(layered, e.limit(1), e, m = 4, maxLevel = top - 1,
        beam = 2, hops = 1, degree = 4)
    }
    assert(exI.getMessage.contains("top layer"))
    val exR = intercept[IllegalArgumentException] {
      Hnsw.forgetRepairReceipts(layered, del, maxLevel = top - 1)
    }
    assert(exR.getMessage.contains("top layer"))
    val exFR = intercept[IllegalArgumentException] {
      Hnsw.forgetRepaired(layered, e, del, maxLevel = top - 1, beam = 2,
        hops = 1, degree = 4)
    }
    assert(exFR.getMessage.contains("top layer"))
    // negative maxLevel still fails with the range contract
    val exNeg = intercept[IllegalArgumentException] {
      Hnsw.forget(layered, del, maxLevel = -1)
    }
    assert(exNeg.getMessage.contains("out of [0"))
  }

  test("diversifiedEdges candidate auto-dispatch: below the threshold " +
      "the default IS brute bit-for-bit; forced above it the default " +
      "IS the bucketed source; the bucketed build keeps every planted " +
      "twin edge and serves it at rank 1") {
    val base = emb.filter(col("vec_id") < 90)
    val dups = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dups).localCheckpoint(true)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    // small-n dispatch: the default (120 nodes << 2^15) is brute
    assert(rows(Hnsw.diversifiedEdges(corpus, degree = 4)) ==
      rows(Hnsw.diversifiedEdges(corpus, degree = 4,
        candidateSource = Some((n, c) => Similarity.bruteTopK(n, n, c)))),
      "below the threshold the auto source must be exact brute")
    // large-n dispatch, threshold forced to 1: the default is the
    // bucketed source, same knobs
    assert(rows(Hnsw.diversifiedEdges(corpus, degree = 4,
        minNodesForBucketed = 1)) ==
      rows(Hnsw.diversifiedEdges(corpus, degree = 4,
        candidateSource = Some(Hnsw.bucketedCandidateSource()))),
      "above the threshold the auto source must be the bucketed one")
    // construction guarantee on the bucketed path: an exact twin
    // shares its node's cell (identical embedding → identical
    // assignment), ranks first among its candidates at cosine 1, and
    // the Alg-4 fold ALWAYS keeps candidate rank 1 — so every planted
    // twin edge survives, in both directions, no matter how the cells
    // fall (an ANN candidate source trades RECALL of far candidates,
    // never the nearest one)
    val bucketedEdges = Hnsw.diversifiedEdges(corpus, degree = 4,
      candFactor = 3, fill = true, minNodesForBucketed = 1)
      .localCheckpoint(true)
    val twinEdges = bucketedEdges
      .filter(col("neighbor_id") === col("query_id") + 1000 ||
        col("query_id") === col("neighbor_id") + 1000)
      .filter(col("cos_sim") > 0.999999)
      .count()
    assert(twinEdges == 60L,
      s"expected all 30 twin pairs kept in both directions, got $twinEdges")
    // serving through those edges: a walk seeded at a twin-edge owner
    // reaches the twin in its first expansion and pins it at rank 1 —
    // global reachability is a recall dial on an ANN-built graph, but
    // the kept edge itself always serves
    val served = GraphAnn.searchGraph(corpus.filter(col("vec_id") === 0),
        bucketedEdges, corpus, entryId = 0L, beam = 200, hops = 40, k = 1)
      .collect()
    assert(served.length == 1 && served(0).getLong(2) == 1000L &&
      served(0).getDouble(3) > 0.999999,
      "probe 0 must serve its twin at rank 1 through the bucketed-" +
        s"diversified graph, got ${served.mkString(",")}")
  }
}
