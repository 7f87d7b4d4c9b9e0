package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.{Similarity, TrainedState}

/** End-to-end maintenance: a multi-artifact root whose writers only
  * ever APPEND (ad-hoc jobs — nobody's serving loop owns these
  * artifacts, and the test never calls compactIfNeeded/compact*
  * directly) stays within generation policy across a long run because
  * the SCHEDULED [[MaintainRoot]] sweep — the production cron entry —
  * compacts whatever crossed the threshold, with a durable receipts
  * trail. */
class MaintainRootSpec extends SparkTestBase {

  test("a scheduled MaintainRoot sweep keeps a root of append-only " +
      "artifacts within generation policy across a long run, preserves " +
      "every artifact's content, and appends a readable receipts trail") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_e2e").toString
    val receiptsPath = s"$root/_receipts" // "_"-prefixed: the sweep
                                          // must skip it as an artifact
    val gPath = s"$root/graph_idx"
    val cPath = s"$root/codes_idx"
    val vPath = s"$root/vectors_art"

    // three kinds under one root, written by "ad-hoc jobs"
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 30).localCheckpoint(true)
    TrainedState.saveGraphIndex(Similarity.bruteTopK(emb, emb, 3), gPath)
    TrainedState.savePqCodes(
      (0L until 20L).map(v => (v, 0, v.toInt)).toDF("vec_id", "sub", "code"),
      cPath)
    TrainedState.saveVectors(emb, vPath)

    val maxGen = 2L
    val cycles = 5
    (1 to cycles).foreach { i =>
      // one append per artifact per cycle — fresh keys, so the final
      // content is base + every appended generation
      TrainedState.appendGraphDelta(
        Seq((1000L + i, 1, i.toLong, 0.1)).toDF(
          "query_id", "rank", "neighbor_id", "cos_sim"), gPath)
      TrainedState.appendPqCodesDelta(
        Seq((1000L + i, 0, i)).toDF("vec_id", "sub", "code"), cPath)
      TrainedState.appendVectorsDelta(
        Seq((1000L + i, Seq(i.toFloat, 0f))).toDF("vec_id", "embedding"),
        vPath)
      // the scheduled sweep — the ONLY maintenance this root ever gets
      val receipts = MaintainRoot.run(spark, root, maxGen,
        Some(receiptsPath))
      // policy invariant: after every sweep no artifact sits at or
      // above the threshold
      Seq(gPath, cPath, vPath).foreach { p =>
        assert(TrainedState.deltaGenerations(spark, p) < maxGen,
          s"cycle $i: $p above policy after the sweep")
      }
      assert(receipts.map(_.path).toSet == Set(gPath, cPath, vPath),
        s"cycle $i: sweep must see exactly the three artifacts " +
          s"(receipts: ${receipts.map(_.path)})")
    }

    // every appended generation's content survived whichever sweep
    // compacted it
    val gServed = TrainedState.loadGraphIndex(spark, gPath)
      .filter(col("query_id") >= 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(gServed == (1 to cycles).map(i => (1000L + i, i.toLong)).toSet)
    val cServed = TrainedState.loadPqCodes(spark, cPath)
      .filter(col("vec_id") >= 1000L).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(cServed == (1 to cycles).map(i => (1000L + i, i)).toSet)
    val vServed = TrainedState.loadVectors(spark, vPath)
      .filter(col("vec_id") >= 1000L).collect()
      .map(_.getLong(0)).toSet
    assert(vServed == (1 to cycles).map(i => 1000L + i).toSet)

    // at least one sweep actually compacted each kind (appends cross
    // the threshold every other cycle)
    val trail = spark.read.parquet(receiptsPath)
    assert(trail.count() == cycles * 3L,
      "one receipt row per artifact per sweep")
    val compactedKinds = trail.filter(col("compacted"))
      .select(col("kind")).collect().map(_.getString(0)).toSet
    assert(compactedKinds == Set("graph", "pqcodes", "vectors"),
      s"every kind must have compacted at least once: $compactedKinds")
    // kinds were classified correctly on every row
    val kindsByPath = trail.select(col("path"), col("kind")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kindsByPath == Set((gPath, "graph"), (cPath, "pqcodes"),
      (vPath, "vectors")))
  }
}
