package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.similarity.{GraphAnn, Hnsw, Similarity, TrainedState}

/** The schedulable consolidation job: one invocation returns a
  * lazily-deleted (index, vectors) PAIR to as-if-never-ingested state —
  * edges repaired and rewritten, vector tombstones folded out of the
  * bytes, receipts printed and persisted. */
class ConsolidateAnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.01",
    "embeddings").select(col("vec_id"), col("embedding"))

  test("flat graph pair: detects the kind, defaults degree from the " +
      "artifact's max rank, repairs + rewrites, folds vector " +
      "tombstones, appends the receipts trail") {
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = corpus.count().toInt
    val root = java.nio.file.Files
      .createTempDirectory("cons_tool_g").toString
    TrainedState.saveGraphIndex(
      Similarity.bruteTopK(corpus, corpus, 4), s"$root/idx")
    TrainedState.saveVectors(corpus, s"$root/idx.vectors")
    TrainedState.forgetVectorsDelta(Seq(7L, 19L).toDF("vec_id"),
      s"$root/idx.vectors")

    val (kind, rows) = ConsolidateAnn.run(spark, s"$root/idx",
      entryId = Some(0L), beam = n + 10, hops = n, degree = None,
      vectorsPath = None, receiptsPath = Some(s"$root/receipts"))
    assert(kind == "graph")
    assert(rows.map(_.getLong(0)).toSet == Set(7L, 19L))
    assert(rows.forall(r => r.getBoolean(3) && r.getLong(1) == 4L),
      s"receipts: $rows") // degree defaulted to the built max rank 4

    // edges clean, tombstones out of the bytes, generations folded
    val edges = TrainedState.loadGraphIndex(spark, s"$root/idx")
    val named = edges.select(col("query_id").as("v"))
      .unionByName(edges.select(col("neighbor_id").as("v")))
      .collect().map(_.getLong(0)).toSet
    assert(named.intersect(Set(7L, 19L)).isEmpty)
    assert(TrainedState.deltaGenerations(spark, s"$root/idx.vectors") == 0L)
    assert(spark.read.parquet(s"$root/idx.vectors")
      .filter(col("embedding").isNull).count() == 0)

    // the durable trail landed with the stamp
    val trail = spark.read.parquet(s"$root/receipts")
    assert(trail.count() == 2 &&
      trail.schema.fieldNames.contains("consolidated_at"))

    // and the pair serves brute-over-live
    val live = corpus.filter(!col("vec_id").isin(7L, 19L))
      .localCheckpoint(true)
    val want = Similarity.bruteTopK(
        corpus.filter(col("vec_id") >= 25), live, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val got = GraphAnn.searchGraph(
        corpus.filter(col("vec_id") >= 25), edges,
        TrainedState.loadVectors(spark, s"$root/idx.vectors"),
        entryId = 0L, beam = n + 10, hops = n, k = 1, queryBound = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == want)
  }

  test("layered pair consolidates without an entryId; a non-ANN " +
      "artifact is rejected loudly") {
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("cons_tool_h").toString
    TrainedState.saveHnswIndex(
      Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 1),
      s"$root/h")
    TrainedState.saveVectors(corpus, s"$root/h.vectors")
    // delete two non-top-layer ids (the forget loop's own guard rule)
    val topSources = TrainedState.loadHnswIndex(spark, s"$root/h")
      .filter(col("layer") === 1).select(col("query_id"))
      .collect().map(_.getLong(0)).toSet
    val victims = (0L until 30L).filterNot(topSources).take(2)
    TrainedState.forgetVectorsDelta(victims.toDF("vec_id"),
      s"$root/h.vectors")
    val (kind, rows) = ConsolidateAnn.run(spark, s"$root/h",
      entryId = None, beam = 40, hops = 30, degree = None,
      vectorsPath = None, receiptsPath = None)
    assert(kind == "hnsw" && rows.map(_.getLong(0)).toSet == victims.toSet)
    val post = TrainedState.loadHnswIndex(spark, s"$root/h")
    val named = post.select(col("query_id").as("v"))
      .unionByName(post.select(col("neighbor_id").as("v")))
      .collect().map(_.getLong(0)).toSet
    assert(named.intersect(victims.toSet).isEmpty)

    // a vectors artifact is TOMBSTONE-COMPLETE: consolidating it is
    // the physical half alone — compact, no repair receipts
    TrainedState.forgetVectorsDelta(Seq(victims.head).toDF("vec_id"),
      s"$root/h.vectors")
    val (vKind, vRows) = ConsolidateAnn.run(spark, s"$root/h.vectors",
      entryId = None, beam = 8, hops = 8, degree = None,
      vectorsPath = None, receiptsPath = None)
    assert(vKind == "vectors" && vRows.isEmpty)
    assert(TrainedState.deltaGenerations(spark, s"$root/h.vectors") == 0L)
    assert(spark.read.parquet(s"$root/h.vectors")
      .filter(col("embedding").isNull).count() == 0)
  }

  test("tombstone-complete IVF pair: consolidation is the physical " +
      "half alone — the cell index and its sibling vectors artifact " +
      "both compact, tombstones leave the bytes, receipts are empty") {
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val cents = corpus.filter(col("vec_id") % 15 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid")).localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("cons_tool_ivf").toString
    TrainedState.saveIvfIndex(
      Similarity.ivfAssign(corpus, cents), s"$root/idx")
    TrainedState.saveVectors(corpus, s"$root/idx.vectors")
    TrainedState.forgetIvfDelta(Seq(7L, 19L).toDF("vec_id"), s"$root/idx")
    TrainedState.forgetVectorsDelta(Seq(7L, 19L).toDF("vec_id"),
      s"$root/idx.vectors")

    val (kind, rows) = ConsolidateAnn.run(spark, s"$root/idx",
      entryId = None, beam = 8, hops = 8, degree = None,
      vectorsPath = None, receiptsPath = None)
    assert(kind == "ivf" && rows.isEmpty)
    Seq(s"$root/idx", s"$root/idx.vectors").foreach { p =>
      assert(TrainedState.deltaGenerations(spark, p) == 0L,
        s"$p still carries delta generations")
      assert(spark.read.parquet(p)
        .filter(col("embedding").isNull).count() == 0,
        s"$p still carries tombstone rows")
      assert(spark.read.parquet(p)
        .filter(col("vec_id").isin(7L, 19L)).count() == 0,
        s"$p still names a deleted id")
    }

    // an unclassifiable directory is refused loudly
    val junk = s"$root/junk"
    Seq((1, "x")).toDF("a", "b").write.parquet(junk)
    val e = intercept[IllegalArgumentException] {
      ConsolidateAnn.run(spark, junk, entryId = None, beam = 8,
        hops = 8, degree = None, vectorsPath = None, receiptsPath = None)
    }
    assert(e.getMessage.contains("unclassifiable"))
  }
}
