package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  test("jsonlShards: written manifest == planned manifest; every doc " +
      "lands in its computed shard; JSON round-trips the content") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).limit(300)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_exp")
      .toString + "/out"
    val written = Export.jsonlShards(docs, "doc_id", dir, 4)
    val planned = Export.manifest(docs, "doc_id", 4)
    assert(written.except(planned).isEmpty
        && planned.except(written).isEmpty,
      "written receipt disagrees with the planned manifest")
    // total conservation
    assert(written.agg(sum("n_rows")).collect()(0).getLong(0) == 300)
    // one data file per shard (stable file identity for trainers)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.startsWith("part-"))).toMap
    assert(files.values.forall(_ == 1), s"multi-part shards: $files")
    // content round-trip: parse the JSONL back and compare values
    val back = spark.read.json(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("shard"))
    assert(back.count() == 300)
    val mismatch = back.join(docs, Seq("doc_id"))
      .filter(back("text") =!= docs("text") ||
        back("lang") =!= docs("lang"))
      .count()
    assert(mismatch == 0, "JSONL content diverged from the source")
    // every row sits in the shard its id computes to
    val misplaced = back
      .filter(col("shard") =!= Export.shardOf(col("doc_id"), 4))
      .count()
    assert(misplaced == 0)
  }

  test("numShards bound rejects") {
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Export.jsonlShards(d, "doc_id", "/tmp/never", 0))
  }

  test("balancedShards: single-slice snake is the exact boustrophedon " +
      "assignment; totals balance to within one max weight") {
    // weights 9..1, one slice, 3 shards: stripes (0,1,2)(2,1,0)(0,1,2)
    // → shard0 = 9+4+3, shard1 = 8+5+2, shard2 = 7+6+1
    val d = (1L to 9L).map(id => (id, 10L - id)).toDF("doc_id", "w")
      .repartition(3)
    val totals = Export.balancedShards(d, "doc_id", col("w"),
        numShards = 3, numSlices = 1)
      .groupBy("shard").agg(sum("w").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals === Map(0L -> 16L, 1L -> 15L, 2L -> 14L))
  }

  test("balancedShards: every row assigned exactly once to a valid " +
      "shard; per-shard totals beat the hash-shard imbalance bound") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.text.TextOps.tokenCountWs(col("text")).cast("long").as("w"))
      .localCheckpoint(true)
    val k = 8
    val assigned = Export.balancedShards(docs, "doc_id", col("w"), k,
      numSlices = 4).localCheckpoint(true)
    assert(assigned.count() == docs.count())
    assert(assigned.filter(col("shard") < 0 || col("shard") >= k)
      .count() == 0)
    val totals = assigned.groupBy("shard").agg(sum("w").as("t"))
      .collect().map(_.getLong(1))
    assert(totals.length == k)
    // documented bound: imbalance <= numSlices × max single weight
    val maxW = docs.agg(max("w")).collect().head.getLong(0)
    assert(totals.max - totals.min <= 4L * maxW,
      s"imbalance ${totals.max - totals.min} > ${4L * maxW}")
  }

  test("balancedShards law: over seeded random weight sets, single-slice " +
      "snake imbalance never exceeds one max weight") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val n = 5 + rnd.nextInt(40)
      val k = 2 + rnd.nextInt(5)
      val rows = (1L to n).map(id => (id, rnd.nextInt(1000).toLong))
      val d = rows.toDF("doc_id", "w").repartition(3)
      val totals = Export.balancedShards(d, "doc_id", col("w"), k,
          numSlices = 1)
        .groupBy("shard").agg(sum("w").as("t"))
        .collect().map(_.getLong(1))
      val pad = totals ++ Array.fill(k - totals.length)(0L) // empty shards
      val maxW = rows.map(_._2).max
      assert(pad.max - pad.min <= maxW,
        s"trial $trial (n=$n k=$k): spread ${pad.max - pad.min} > $maxW")
    }
  }

  test("balancedShards is deterministic under repartitioning") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.text.TextOps.tokenCountWs(col("text")).cast("long").as("w"))
    def assign(parts: Int) = Export.balancedShards(
        docs.repartition(parts), "doc_id", col("w"), 8, numSlices = 4)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign(1) === assign(5))
  }
}
