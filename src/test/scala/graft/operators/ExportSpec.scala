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
}
