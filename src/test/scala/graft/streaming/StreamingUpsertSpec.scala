package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingUpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def snap(dir: String): Seq[(Long, String, Long)] =
    StreamingUpsert.readSnapshot(spark, dir).get
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[Long]("ver"))).toSeq

  test("CDC stream folds into a versioned snapshot: update, insert, " +
      "conditional delete, within-batch last-writer-wins") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("graft_snap")
    val ckpt = tmpDir("graft_snap_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingUpsert.maintain(
      mem.toDF().toDF("k", "s", "ver"), dir, ckpt, Seq("k"), "ver",
      deleteCond = Some(col("s") === "DEL"))
    try {
      // bootstrap: two versions of k=1 in ONE batch — ver 3 must win
      mem.addData((1L, "v1", 2L), (1L, "v3", 3L), (2L, "b", 1L))
      q.processAllAvailable()
      assert(snap(dir) == Seq((1L, "v3", 3L), (2L, "b", 1L)))
      // update k=1, insert k=5, delete k=2
      mem.addData((1L, "v9", 9L), (5L, "e", 1L), (2L, "DEL", 9L))
      q.processAllAvailable()
      assert(snap(dir) == Seq((1L, "v9", 9L), (5L, "e", 1L)))
    } finally q.stop()
  }

  test("retried batch is idempotent — INCLUDING deletes (predecessor-" +
      "version read, not pointer read)") {
    val dir = tmpDir("graft_snap_retry")
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "ver")
    StreamingUpsert.applyBatch(spark, base, 0L, dir, Seq("k"), "ver",
      deleteCond = Some(col("s") === "DEL"))
    val change = Seq((2L, "DEL", 2L), (3L, "c", 1L)).toDF("k", "s", "ver")
    StreamingUpsert.applyBatch(spark, change, 1L, dir, Seq("k"), "ver",
      deleteCond = Some(col("s") === "DEL"))
    val first = snap(dir)
    assert(first == Seq((1L, "a", 1L), (3L, "c", 1L)), first.toString)
    // simulate the engine retrying batch 1 after a partial failure: the
    // deleted key must NOT resurrect
    StreamingUpsert.applyBatch(spark, change, 1L, dir, Seq("k"), "ver",
      deleteCond = Some(col("s") === "DEL"))
    assert(snap(dir) == first, s"retry changed the snapshot: ${snap(dir)}")
  }

  test("readers always resolve a complete version via the pointer; " +
      "old versions are retained for time travel") {
    val dir = tmpDir("graft_snap_tt")
    StreamingUpsert.applyBatch(spark,
      Seq((1L, "a", 1L)).toDF("k", "s", "ver"), 0L, dir, Seq("k"), "ver",
      None)
    StreamingUpsert.applyBatch(spark,
      Seq((1L, "a2", 2L)).toDF("k", "s", "ver"), 1L, dir, Seq("k"), "ver",
      None)
    assert(StreamingUpsert.latestVersion(spark, dir) == Some("v=1"))
    val v0 = spark.read.parquet(s"$dir/v=0").collect()
    assert(v0.length == 1 && v0.head.getString(1) == "a")
    assert(snap(dir) == Seq((1L, "a2", 2L)))
  }

  test("empty snapshot dir: no version resolves, bootstrap inserts only") {
    val dir = tmpDir("graft_snap_empty")
    assert(StreamingUpsert.latestVersion(spark, dir).isEmpty)
    assert(StreamingUpsert.versionBefore(spark, dir, 5L).isEmpty)
  }
}
