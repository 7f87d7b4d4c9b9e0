package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15, addendum 4): the
  * DELETION trigger at 100× — `forgetGraphPersisted`'s per-batch cost
  * must be O(batch) against any corpus size: the batch localizes, the
  * entry check is local, the edge load is a fingerprint-cached plan
  * construction (receipts are LAZY — nothing scans the edges for a
  * no-op sink), the tombstone generation writes batch rows, and the
  * policy check reads delta metadata. The vectors artifact is
  * corpus-sized at both scales; the edge artifact's content is
  * irrelevant to the trigger (deliberately tiny here — the claim
  * under test is the trigger, not the consolidation, which is
  * documented corpus-scaled maintenance).
  *
  * Run Round25 (or anything materializing /tmp/graft_sf100) first.
  *
  * Run: sbt "Test/runMain graft.Round27ScaleMeasure [mult] [sfDir]"
  */
object Round27ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(2).getOrElse(s"/tmp/graft_sf$mult")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val TS = graft.similarity.TrainedState

    def measure(tag: String, dir: String): Double = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val root = s"/tmp/graft_r27_$tag"
      TS.saveVectors(emb, s"$root/idx.vectors")
      // edge artifact: tiny by design (see scaladoc)
      TS.saveGraphIndex(
        graft.similarity.Similarity.bruteTopK(
          emb.filter(col("vec_id") < 40), emb.filter(col("vec_id") < 40), 4),
        s"$root/idx")
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q = graft.streaming.StreamingAnn.forgetGraphPersisted(
        mem.toDF().toDF("vec_id"), s"$root/idx", entryId = 0L,
        maxGenerations = 1000L)() // no compaction inside the timed legs
      val times = try {
        mem.addData(100L to 149L: _*); q.processAllAvailable() // warm
        (1 to 3).map { i =>
          val lo = 1000L * i
          mem.addData(lo until (lo + 50L): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val s = times.min
      println(f"[r27scale] $tag forget_trigger=$s%.2fs (50-id batches)")
      s
    }

    val t1 = measure("sf01", sfDir)
    val tN = measure(s"sf_${mult}x", bigDir)
    println(f"[r27scale] ${mult}x ratio: forget_trigger=${tN / t1}%.2f " +
      f"(claim ~flat — O(batch) tombstone write, lazy receipts)")
    spark.stop()
  }
}
