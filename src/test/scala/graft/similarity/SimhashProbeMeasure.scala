package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md: wall + pair yield of single- vs
  * 4-probe SimHash at a real SF.
  * Run: sbt "Test/runMain graft.similarity.SimhashProbeMeasure [sfDir]"
  */
object SimhashProbeMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sigs = docs.select(col("doc_id").as("id"),
      graft.text.TextOps.simhash64(
        graft.text.TextOps.tokens(col("text"))).as("simhash"))
      .localCheckpoint(true)
    for (probes <- Seq(1, 4); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Similarity.simhashPairsFromSigs(sigs, maxHamming = 10,
        numProbes = probes).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[simhashprobe] probes=$probes rep=$rep pairs=$n wall=$dt%.2fs")
    }
    spark.stop()
  }
}
