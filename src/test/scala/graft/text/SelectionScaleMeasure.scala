package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE.md: wall-clock of the round-7
  * selection operators at 1× and N× corpus (sf0.1 documents × N copies,
  * copy-marker token appended so ids and vocabulary stay distinct-ish).
  * Run: sbt "Test/runMain graft.text.SelectionScaleMeasure [mult] [sfDir]"
  */
object SelectionScaleMeasure {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(50)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    def corpus(n: Int) =
      (if (n == 1) base
       else base.select(
         explode(sequence(lit(0), lit(n - 1))).as("c"),
         col("doc_id"), col("lang"), col("source"), col("text"))
         .select((col("doc_id") * n + col("c")).as("doc_id"),
           col("lang"), col("source"),
           concat(col("text"), lit(" copymark"), col("c").cast("string"))
             .as("text")))
        .repartition(32).localCheckpoint(true)

    def run(tag: String, n: Int)(f: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      val d = corpus(n)
      f(d).write.format("noop").mode("overwrite").save() // warm JIT
      val t0 = System.nanoTime()
      f(d).write.format("noop").mode("overwrite").save()
      println(f"[selscale] $tag x$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    for (n <- Seq(1, mult)) {
      run("dsir_select", n) { d =>
        Dsir.selectTop(d, d.filter(col("lang") === "en" &&
          col("source") === "src0"), "doc_id", "text", 50)
      }
      run("chunk_cdc", n)(d => CdcChunk.chunks(d, "doc_id", "text", 4, 8))
      run("decon_bloom", n) { d =>
        Decontaminate.flagBloom(d, d.filter(col("doc_id") < 5),
          "doc_id", "text")
      }
      run("mix_epochs", n) { d =>
        MixPlanner.epochAllocation(d, "source",
          TextOps.tokenCountWs(col("text")).cast("long"), 50000L, 200L)
      }
    }
    spark.stop()
  }
}
