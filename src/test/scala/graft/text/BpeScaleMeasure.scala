package graft.text

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** One-off measurement harness for SCALE.md: jobs-per-train and wall for
  * the local vs distributed BPE engines at a production-ish merge count.
  * Run: sbt "Test/runMain graft.text.BpeScaleMeasure [k] [sfDir]"
  */
object BpeScaleMeasure {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(256)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val d = graft.Tables.load(spark, sfDir, "documents").localCheckpoint(true)
    def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      Thread.sleep(500) // let listener drain
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val n = f.count()
      Thread.sleep(500)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpescale] $tag k=$k merges=$n jobs=${jobs.get() - j0} wall=$dt%.1fs")
    }
    run("local")(BpeTrain.mergesLocal(d, "text", k))
    run("distributed")(BpeTrain.mergesDistributed(d, "text", k))
    spark.stop()
  }
}
