package graft.gb
import org.apache.spark.sql.SparkSession
object GbProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("gbp")
    val src = java.nio.file.Paths.get("/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml")
    val n = if (args.nonEmpty) args(0).toInt else 400
    (0 until n).foreach(i => java.nio.file.Files.copy(src, dir.resolve(s"c_$i.xml")))
    // warm
    GreenButton.timeseries(spark, s"$dir/c_0.xml").count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import spark.implicits._
    // raw read only
    t("binaryFile read") {
      spark.read.format("binaryFile").load(s"$dir/*.xml").select("content").as[(Array[Byte])].map(_.length).reduce(_+_)
    }
    // parse only (no encoder of nested ParsedFeed): count readings via map to Int
    t("parse only (count readings)") {
      spark.read.format("binaryFile").load(s"$dir/*.xml").select("path","content").as[(String, Array[Byte])]
        .map { case (p, b) => EspiXml.parseFeed(p, new String(b, "UTF-8")).readings.size }.reduce(_+_)
    }
    // parse + full nested encoder
    t("parse + ParsedFeed encoder") {
      GreenButton.parse(spark, s"$dir/*.xml").count()
    }
    // full pipeline
    t("full denormalize") {
      GreenButton.timeseries(spark, s"$dir/*.xml").count()
    }
    spark.stop()
  }
}
