package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Head-to-head A/B of the projected-top-k scorer variants in ONE JVM
  * (kills co-tenant noise): kernel-vs-fold projection × kernel-vs-fold
  * pair dot. Run:
  * sbt "Test/runMain graft.similarity.ProjAbMeasure [embMult] [sfDir]" */
object ProjAbMeasure {
  def main(args: Array[String]): Unit = {
    val embMult = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val e = emb.select(
        explode(sequence(lit(0), lit(embMult - 1))).as("c"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") * embMult + col("c")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("c").cast("float") * lit(0.001f))
            .otherwise(x)).as("embedding"))
      .repartition(32).localCheckpoint(true)
    val qs = e.filter(col("vec_id") < 50).localCheckpoint(true)

    def projK(c: org.apache.spark.sql.Column) =
      graft.functions.SignedProjectExpr.signed_project(c, 64, 8)
    def projF(c: org.apache.spark.sql.Column) =
      RandomProjection.projectedVecFold(c, 64, 8)
    def dotK(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotCodes.dot_codes(a, b)
    def dotF(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (x, y) => x + y)

    def topk(proj: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
               => org.apache.spark.sql.Column): DataFrame = {
      val pq = broadcast(qs.select(col("vec_id").as("query_id"),
        proj(col("embedding")).as("q_proj")))
      val pc = e.select(col("vec_id").as("neighbor_id"),
        proj(col("embedding")).as("c_proj"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      pc.join(pq, col("query_id") =!= col("neighbor_id"))
        .withColumn("score", dot(col("q_proj"), col("c_proj")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
    }

    def run(tag: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[projab] $tag med=${times.sorted.apply(1)}%.2fs " +
        f"min=${times.min}%.2fs max=${times.max}%.2fs")
    }

    run("projK_dotK")(topk(projK, dotK))
    run("projK_dotF")(topk(projK, dotF))
    run("projF_dotK")(topk(projF, dotK))
    run("projF_dotF")(topk(projF, dotF))
    // isolate the projection scan alone
    run("scan_projK")(e.select(projK(col("embedding")).as("p")))
    run("scan_projF")(e.select(projF(col("embedding")).as("p")))
    spark.stop()
  }
}
