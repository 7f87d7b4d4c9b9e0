package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 verdict #3: measure the `isin`-literal fetch regime NEAR THE CAPS
  * instead of assuming it. [[Similarity.shortlistEmbeddings]] localizes
  * shortlists up to 2^17 rows and pushes the candidate ids into the
  * corpus scan as one `In` predicate; Catalyst planning and parquet
  * row-group stat evaluation are O(values) per scan, and the gate only
  * ever exercises ≤10^3-id shortlists — the regime just under the cap
  * was untested. This leg times the id-pruned fetch vs the
  * broadcast-join fallback at 10^3 / 10^4 / 10^5 ids on the 100×
  * corpus-vectors artifact (sorted persisted layout — the serving
  * shape), min-of-3 each, and prints the crossover evidence for
  * SCALE.md.
  *
  * Run Round25ScaleMeasure first (materializes /tmp/graft_sf100), then:
  *   sbt "Test/runMain graft.similarity.IsinCapMeasure"
  */
object IsinCapMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    def timedMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val src = args.headOption.getOrElse("/tmp/graft_sf100")
    val emb = graft.Tables.load(spark, src, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vPath = "/tmp/graft_r31_isin_vectors"
    if (!new java.io.File(s"$vPath/_SUCCESS").exists())
      TrainedState.saveVectors(emb, vPath,
        numFiles = TrainedState.filesForRows(emb.count(), 1L << 20))
    val corpus = TrainedState.loadVectors(spark, vPath)
    val maxId = corpus.agg(max(col("vec_id"))).head.getLong(0)

    for (n <- Seq(1000, 10000, 100000, 1 << 17)) {
      // deterministic id spread across the artifact (every file touched
      // — the WORST case for stat-eval: each row group evaluates the
      // full predicate; a clustered id set would only flatter isin)
      val stride = math.max(1L, maxId / n)
      val ids = (0 until n).map(i => i.toLong * stride)
        .filter(_ <= maxId).toIndexedSeq
      val shortRows = ids.map(id =>
        org.apache.spark.sql.Row(id % 17, id)).asJava
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "query_id BIGINT, neighbor_id BIGINT")
      val local = spark.createDataFrame(shortRows, schema)
      val cEmb = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"))
      def isinFetch(): Unit = noop(
        cEmb.filter(col("neighbor_id").isin(ids: _*))
          .join(broadcast(local), Seq("neighbor_id")))
      def joinFetch(): Unit = noop(
        broadcast(local).join(cEmb, Seq("neighbor_id")))
      isinFetch(); joinFetch() // warm
      val ti = timedMin(isinFetch())
      val tj = timedMin(joinFetch())
      println(f"[isin-cap] n=${ids.length}%7d isin=$ti%7.3fs " +
        f"broadcast_join=$tj%7.3fs ratio=${ti / tj}%5.2f")
    }
    spark.stop()
  }
}
