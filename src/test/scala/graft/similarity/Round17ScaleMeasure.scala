package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE.md (round-17 operators): the
  * MRL funnel vs flat brute force, MaxSim full-corpus vs shortlist
  * rerank, projected-dot serving, pHash pairing, and MAD flags — at 1×
  * and N× inputs. Embeddings blow up by perturbed copies with dense
  * re-ids (the Round15ScaleMeasure methodology); documents by suffixed
  * copies.
  * Run: sbt "Test/runMain graft.similarity.Round17ScaleMeasure [embMult] [docMult] [sfDir]"
  */
object Round17ScaleMeasure {
  def main(args: Array[String]): Unit = {
    val embMult = args.headOption.map(_.toInt).getOrElse(20)
    val docMult = args.lift(1).map(_.toInt).getOrElse(50)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag: String)(f: => DataFrame): Unit = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f.write.format("noop").mode("overwrite").save() // warm JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[r17scale] $tag wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
    }

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    def embCorpus(n: Int): DataFrame =
      (if (n == 1) emb.select(col("vec_id"), col("embedding"))
       else emb.select(
         explode(sequence(lit(0), lit(n - 1))).as("c"),
         col("vec_id"), col("embedding"))
         .select((col("vec_id") * n + col("c")).as("vec_id"),
           transform(col("embedding"), (x, i) =>
             when(i === 0, x + col("c").cast("float") * lit(0.001f))
               .otherwise(x)).as("embedding")))
        .repartition(32).localCheckpoint(true)

    for (n <- Seq(1, embMult)) {
      val e = embCorpus(n)
      val qs = e.filter(col("vec_id") < 50).localCheckpoint(true)
      run(s"brute_topk x$n") {
        Similarity.bruteTopK(qs, e, 10)
      }
      // the funnel: prefix-16 coarse (1/4 of the vector bytes through
      // the cosine) + full-dim rerank of 50x20 rows only
      run(s"mrl_topk x$n") {
        Similarity.mrlTopK(qs, e, k = 10, dims = 16, shortlist = 20)
      }
      run(s"proj_topk x$n") {
        RandomProjection.projectedTopK(qs, e, k = 10, dimIn = 64, dimOut = 8)
      }
      // MaxSim: docs = 10-token bags; full corpus scoring vs reranking
      // an ivf-shortlisted candidate set (the production funnel)
      val dv = e.select((col("vec_id") % lit(50 * n)).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
        .localCheckpoint(true)
      val qv = e.filter(col("vec_id") < 10)
        .select((col("vec_id") % 5).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
        .localCheckpoint(true)
      run(s"maxsim_full x$n") {
        graft.similarity.LateInteraction.maxSimTopK(qv, dv, k = 3)
      }
      run(s"maxsim_rerank20 x$n") {
        // shortlist: 20 candidate docs per query from pooled-id heuristics
        // (constant-size candidate set — isolates the rerank cost)
        val cand = qv.select(col("query_id")).distinct()
          .crossJoin(dv.select(col("doc_id")).distinct().limit(20))
        graft.similarity.LateInteraction.maxSimRerank(cand, qv, dv, k = 3)
      }
    }

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    def docCorpus(n: Int): DataFrame =
      (if (n == 1) docs
       else docs.select(
         explode(sequence(lit(0), lit(n - 1))).as("c"),
         col("doc_id"), col("lang"), col("n_chars"), col("text"))
         .select((col("doc_id") * n + col("c")).as("doc_id"),
           col("lang"), col("n_chars"),
           concat(col("text"), lit(" copymark"), col("c").cast("string"))
             .as("text")))
        .repartition(32).localCheckpoint(true)

    for (n <- Seq(1, docMult)) {
      val d = docCorpus(n)
      run(s"phash_pairs x$n") {
        graft.multimodal.Multimodal.pHashPairs(
          graft.multimodal.Multimodal.mediaFromDocuments(
            d.withColumn("n_chars", length(col("text")).cast("long"))))
      }
      run(s"outlier_mad x$n") {
        graft.operators.Outliers.madFlag(
          d.select(col("lang"), col("doc_id"), col("n_chars")),
          "lang", "n_chars", "doc_id", 3)
      }
    }
    spark.stop()
  }
}
