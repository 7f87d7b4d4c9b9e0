package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE.md (round 10): the 10 heaviest
  * gate queries (by BENCH_LAST.json seconds) at sf0.1 and at a
  * synthetic 10× of it ("sf1"), run through `SparkEntry.queries`
  * VERBATIM — the queries take a table directory, so the scaled corpus
  * is materialized as parquet once and both runs execute the exact gate
  * plans.
  *
  * Scaling preserves the *distribution*, not the bytes — a natural sf1
  * has DISTINCT documents, and exact/near copies would quadratically
  * inflate the dedup-family pair counts and fake super-linear scaling:
  * - documents: 10 copies, copy c Caesar-shifts letters by c and
  *   rotates digits (length, token boundaries, and gram counts are
  *   preserved; every k-gram differs across copies), doc_id offset
  *   c·10⁷.
  * - embeddings: 10 copies with dense re-ids (vec_id·10+c) and a
  *   0.001·c perturbation on component 0 (the Round15/17ScaleMeasure
  *   methodology) — id density is preserved so stride-derived
  *   centroids/codebooks scale with the corpus, as they would at a
  *   real sf1.
  *
  * Run: sbt "Test/runMain graft.Round18ScaleMeasure [mult] [sfDir] [outDir]"
  */
object Round18ScaleMeasure {

  private val Heaviest = Seq(
    "e_ann_ivf_incremental", "e_ann_ivf_rebalanced", "d_cluster_density",
    "d_winnow_spans", "e_dedup_semantic_planted", "e_ann_pq_trained",
    "e_dedup_semantic_incremental", "e_knn_degree", "d_mix_reweight",
    "d_lm_backoff",
    // round-10 additions — the new ANN operators' scaling behavior
    "e_ann_ivfpq_planted", "e_ann_ivfpq_recall", "e_ann_pq_rotated",
    "e_ann_bq", "d_dedup_minhash_md5",
    // round-11 refresh (VERDICT r10 item 7): the three heaviest
    // round-10 queries — full train→persist→serve lifecycles, so their
    // cost should scale with the SAMPLE-BOUNDED training side, not the
    // corpus — plus the new two-level assignment
    "e_ann_opq_trained", "e_ann_graph_pq", "e_ann_graph_incremental",
    "e_ann_ivf_twolevel")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- materialize the scaled corpus (idempotent) ----
    val az = "abcdefghijklmnopqrstuvwxyz"
    val AZ = az.toUpperCase
    val dg = "0123456789"
    def shifted(s: String, c: Int) = s.drop(c % s.length) + s.take(c % s.length)
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      val docs = Tables.load(spark, sfDir, "documents")
      val scaledDocs = docs
        .select(explode(sequence(lit(0), lit(mult - 1))).as("c"), col("*"))
        .withColumn("doc_id", col("doc_id") + col("c") * 10000000L)
        .withColumn("text",
          // copy 0 = original; copy c substitutes the alphabet — gram
          // sets become disjoint across copies while every length/
          // boundary statistic is preserved
          (1 until mult).foldLeft(when(col("c") === 0, col("text"))) {
            (acc, c) => acc.when(col("c") === c,
              translate(col("text"), az + AZ + dg,
                shifted(az, c) + shifted(AZ, c) + shifted(dg, c)))
          })
        .drop("c")
      scaledDocs.repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      val emb = Tables.load(spark, sfDir, "embeddings")
      emb.select(explode(sequence(lit(0), lit(mult - 1))).as("c"), col("*"))
        .withColumn("vec_id", col("vec_id") * mult + col("c"))
        .withColumn("embedding", transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("c").cast("float") * lit(0.001f))
            .otherwise(x)))
        .drop("c")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[r18scale] materialized ${mult}x corpus at $outDir")
    }

    def run(tag: String, name: String, dir: String): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      def exec(): Unit = SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      exec() // warm JIT + footer caches
      val t0 = System.nanoTime()
      exec()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      println(f"[r18scale] $tag $name wall=$s%.2fs")
      s
    }

    val rows = Heaviest.map { name =>
      val a = run("sf0.1", name, sfDir)
      val b = run(s"sf1(${mult}x)", name, outDir)
      (name, a, b, b / a)
    }
    println("[r18scale] query,sf01_s,sf1_s,ratio")
    rows.foreach { case (n, a, b, r) =>
      println(f"[r18scale] $n,$a%.2f,$b%.2f,$r%.1f")
    }
    spark.stop()
  }
}
