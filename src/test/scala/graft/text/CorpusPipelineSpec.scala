package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class CorpusPipelineSpec extends SparkTestBase {

  test("end-to-end pipeline: monotone stage reductions, planted dup removed, eval doc excluded") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    // plant an exact duplicate (different doc_id, same text) and make doc 0
    // the "eval set" so decontamination must remove it from the corpus
    val planted = docs.filter(col("doc_id") === 1)
      .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
        col("text"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(planted)
    val eval_ = docs.filter(col("doc_id") === 0).select(col("text"))
    val out = Files.createTempDirectory("corpus_out").toString

    val stats = CorpusPipeline.run(spark, corpus, eval_, out)

    // stage monotonicity
    assert(stats.n_input > stats.n_after_exact) // planted dup went away
    assert(stats.n_after_exact >= stats.n_after_near)
    assert(stats.n_after_near > stats.n_after_decontam) // doc 0 went away
    assert(stats.n_after_decontam >= stats.n_after_quality)
    assert(stats.n_after_quality > 0 && stats.total_tokens > 0)

    val written = spark.read.parquet(out)
    // the planted duplicate and the eval doc are really gone
    val ids = written.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1000000L))
    assert(!ids.contains(0L))
    // written rows match the post-filter count; partition dirs exist
    assert(written.count() == stats.n_after_quality)
    assert(written.schema.fieldNames.contains("bin_block"))
    // write-side compaction: each (lang, bin_block) directory is written
    // by its owning task — one data file, not tasks × partitions shards
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .flatMap(_.listFiles().filter(_.isDirectory))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val nFiles = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(nFiles == 1,
        s"partition ${d.getName} has $nFiles files (small-file explosion)")
    }
    // shard-local packing: scanning a language's docs in id order, the bin
    // assignment from the running token sum never decreases
    written.select("lang", "doc_id", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).foreach { case (lang, rows) =>
        val bins = rows.sortBy(_._2).map(_._3)
        assert(bins.zip(bins.drop(1)).forall { case (a, b) => a <= b },
          s"bins not monotone for $lang")
      }
  }

  test("curated path: boilerplate strip shrinks tokens; curriculum " +
      "packing spreads sources across bins") {
    val docs = Tables.load(spark, sfDir, "documents")
    // plant shared boilerplate: the same 30-token header prepended to
    // forty docs (well above minDocs) — strip must remove its chunks
    val header = (1 to 30).map(i => s"bp${i * 13 % 89}").mkString(" ")
    val corpus = docs.withColumn("text",
      when(col("doc_id") < 40, concat(lit(header), lit(" "), col("text")))
        .otherwise(col("text")))
    val eval_ = docs.filter(col("doc_id") === 0).select(col("text"))

    val outPlain = java.nio.file.Files
      .createTempDirectory("corpus_plain").toString
    val outCurated = java.nio.file.Files
      .createTempDirectory("corpus_cur").toString
    val plain = CorpusPipeline.run(spark, corpus, eval_, outPlain)
    val curated = CorpusPipeline.run(spark, corpus, eval_, outCurated,
      boilerplateMinDocs = Some(3), curriculumEpoch = Some(1L))

    // the planted header's chunks are cross-doc boilerplate: stripped
    assert(curated.total_tokens < plain.total_tokens,
      s"boilerplate not stripped: ${curated.total_tokens} vs " +
        s"${plain.total_tokens}")
    assert(curated.n_after_quality > 0)

    // curriculum packing: within the largest lang shard, early and late
    // bin halves both see every major source (crawl order would cluster
    // doc_id ranges — sources are uniform in doc_id here, so instead
    // assert the interleave key ordered the shard: bins are monotone in
    // pos order, NOT doc_id order for at least one lang)
    val written = spark.read.parquet(outCurated)
    val byLang = written.select("lang", "doc_id", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val anyNonIdOrder = byLang.values.exists { rows =>
      val bins = rows.sortBy(_._2).map(_._3)
      bins.zip(bins.drop(1)).exists { case (a, b) => a > b }
    }
    assert(anyNonIdOrder,
      "curriculum order collapsed to doc_id order — epoch key inert")
  }
}
