package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IncrementalDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "river bank while a cold wind blows through the tall green trees"
  private val other = "completely different text about spark catalyst " +
    "optimizer rules and physical plan selection for distributed joins " +
    "over partitioned parquet data at warehouse scale"

  // corpus: 0 and 1 near-dups of each other, 2 unrelated, 3 short
  private def corpus = Seq(
    (0L, base),
    (1L, base.replace("cold", "warm")),
    (2L, other),
    (3L, "short text")
  ).toDF("doc_id", "text").repartition(2)

  // batch: 10 dups corpus 0 exactly, 11 dups corpus 2, 12 is new-unique,
  // 13 dups 10 exactly (batch-vs-batch pair)
  private def batch = Seq(
    (10L, base),
    (11L, other),
    (12L, "a genuinely new document about streaming watermarks and state " +
      "stores in structured streaming micro batch execution engines"),
    (13L, base)
  ).toDF("doc_id", "text").repartition(2)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)),
      BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toMap

  test("pairsAgainstIndex == minhashPairs(corpus ∪ batch) restricted to batch-touching pairs") {
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")
    val got = pairSet(IncrementalDedup.pairsAgainstIndex(
      batch, index, "doc_id", "text", minJaccard = 0.0))
    val batchIds = Set(10L, 11L, 12L, 13L)
    val expected = pairSet(
      Similarity.minhashPairs(corpus.unionByName(batch), "doc_id", "text",
        minJaccard = 0.0)
        .filter(col("id_a").isin(batchIds.toSeq: _*) ||
          col("id_b").isin(batchIds.toSeq: _*)))
    assert(got == expected, s"got $got\nexpected $expected")
    // sanity on content: exact dups at 1.0 across and within the batch,
    // corpus-only pair (0,1) absent, unique doc 12 pairs with nothing
    assert(got.get((0L, 10L)).exists(_ == BigDecimal(1).setScale(9)))
    assert(got.get((2L, 11L)).exists(_ == BigDecimal(1).setScale(9)))
    assert(got.get((10L, 13L)).exists(_ == BigDecimal(1).setScale(9)))
    assert(!got.contains((0L, 1L)), "corpus-vs-corpus pair re-derived")
    assert(!got.keys.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("maxBucketSize counts union buckets, matching full-recompute semantics") {
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")
    // cap 2: the identical-signature bucket {0, 10, 13} (plus near-dup 1
    // colliding in most bands) exceeds the cap and is dropped everywhere
    val got = pairSet(IncrementalDedup.pairsAgainstIndex(
      batch, index, "doc_id", "text", minJaccard = 0.0, maxBucketSize = 2))
    val batchIds = Set(10L, 11L, 12L, 13L)
    val expected = pairSet(
      Similarity.minhashPairs(corpus.unionByName(batch), "doc_id", "text",
        minJaccard = 0.0, maxBucketSize = 2)
        .filter(col("id_a").isin(batchIds.toSeq: _*) ||
          col("id_b").isin(batchIds.toSeq: _*)))
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("index round-trips through parquet; schema drift fails fast") {
    val path = java.nio.file.Files.createTempDirectory("graft_idx").toString
    IncrementalDedup.saveIndex(
      IncrementalDedup.buildIndex(corpus, "doc_id", "text"), path)
    val loaded = IncrementalDedup.loadIndex(spark, path)
    assert(loaded.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      IncrementalDedup.indexSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = pairSet(IncrementalDedup.pairsAgainstIndex(
      batch, loaded, "doc_id", "text", minJaccard = 0.0))
    assert(got.contains((0L, 10L)) && got.contains((10L, 13L)))
    // drift: an index missing sig must be rejected at the driver
    val bad = java.nio.file.Files.createTempDirectory("graft_idx_bad").toString
    corpus.select(col("doc_id").as("id"), col("text"))
      .write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.loadIndex(spark, bad)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("probe plan never recomputes corpus text: one minhash_sig, index scan reads only sh/sig/id") {
    val path = java.nio.file.Files.createTempDirectory("graft_idx2").toString
    IncrementalDedup.saveIndex(
      IncrementalDedup.buildIndex(corpus, "doc_id", "text"), path)
    val loaded = IncrementalDedup.loadIndex(spark, path)
    val probe = IncrementalDedup.pairsAgainstIndex(
      batch, loaded, "doc_id", "text", minJaccard = 0.0)
    val plan = probe.queryExecution.executedPlan.toString
    // the ONLY signature computation is the batch side's (inside the
    // already-materialized localCheckpoint, so the probe plan itself has
    // ZERO minhash kernels), and the parquet index scan carries no text
    assert(!plan.toLowerCase.contains("minhash_sig"),
      s"probe plan recomputes signatures:\n$plan")
    val scanLine = plan.linesIterator.find(l =>
      l.contains("Parquet") && l.contains("graft_idx2")).getOrElse("")
    assert(!scanLine.contains("text"), s"index scan reads text: $scanLine")
  }

  test("randomized restriction parity: any corpus/batch split of any doc set " +
      "agrees with the full batch recompute") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (round <- 1 to 4) {
      // docs drawn from a tiny vocabulary so near-dup collisions are common
      val all = (0L until 24L).map { i =>
        val n = 4 + rnd.nextInt(10)
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val (corpusRows, batchRows) = all.partition(_ => rnd.nextBoolean())
      if (corpusRows.nonEmpty && batchRows.nonEmpty) {
        val corpusDf = corpusRows.toDF("doc_id", "text").repartition(2)
        val batchDf = batchRows.toDF("doc_id", "text").repartition(2)
        val batchIds = batchRows.map(_._1).toSet
        val got = pairSet(IncrementalDedup.pairsAgainstIndex(batchDf,
          IncrementalDedup.buildIndex(corpusDf, "doc_id", "text"),
          "doc_id", "text", minJaccard = 0.0))
        val expected = pairSet(
          Similarity.minhashPairs(corpusDf.unionByName(batchDf),
            "doc_id", "text", minJaccard = 0.0)
            .filter(col("id_a").isin(batchIds.toSeq: _*) ||
              col("id_b").isin(batchIds.toSeq: _*)))
        assert(got == expected,
          s"round $round (|corpus|=${corpusRows.size}): $got != $expected")
      }
    }
  }

  test("foldIntoIndex admits batch minus rejects; next probe sees admitted docs") {
    val index = IncrementalDedup.buildIndex(corpus, "doc_id", "text")
    // reject the two batch docs that duplicated something (10, 11, 13 are
    // dups; keep-first policy rejects them all, admits only 12)
    val rejects = Seq(10L, 11L, 13L).toDF("doc_id")
    val grown = IncrementalDedup.foldIntoIndex(index, batch, "doc_id", "text",
      rejectIds = rejects)
    val ids = grown.select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 12L), s"unexpected index ids: $ids")
    // a later batch duplicating 12 now pairs against it
    val batch2 = Seq((20L, "a genuinely new document about streaming " +
      "watermarks and state stores in structured streaming micro batch " +
      "execution engines")).toDF("doc_id", "text")
    val pairs = pairSet(IncrementalDedup.pairsAgainstIndex(
      batch2, grown, "doc_id", "text", minJaccard = 0.5))
    assert(pairs.contains((12L, 20L)), s"admitted doc not probed: $pairs")
  }
}
